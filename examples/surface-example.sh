#!/bin/bash
# 3D-surface showcase at the reference's flagship scale (test.py:36
# defaults): 25,600 FPS-sampled surface points, 128 steps, PLY export.
# $1 = checkpoint dir or reference web-demo weights JSON, $2 = mesh.obj
WEIGHTS_FLAG=--checkpoint
[[ "$1" == *.json ]] && WEIGHTS_FLAG=--weights_json
python -m sph_nca_tpu.cli.test \
  $WEIGHTS_FLAG "$1" \
  --surface "${2:-/root/reference/code/data/bunny.obj}" \
  --surface_numpoints 25600 --steps 128 --export_every 16 \
  --output_dir ./output/
