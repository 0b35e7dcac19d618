#!/bin/bash
# Inference on a trained checkpoint (or a reference web-demo weights JSON
# via --weights_json). Image mode: per-step PNGs; add --surface mesh.obj
# for the 3D point-cloud mode (per-step PLYs), as in the reference
# test-example.sh.
python -m sph_nca_tpu.cli.test \
  --checkpoint "$1" \
  --image_size 128 --steps 128 \
  --output_dir ./output/
