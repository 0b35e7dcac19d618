#!/bin/bash
# Image-synthesis training, mirroring the reference's gecko configuration
# (reference train-example.sh: image_size 100, h 0.1, 8000 iters, batch 8,
# pool 1024, steps 32-48). Point --img at a 64x64 RGBA target; emoji
# targets resolve through the local Noto cache (utils/image.py).
python -m sph_nca_tpu.cli.train \
  --img "$1" \
  --image_size 100 --target_size 64 --h 0.1 \
  --training_iter 8000 --batch_size 8 --pool_size 1024 \
  --steps_range 32,48 --steps_increment 5 \
  --lr 3e-3 --output_dir ./checkpoints/
