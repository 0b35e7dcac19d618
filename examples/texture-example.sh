#!/bin/bash
# Exemplar-texture training: OT style loss over VGG features, periodic
# (wrapped) boundary, random initial state — the reference's texture mode.
# Supply --vgg_weights vgg19.npz for pretrained features (converter:
# training/features.convert_torchvision_vgg19); falls back to fixed-seed
# random filters offline.
python -m sph_nca_tpu.cli.train \
  --img "$1" --loss ot --wrap true --use_alpha false \
  --initial_feature random \
  --image_size 64 --target_size 64 --h 0.1 \
  --training_iter 4000 --batch_size 4 --pool_size 256 \
  --steps_range 24,36 --output_dir ./checkpoints/
