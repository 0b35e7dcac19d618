#!/bin/bash
# Full reference-config image-synthesis run (reference train-example.sh
# gecko block: image_size 100, h 0.1, 8000 iters, steps 32-48 inc 10,
# radial seed r=0.16, gated) with checkpoint-restart around the
# host-RSS watchdog.
cd /root/repo
tries=0
while true; do
  python -m sph_nca_tpu.cli.train --seed 1 \
    --img artifacts/train_target_face.png \
    --image_size 100 --target_size 64 --h 0.1 \
    --training_iter 8000 --batch_size 8 --pool_size 1024 \
    --steps_range 32,48 --steps_increment 10 \
    --initial_feature radial --initial_feature_radius 0.16 \
    --lr 3e-3 --nca_update gated --checkpoint_every 500 \
    --max_rss_gb 10 --resume auto --log_every 50 \
    --output_dir runs/gecko_full
  rc=$?
  if [ $rc -eq 0 ]; then echo "RUN COMPLETE"; break; fi
  if [ $rc -eq 42 ]; then echo "RSS restart"; sleep 3; continue; fi
  tries=$((tries+1))
  echo "unexpected rc=$rc (try $tries)"
  if [ $tries -ge 5 ]; then echo "GIVING UP"; break; fi
  sleep 10
done
