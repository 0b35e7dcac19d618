#!/bin/bash
# TPU-window playbook: run the moment the tunnel comes back.
# Captures (1) a driver-contract bench number, (2) the quick roofline
# A/Bs, (3) the full sweep grid — in that order, so even a short window
# yields the most valuable artifact first. Each stage logs to runs/.
set -u
cd "$(dirname "$0")/.."
STAMP=$(date +%m%d%H%M)
echo "=== stage 1: bench.py (driver contract) ==="
timeout 1200 python bench.py 2>runs/bench_${STAMP}.err | tee runs/bench_${STAMP}.json
echo "=== stage 2: roofline quick (6 configs) ==="
timeout 1800 python scripts/tpu_roofline.py --quick \
    --out runs/roofline_quick_${STAMP}.jsonl 2>&1 | grep -v cpu_aot
echo "=== stage 3: roofline full grid (36 configs) ==="
timeout 5400 python scripts/tpu_roofline.py \
    --out runs/roofline_full_${STAMP}.jsonl 2>&1 | grep -v cpu_aot
echo "=== done; see runs/*_${STAMP}.* ==="
