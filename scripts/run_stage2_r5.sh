#!/bin/bash
# Round-5 stage-2 TPU queue: packed-kernel A/B + taco polish under the
# current compiled program (the r3 solved actions re-evaluate at 1768
# under the round-5 program realization; line-search re-polish).
set -x
cd "$(dirname "$0")/.."
timeout 2400 python scripts/diag_contact_packed.py > logs/diag_contact_packed_r5.log 2>&1
echo "diag_contact_packed exit: $?"
timeout 7200 python demos/demo_taco.py --exp-name taco_r5b --epochs 25 \
    --render-interval 100 --init-actions logs/taco_r3_ls3/ckpt/actions_29.npy \
    --cloth-damping 0.05 --bptt-window 0 --line-search --lr 0.3 \
    > logs/taco_r5b_stdout.log 2>&1
echo "taco_r5b exit: $?"
echo "STAGE2 DONE"
