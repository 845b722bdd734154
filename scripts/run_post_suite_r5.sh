#!/bin/bash
# Round-5 post-demo TPU queue (serialized: one TPU process at a time).
# Launched by a watcher once scripts/run_demos_r5.sh's process exits.
set -x
cd "$(dirname "$0")/.."

timeout 2400 python scripts/diag_contact_merged.py > logs/diag_contact_merged_r5.log 2>&1
echo "diag_contact_merged exit: $?"

# taco retry: the first run OOM'd Mosaic scoped-vmem in the BATCHED
# line-search compile at tile 1536 (demo now pins tile_c=1024 for that
# path); NO_CHUNKED fused fallback if 1024 still trips it.
timeout 7200 python demos/demo_taco.py --exp-name taco_r5 --epochs 3 \
    --render-interval 100 --init-actions logs/taco_r3_ls3/ckpt/actions_29.npy \
    --cloth-damping 0.05 --bptt-window 0 --line-search --lr 0.3 \
    > logs/taco_r5_stdout.log 2>&1
rc=$?
echo "taco retry exit: $rc"
if [ $rc -ne 0 ]; then
  SOFTMAC_TPU_NO_CHUNKED=1 timeout 7200 python demos/demo_taco.py \
    --exp-name taco_r5 --epochs 3 --render-interval 100 \
    --init-actions logs/taco_r3_ls3/ckpt/actions_29.npy \
    --cloth-damping 0.05 --bptt-window 0 --line-search --lr 0.3 \
    > logs/taco_r5_stdout.log 2>&1
  echo "taco fused-fallback exit: $?"
fi

timeout 4800 python demos/demo_hit.py --exp-name hit_r5b --epochs 50 \
    --render-interval 100 > logs/hit_r5b_stdout.log 2>&1
echo "hit_r5b exit: $?"

timeout 4800 python bench.py > logs/bench_r5.log 2>&1
echo "bench exit: $?"

timeout 1800 python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)" > logs/dryrun_r5.log 2>&1
echo "dryrun exit: $?"
timeout 1800 python __graft_entry__.py > logs/entry_r5.log 2>&1
echo "entry exit: $?"
echo "POST SUITE DONE"
