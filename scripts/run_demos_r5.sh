#!/bin/bash
# Round-5 full-reference-scale re-verification of all six demos on current
# HEAD (VERDICT r4 #2). Serialized: the TPU tolerates one process at a time
# (CLAUDE.md). Cheap demos first so evidence lands early. Gates (round-3/4
# logged curves to match or beat):
#   grip   best ~2.09   (logs/grip_r3)
#   hit    best ~0.78   (logs/hit_r3)
#   pour_vel best ~16.05 (logs/pour_vel_r3)
#   taco   892.9 endpoint re-eval (logs/taco_r3_ls3 solved recipe)
#   door   r2 curve (best ~1.6e-4, logs/door_conv_r2d)
#   pour   best ~15050 raw Adam (logs/pour_conv_r2)
set -x
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 10800 "$@" > "logs/${name}_r5_stdout.log" 2>&1
  echo "=== $name exit: $? ==="
}

run grip python demos/demo_grip.py --exp-name grip_r5 --epochs 15 \
    --render-interval 100
run hit python demos/demo_hit.py --exp-name hit_r5 --epochs 40 \
    --render-interval 100
run pour_vel python demos/demo_pour_vel.py --exp-name pour_vel_r5 \
    --epochs 5 --render-interval 100
run taco python demos/demo_taco.py --exp-name taco_r5 --epochs 3 \
    --render-interval 100 --init-actions logs/taco_r3_ls3/ckpt/actions_29.npy \
    --cloth-damping 0.05 --bptt-window 0 --line-search --lr 0.3
run door python demos/demo_door.py --exp-name door_r5 --epochs 15 \
    --render-interval 100
run pour python demos/demo_pour.py --exp-name pour_r5 --epochs 20 \
    --render-interval 100

echo "ALL DEMOS DONE"
for d in grip hit pour_vel taco door pour; do
  python - <<EOF
import numpy as np
try:
    l = np.load("logs/${d}_r5/losses.npy")
    print("${d}_r5: epochs", len(l), "first", float(l[0]),
          "best", float(l.min()), "final", float(l[-1]))
except Exception as e:
    print("${d}_r5: MISSING", e)
EOF
done
