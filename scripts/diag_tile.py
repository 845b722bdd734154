"""In-process chunked-kernel tile sweep on the flagship headline scene.

Now that the tile is resolved per env (MPMConfig.chunk_tile), variants run
in ONE process (tunnel-variance rule). Also probes whether the g2p-bwd
scratch halving (round 4) unlocked tiles above the old 3072 VMEM ceiling.

Run on TPU: python scripts/diag_tile.py [--tiles 1536,2048,2560,3072]
"""
import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import bench  # noqa: E402


def measure(tile, steps, repeats):
    import jax

    os.environ["SOFTMAC_TPU_TILE_C"] = str(tile)
    try:
        env = bench.build_headline_env()
        assert env.mpm_cfg.chunk_tile == tile
        actions = np.zeros((steps, env.action_dim))
        out = env.rollout_and_grad(actions, loss_start_frame=0,
                                   loss_stride=steps, remat="none")
        jax.block_until_ready(out["loss"])
        times = []
        for _ in range(repeats):
            t0 = time.time()
            out = env.rollout_and_grad(actions, loss_start_frame=0,
                                       loss_stride=steps, remat="none")
            jax.block_until_ready(out["loss"])
            times.append(time.time() - t0)
        rate = steps * env.substeps / min(times)
        del env
        return rate, float(out["loss"])
    finally:
        del os.environ["SOFTMAC_TPU_TILE_C"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=str, default="1536,2048,2560,3072")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    for tile in [int(t) for t in args.tiles.split(",")]:
        try:
            rate, loss = measure(tile, args.steps, args.repeats)
            print(f"tile={tile}: {rate:7.2f} substeps/s  loss={loss:.8e}")
        except Exception as e:
            print(f"tile={tile}: FAILED {type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
