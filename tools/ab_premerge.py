#!/usr/bin/env python3
"""A/B the pre-merge group seeding on the real bench scene.

Measures, for premerge off vs on: index build time (the lexsort sub-key
costs something), candidate-table geometry (the sort order changes tile
composition), per-round frontier sizes, and the whole cluster_index
program.  Alternating reps in one process (this host's mood swings exceed
most real effects — ROUND3.md measurement discipline).

Usage: python tools/ab_premerge.py [reps]
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    from radar_point_cloud_tracking_tpu.ops.neighbors import (
        build_spatial_index)
    from radar_point_cloud_tracking_tpu.ops.stdbscan import cluster_index

    from tools._scene import load_bench_scene

    points, n, cap, cfg = load_bench_scene(100)
    print(f"bench scene: {n:,} points, capacity {cap:,}")

    es, et = jnp.float32(8.0), jnp.float32(2.0)
    valid = jnp.arange(cap) < jnp.int32(n)

    def build(premerge):
        idx = build_spatial_index(points[:, :2], points[:, 4], valid,
                                  8.0, 2.0, tile=512, premerge=premerge)
        jax.block_until_ready(idx.cand_idx)
        return idx

    def cluster(idx):
        lbl, k = cluster_index(idx, es, et, 15, 1, 0, "always", 256,
                               use_pallas=jax.default_backend() == "tpu")
        jax.block_until_ready(lbl)
        return lbl, k

    # compile both variants
    idx_off = build(False)
    idx_on = build(True)
    lbl_off, k_off = cluster(idx_off)
    lbl_on, k_on = cluster(idx_on)
    same = bool(jnp.array_equal(lbl_off, lbl_on))
    print(f"clusters: off={int(k_off)} on={int(k_on)}  "
          f"labels equal (orig order): {same}")
    for name, idx in (("off", idx_off), ("on", idx_on)):
        c = np.asarray(idx.cand_count)
        print(f"  premerge={name}: {idx.cand_idx.shape[0]} tiles, "
              f"k_pad={idx.cand_idx.shape[1]}, cand sum={c.sum():,} "
              f"max={c.max()} mean={c.mean():.1f}")
    if idx_on.group_id is not None:
        gid = np.asarray(idx_on.group_id).reshape(-1)
        v = np.asarray(idx_on.valid).reshape(-1)
        ng = len(np.unique(gid[v]))
        print(f"  groups: {ng:,} over {int(v.sum()):,} valid points "
              f"(mean {v.sum()/max(ng,1):.2f} pts/group)")

    tb = {False: [], True: []}
    tc = {False: [], True: []}
    for r in range(reps):
        for pm in (False, True):
            t0 = time.perf_counter()
            idx = build(pm)
            t1 = time.perf_counter()
            cluster(idx)
            t2 = time.perf_counter()
            tb[pm].append(t1 - t0)
            tc[pm].append(t2 - t1)
    for pm in (False, True):
        b = np.median(tb[pm]) * 1e3
        c = np.median(tc[pm]) * 1e3
        print(f"premerge={pm}: build {b:.0f} ms  cluster {c:.0f} ms  "
              f"total {b+c:.0f} ms   "
              f"(build reps {[f'{x*1e3:.0f}' for x in tb[pm]]}, "
              f"cluster reps {[f'{x*1e3:.0f}' for x in tc[pm]]})")


if __name__ == "__main__":
    main()
