#!/usr/bin/env python3
"""Tile-size A/B at DENOISE scale (9.5M pts).  Tracker-scale sweeps chose
tile=512 (ROUND3.md), but the denoise scene is ~6x denser and its pair
table is dominated by a hotspot (max_cand=4644 vs mean 45 directed):
smaller tiles quarter the per-pair predicate work while multiplying the
pair count — the optimum may differ at this density.  Labels must be
identical across tile sizes (tiling is an implementation detail of the
canonicalized engine), so equality is asserted.

Usage: python tools/ab_tile_denoise.py [tile ...] (default 512 256 384)
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    tiles = [int(a) for a in sys.argv[1:]] or [512, 256, 384]
    from tools._scene import load_bench_scene_denoise
    from radar_point_cloud_tracking_tpu.ops.neighbors import (
        build_spatial_index)
    from radar_point_cloud_tracking_tpu.ops.stdbscan import cluster_index

    points, n, cap, cfg = load_bench_scene_denoise(100)
    print(f"denoise scene: {n:,} points, capacity {cap:,}")
    es, et = jnp.float32(8.0), jnp.float32(2.0)
    valid = jnp.arange(cap) < jnp.int32(n)

    ref_labels = None
    for tile in tiles:
        t0 = time.perf_counter()
        idx = build_spatial_index(points[:, :2], points[:, 3], valid,
                                  8.0, 2.0, tile=tile, pairs=True)
        jax.block_until_ready(idx.cand_idx)
        tb = time.perf_counter() - t0
        print(f"tile={tile}: nt={idx.num_tiles}, "
              f"k_pad={idx.cand_idx.shape[1]}, "
              f"max_cand={int(np.asarray(idx.cand_count).max())}, "
              f"pairs={int(idx.pair_count):,} "
              f"(P_pad={idx.pair_a.shape[0]}), build {tb:.2f}s")

        def prog():
            lbl, k = cluster_index(idx, es, et, 15, 2, 2, "if_earlier",
                                   256, use_pallas=True)
            jax.block_until_ready(lbl)
            return lbl, k

        lbl, k = prog()  # compile
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            lbl, k = prog()
            ts.append(time.perf_counter() - t0)
        # compare ORIGINAL-ORDER labels across tilings
        la = np.asarray(lbl)[:n]
        if ref_labels is None:
            ref_labels = la
            eq = True
        else:
            eq = bool(np.array_equal(ref_labels, la))
        print(f"tile={tile}: cluster program {min(ts)*1e3:7.0f} ms "
              f"({int(k)} clusters, labels==tile{tiles[0]}: {eq})")
        assert eq


if __name__ == "__main__":
    main()
