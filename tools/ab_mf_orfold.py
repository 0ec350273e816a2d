#!/usr/bin/env python3
"""Chip A/B of the mf stats kernel's presence computation: per-offset
masked any-reduction loop (original) vs one per-element offset bitmask +
halving OR-folds (pallas_neighbors._make_sym_stats_mf_kernel).

Denoise-scale stats sweep timing both ways, outputs bit-equality, and the
whole cluster program both ways.

ARCHIVED RECORD — cannot run at HEAD.  The OR-fold won at both denoise
scales with bit-equal outputs (f100: stats 3639->2292 ms, whole program
12798->11450 ms; f25: 698->443 / 2518->2264 ms — see
.chip_logs/ab_mf_orfold_r5_f{25,100}.log and ROUND5.md) and the per-offset
loop was removed per flip-or-remove.  To reproduce, check out the last
commit that carries both paths: ``git checkout 9bf885b``.

Usage: python tools/ab_mf_orfold.py [frames=N] [tile=N]
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

sys.exit(
    "ab_mf_orfold.py is an archived record: the per-offset presence loop "
    "was removed at HEAD after losing the chip A/B at both scales "
    "(.chip_logs/ab_mf_orfold_r5_f{25,100}.log). Reproduce at commit "
    "9bf885b: git checkout 9bf885b && python tools/ab_mf_orfold.py")

import jax
import jax.numpy as jnp


def t(fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        times.append(time.perf_counter() - t0)
    return min(times), out


def main():
    frames, tile = 100, None
    for a in sys.argv[1:]:
        if a.startswith("frames="):
            frames = int(a.split("=", 1)[1])
        elif a.startswith("tile="):
            tile = int(a.split("=", 1)[1])
    from tools._scene import load_bench_scene_denoise
    from radar_point_cloud_tracking_tpu.ops.neighbors import (
        build_spatial_index)
    from radar_point_cloud_tracking_tpu.ops import pallas_neighbors as pn
    from radar_point_cloud_tracking_tpu.ops import stdbscan as sd

    points, n, cap, cfg = load_bench_scene_denoise(frames)
    if tile is None:
        tile = cfg.clustering.tile_size
    es, et = jnp.float32(8.0), jnp.float32(2.0)
    valid = jnp.arange(cap) < jnp.int32(n)
    min_samples, min_frames, n_offsets = 15, 2, 2
    print(f"denoise scene: {n:,} points, capacity {cap:,}, tile={tile}")

    index = build_spatial_index(points[:, :2], points[:, 3], valid,
                                8.0, 2.0, tile=tile, pairs=True,
                                directed=False)
    jax.block_until_ready(index.coords)

    results = {}
    for mode in (False, True):
        pn._MF_OR_FOLD = mode
        # distinct trace per mode: the flag is read at kernel build time,
        # so clear jit caches to force a rebuild
        pn._core_stats_sym_mf.clear_cache()
        ts, (deg, fc) = t(lambda: pn.core_stats_pallas_sym_mf(
            index, es, et, n_offsets))
        name = "or-fold" if mode else "offset-loop"
        print(f"stats ({name}):        {ts*1e3:7.0f} ms")
        results[mode] = (np.asarray(deg), np.asarray(fc))
    eq = (np.array_equal(results[False][0], results[True][0])
          and np.array_equal(results[False][1], results[True][1]))
    print(f"stats outputs bit-equal: {eq}")

    whole = {}
    for mode in (False, True):
        pn._MF_OR_FOLD = mode
        pn._core_stats_sym_mf.clear_cache()
        sd.cluster_index.clear_cache()
        tp, (lbl, k) = t(lambda: sd.cluster_index(
            index, es, et, min_samples, min_frames, n_offsets,
            "if_earlier", 256, use_pallas=True), reps=3)
        name = "or-fold" if mode else "offset-loop"
        print(f"whole cluster_index ({name}): {tp*1e3:7.0f} ms "
              f"({int(k)} clusters)")
        whole[mode] = np.asarray(lbl)
    print(f"labels bit-equal: "
          f"{np.array_equal(whole[False], whole[True])}")


if __name__ == "__main__":
    main()
