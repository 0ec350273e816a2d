#!/usr/bin/env python3
"""A/B the pairs-only index build (directed=False) against the directed
build at both flagship scales: build cost, whole cluster program cost,
and labels bit-equality.  The pairs-only build skips the (nt, k_pad)
directed candidate table (~600 MB HBM at denoise scale) that the
symmetric-pair engine never reads.

Usage: python tools/ab_pairs_only.py [tracker|denoise|both]
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

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


def run_scale(name, points, n, cap, es_f, et_f, min_samples, min_frames,
              border_mode, time_col):
    from radar_point_cloud_tracking_tpu.ops.neighbors import (
        build_spatial_index)
    from radar_point_cloud_tracking_tpu.ops import stdbscan as sd

    es, et = jnp.float32(es_f), jnp.float32(et_f)
    n_offsets = int(np.floor(et_f)) if min_frames > 1 else 0
    valid = jnp.arange(cap) < jnp.int32(n)
    print(f"\n== {name}: {n:,} points, capacity {cap:,} ==")

    def build(directed):
        return build_spatial_index(points[:, :2], points[:, time_col],
                                   valid, es_f, et_f, tile=512,
                                   pairs=True, directed=directed)

    tb_full, full = t(lambda: build(True))
    tb_slim, slim = t(lambda: build(False))
    print(f"build directed+pairs: {tb_full*1e3:7.0f} ms "
          f"(k_pad={full.cand_idx.shape[1]}, nt={full.num_tiles})")
    print(f"build pairs-only:     {tb_slim*1e3:7.0f} ms "
          f"(pairs={int(full.pair_count):,}/{full.pair_a.shape[0]:,})")
    assert np.array_equal(np.asarray(full.pair_a), np.asarray(slim.pair_a))
    assert np.array_equal(np.asarray(full.pair_b), np.asarray(slim.pair_b))
    assert int(full.pair_count) == int(slim.pair_count)
    print("pair lists bit-equal: True")

    def prog(index):
        return sd.cluster_index(index, es, et, min_samples, min_frames,
                                n_offsets, border_mode, 256, use_pallas=True)

    tp_full, (lbl_f, k_f) = t(lambda: prog(full), reps=2)
    tp_slim, (lbl_s, k_s) = t(lambda: prog(slim), reps=2)
    eq = (int(k_f) == int(k_s)
          and np.array_equal(np.asarray(lbl_f), np.asarray(lbl_s)))
    print(f"cluster program on directed index:   {tp_full*1e3:7.0f} ms "
          f"({int(k_f)} clusters)")
    print(f"cluster program on pairs-only index: {tp_slim*1e3:7.0f} ms "
          f"({int(k_s)} clusters)")
    print(f"labels bit-equal: {eq}")
    print(f"TOTAL directed:   {(tb_full + tp_full)*1e3:7.0f} ms")
    print(f"TOTAL pairs-only: {(tb_slim + tp_slim)*1e3:7.0f} ms")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    from tools._scene import load_bench_scene, load_bench_scene_denoise

    print(f"backend: {jax.default_backend()}")
    if which in ("tracker", "both"):
        points, n, cap, cfg = load_bench_scene(100)
        run_scale("tracker", points, n, cap, 8.0, 2.0, 15, 1, "always", 4)
    if which in ("denoise", "both"):
        points, n, cap, cfg = load_bench_scene_denoise(100)
        run_scale("denoise", points, n, cap, 8.0, 2.0, 15, 2, "if_earlier", 3)


if __name__ == "__main__":
    main()
