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

    def hbm_peak():
        """Process-wide HBM high-water (monotone) in MiB; 0 off-TPU."""
        try:
            stats = jax.local_devices()[0].memory_stats()
            return stats.get("peak_bytes_in_use", 0) / 2**20
        except Exception:
            return 0.0

    def prog(index):
        return sd.cluster_index(index, es, et, min_samples, min_frames,
                                n_offsets, border_mode, 256, use_pallas=True)

    # slim FIRST, build+program, before the directed table ever exists:
    # peak_bytes_in_use is monotone per process, so only this ordering
    # isolates the pairs-only pipeline's true HBM high-water.  The directed
    # build then raises the peak by its (nt, k_pad) table (the slim index's
    # residue inflates its baseline, not its table size).
    tb_slim, slim = t(lambda: build(False))
    hbm_slim_build = hbm_peak()
    tp_slim, (lbl_s, k_s) = t(lambda: prog(slim), reps=2)
    hbm_slim_prog = hbm_peak()
    tb_full, full = t(lambda: build(True))
    hbm_full_build = hbm_peak()
    tp_full, (lbl_f, k_f) = t(lambda: prog(full), reps=2)
    hbm_full_prog = hbm_peak()
    print(f"build pairs-only:     {tb_slim*1e3:7.0f} ms "
          f"(pairs={int(slim.pair_count):,}/{slim.pair_a.shape[0]:,}, "
          f"hbm_peak={hbm_slim_build:.0f} MiB)")
    print(f"build directed+pairs: {tb_full*1e3:7.0f} ms "
          f"(k_pad={full.cand_idx.shape[1]}, nt={full.num_tiles}, "
          f"hbm_peak={hbm_full_build:.0f} MiB)")
    assert np.array_equal(np.asarray(full.pair_a), np.asarray(slim.pair_a))
    assert np.array_equal(np.asarray(full.pair_b), np.asarray(slim.pair_b))
    assert int(full.pair_count) == int(slim.pair_count)
    print("pair lists bit-equal: True")
    print(f"hbm_peak after program: pairs-only {hbm_slim_prog:.0f} MiB, "
          f"directed {hbm_full_prog:.0f} MiB")
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
