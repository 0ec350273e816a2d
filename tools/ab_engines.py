#!/usr/bin/env python3
"""Consolidated engine A/B on the real bench scene (run on the chip).

Alternating reps in one process (paired — this rig's mood swings exceed
most real effects).  Matrix:

  whole cluster program:
    old    = round-2 hybrid (DMA stats + XLA min) + chained-gather jumps
    jump   = same hybrid + slot-carrying single-gather jumps
    sym    = symmetric-pair stats/min kernels + slot-carrying jumps
  standalone sweeps:
    stats: XLA vs DMA vs SYM;  min: XLA vs DMA vs SYM
  index build: pairs off vs on (the pair compaction has a cost)

Usage: python tools/ab_engines.py [reps]
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from radar_point_cloud_tracking_tpu.ops.neighbors import (
    build_spatial_index, neighbor_core_stats, neighbor_min_sweep)
from radar_point_cloud_tracking_tpu.ops.stdbscan import cluster_index
from radar_point_cloud_tracking_tpu.ops.pallas_neighbors import (
    core_stats_pallas_dma, core_stats_pallas_sym, min_sweep_pallas_dma,
    min_sweep_pallas_sym)
from tools.ab_jump import cluster_index_old


def med(fn, reps, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return np.median(ts) * 1e3, ts


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4


    from tools._scene import load_bench_scene

    points, n, cap, cfg = load_bench_scene(100)
    print(f"bench scene: {n:,} points, capacity {cap:,}")

    es, et = jnp.float32(8.0), jnp.float32(2.0)
    valid = jnp.arange(cap) < jnp.int32(n)
    on_tpu = jax.default_backend() == "tpu"

    def build(pairs):
        idx = build_spatial_index(points[:, :2], points[:, 4], valid,
                                  8.0, 2.0, tile=512, pairs=pairs)
        jax.block_until_ready(idx.cand_idx)
        return idx

    idx = build(False)
    idx_p = build(True)
    print(f"pairs: {int(idx_p.pair_count):,} over "
          f"{idx_p.cand_idx.shape[0]} tiles "
          f"(P_pad={idx_p.pair_a.shape[0]}, "
          f"cand sum={int(np.asarray(idx.cand_count).sum()):,})")

    # ---- correctness cross-checks on the real scene ----------------------
    payload = jnp.where(idx_p.valid,
                        jnp.arange(idx_p.valid.size, dtype=jnp.int32)
                        .reshape(idx_p.valid.shape), np.int32(2**31 - 1))
    deg_x, _ = neighbor_core_stats(idx_p, es, et, n_offsets=0)
    deg_s = core_stats_pallas_sym(idx_p, es, et)
    v = np.asarray(idx_p.valid)
    assert np.array_equal(np.asarray(deg_s)[v], np.asarray(deg_x)[v]), \
        "SYM degree mismatch on bench scene"
    min_x = neighbor_min_sweep(idx_p, payload, es, et)
    min_s = min_sweep_pallas_sym(idx_p, payload, es, et)
    assert np.array_equal(np.asarray(min_s)[v], np.asarray(min_x)[v]), \
        "SYM min mismatch on bench scene"
    print("bench-scene SYM kernels match XLA: True")

    def prog_old():
        return cluster_index_old(idx, es, et, 15, 1, 0, "always", 256,
                                 use_pallas=on_tpu)[0]

    def prog_jump():
        return cluster_index(idx, es, et, 15, 1, 0, "always", 256,
                             use_pallas=on_tpu)[0]

    def prog_sym():
        return cluster_index(idx_p, es, et, 15, 1, 0, "always", 256,
                             use_pallas=on_tpu)[0]

    l_old = prog_old()
    l_jump = prog_jump()
    l_sym = prog_sym()
    eq = (bool(jnp.array_equal(l_old, l_jump)),
          bool(jnp.array_equal(l_old, l_sym)))
    print(f"cluster labels equal (jump, sym vs old): {eq}")
    assert all(eq)

    results = {}
    for name, fn in (("prog_old", prog_old), ("prog_jump", prog_jump),
                     ("prog_sym", prog_sym)):
        results[name] = med(fn, reps)
    for name, fn, args in (
            ("stats_xla", lambda: neighbor_core_stats(idx, es, et,
                                                      n_offsets=0)[0], ()),
            ("stats_dma", lambda: core_stats_pallas_dma(idx, es, et), ()),
            ("stats_sym", lambda: core_stats_pallas_sym(idx_p, es, et), ()),
            ("min_xla", lambda: neighbor_min_sweep(idx, payload, es, et),
             ()),
            ("min_dma", lambda: min_sweep_pallas_dma(idx, payload, es, et),
             ()),
            ("min_sym", lambda: min_sweep_pallas_sym(idx_p, payload, es,
                                                     et), ()),
            ("build_plain", lambda: build(False).cand_idx, ()),
            ("build_pairs", lambda: build(True).cand_idx, ()),
    ):
        results[name] = med(fn, reps)
    for name, (m, ts) in results.items():
        print(f"{name:12s} {m:7.0f} ms   reps {[f'{t*1e3:.0f}' for t in ts]}")


def denoise_section(reps=3):
    """AB_DENOISE=1: the min_frames denoise-scale cluster program — the
    symmetric engine's biggest projected win (full sweeps at ~9.5M pts)."""
    from tools._scene import load_bench_scene_denoise
    from radar_point_cloud_tracking_tpu.ops.pallas_neighbors import (
        core_stats_pallas_sym_mf)

    points, n, cap, cfg = load_bench_scene_denoise(100)
    print(f"denoise scene: {n:,} points, capacity {cap:,}")
    es, et = jnp.float32(8.0), jnp.float32(2.0)
    valid = jnp.arange(cap) < jnp.int32(n)
    on_tpu = jax.default_backend() == "tpu"

    def build(pairs):
        idx = build_spatial_index(points[:, :2], points[:, 3], valid,
                                  8.0, 2.0, tile=512, pairs=pairs)
        jax.block_until_ready(idx.cand_idx)
        return idx

    idx = build(False)
    idx_p = build(True)
    from radar_point_cloud_tracking_tpu.ops.neighbors import (
        sym_pair_chunk_cap)

    n_chunks = -(-idx_p.pair_a.shape[0] // sym_pair_chunk_cap())
    print(f"pairs: {int(idx_p.pair_count):,} "
          f"(P_pad={idx_p.pair_a.shape[0]}, {n_chunks} SMEM chunks)")
    dmf_s = core_stats_pallas_sym_mf(idx_p, es, et, 2)
    dmf_x = neighbor_core_stats(idx_p, es, et, n_offsets=2)
    v = np.asarray(idx_p.valid)
    ok = (np.array_equal(np.asarray(dmf_s[0])[v], np.asarray(dmf_x[0])[v])
          and np.array_equal(np.asarray(dmf_s[1])[v],
                             np.asarray(dmf_x[1])[v]))
    print(f"denoise-scene SYM_MF stats match XLA: {ok}")
    assert ok

    def prog(ix):
        lbl, k = cluster_index(ix, es, et, 15, 2, 2, "if_earlier", 256,
                               use_pallas=on_tpu)
        jax.block_until_ready(lbl)
        return lbl, k

    l_plain, k_plain = prog(idx)
    l_sym, k_sym = prog(idx_p)
    same = bool(jnp.array_equal(l_plain, l_sym))
    print(f"denoise cluster labels equal: {same} "
          f"({int(k_plain)}/{int(k_sym)} clusters)")
    assert same
    for name, ix in (("den_plain", idx), ("den_sym", idx_p)):
        m, ts = med(lambda: prog(ix)[0], reps)
        print(f"{name:12s} {m:7.0f} ms   reps "
              f"{[f'{t*1e3:.0f}' for t in ts]}")


if __name__ == "__main__":
    import os

    if os.environ.get("AB_DENOISE"):
        denoise_section()
    else:
        main()
