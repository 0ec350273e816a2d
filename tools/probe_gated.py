#!/usr/bin/env python3
"""Decompose the gated sweep's frontier-INDEPENDENT cost at denoise scale.

Measured (profile_denoise_cluster): a 245-tile frontier costs ~2.5 s while
a full symmetric sweep is 2.2 s — the gated sweep has a ~2.4 s floor that
neither the frontier size nor the lax.map chunk count explains.  This
probe times the gated sweep at zero/sparse/dense frontiers and its pieces
(candidate compaction, reorder gathers, the map skeleton) separately.

Usage: python tools/probe_gated.py
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
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from tools._scene import load_bench_scene_denoise
    from radar_point_cloud_tracking_tpu.ops.neighbors import (
        INT_MAX, build_spatial_index, neighbor_min_sweep_gated, _chunked,
        _query_chunk, _unchunk)

    points, n, cap, cfg = load_bench_scene_denoise(100)
    es, et = jnp.float32(8.0), jnp.float32(2.0)
    valid = jnp.arange(cap) < jnp.int32(n)
    index = build_spatial_index(points[:, :2], points[:, 3], valid,
                                8.0, 2.0, tile=512, pairs=False)
    jax.block_until_ready(index.cand_idx)
    nt, tile = index.num_tiles, index.tile
    k = index.cand_idx.shape[1]
    print(f"denoise index: nt={nt}, tile={tile}, k_pad={k}, "
          f"chunk={_query_chunk(nt)}, "
          f"max_cand={int(np.asarray(index.cand_count).max())}, "
          f"sum_cand={int(np.asarray(index.cand_count).sum()):,}")

    rng = np.random.default_rng(0)
    pay_np = rng.integers(0, n, (nt, tile)).astype(np.int32)
    pay_np[~np.asarray(index.valid)] = INT_MAX
    payload = jnp.asarray(pay_np)
    acc = jnp.full((nt, tile), INT_MAX, jnp.int32)

    for name, nchanged in (("zero", 0), ("sparse245", 245),
                           ("mid2048", 2048), ("all", nt)):
        ch = np.zeros((nt,), bool)
        if nchanged:
            ch[rng.choice(nt, nchanged, replace=False)] = True
        changed = jnp.asarray(ch)
        dt = t(lambda: neighbor_min_sweep_gated(index, payload, es, et,
                                                acc, changed))
        print(f"gated sweep frontier={name:9s}: {dt*1e3:7.0f} ms")

    # pieces
    @jax.jit
    def compaction(tile_changed):
        cvalid = (jnp.arange(k, dtype=jnp.int32)[None, :]
                  < index.cand_count[:, None])
        want = tile_changed[index.cand_idx] & cvalid
        dest = jnp.where(want, jnp.cumsum(want, axis=1) - 1, k)
        rows = jnp.broadcast_to(
            jnp.arange(nt, dtype=jnp.int32)[:, None], dest.shape)
        cand_idx2 = jnp.zeros((nt * (k + 1),), jnp.int32).at[
            (rows * (k + 1) + dest).reshape(-1)].set(
            index.cand_idx.reshape(-1), mode="drop").reshape(
            nt, k + 1)[:, :k]
        cand_count2 = jnp.sum(want, axis=1, dtype=jnp.int32)
        qorder2 = jnp.argsort(cand_count2, stable=True).astype(jnp.int32)
        return cand_idx2, cand_count2, qorder2

    changed = jnp.asarray(np.zeros((nt,), bool))
    dt = t(lambda: compaction(changed))
    print(f"compaction alone:            {dt*1e3:7.0f} ms")

    ci2, cc2, qo2 = compaction(changed)

    @jax.jit
    def reorder_and_skeleton(ci2, cc2, qo2, acc):
        qcs, qorder = _chunked(index, _query_chunk(nt), qorder=qo2,
                               cand_idx=ci2, cand_count=cc2)
        nc = qcs[0].shape[0]
        qcs = qcs + (acc[qorder].reshape(nc, -1, tile),)

        def chunk_fn(args):
            qc, qt, qv, cands, ccount, acc0 = args
            return acc0  # no sweep work: pure gather/dispatch skeleton

        out = jax.lax.map(chunk_fn, qcs)
        return _unchunk(out, qorder, nt, tile)

    dt = t(lambda: reorder_and_skeleton(ci2, cc2, qo2, acc))
    print(f"reorder+map skeleton:        {dt*1e3:7.0f} ms")


if __name__ == "__main__":
    main()
