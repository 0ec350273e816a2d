#!/usr/bin/env python3
"""Measure TPU row scatter/gather/segment-reduce primitives at the shapes a
symmetric (compute-each-unordered-pair-once) sweep engine would need.

A symmetric stats/min kernel halves pair-predicate work but must fold each
pair block's column-reduction into the CANDIDATE tile's output row — an
accumulation XLA can only express as a row scatter-add/min (or a row
gather + sorted-segment reduce).  Whether that accumulation costs less
than the ~80-140 ms of predicate work it saves decides the project, so
measure the primitives first.

Usage: python tools/microbench_scatter.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return np.median(ts) * 1e3


def main():
    t = 512
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}")
    for label, nt, npairs in (("tracker", 3072, 34_000),
                              ("denoise", 18_500, 294_000)):
        b_ids = jnp.asarray(rng.integers(0, nt, npairs), jnp.int32)
        b_sorted = jnp.sort(b_ids)
        partial_i = jnp.asarray(
            rng.integers(0, 1 << 20, (npairs, t)), jnp.int32)
        table = jnp.asarray(rng.integers(0, 1 << 20, (nt, t)), jnp.int32)

        @jax.jit
        def scat_add(ids, vals):
            return jnp.zeros((nt, t), jnp.int32).at[ids].add(vals)

        @jax.jit
        def scat_min(ids, vals):
            return jnp.full((nt, t), np.iinfo(np.int32).max,
                            jnp.int32).at[ids].min(vals)

        @jax.jit
        def row_gather(ids):
            return table[ids]

        @jax.jit
        def seg_min_sorted(ids, vals):
            return jax.ops.segment_min(vals, ids, num_segments=nt,
                                       indices_are_sorted=True)

        ms_add = timed(scat_add, b_ids, partial_i)
        ms_min = timed(scat_min, b_ids, partial_i)
        ms_add_s = timed(scat_add, b_sorted, partial_i)
        ms_min_s = timed(scat_min, b_sorted, partial_i)
        ms_g = timed(row_gather, b_ids)
        ms_seg = timed(seg_min_sorted, b_sorted, partial_i)
        print(f"{label}: nt={nt} pairs={npairs}  "
              f"scatter-add {ms_add:.1f} ms (sorted {ms_add_s:.1f})  "
              f"scatter-min {ms_min:.1f} ms (sorted {ms_min_s:.1f})  "
              f"row-gather {ms_g:.1f} ms  "
              f"segment-min(sorted) {ms_seg:.1f} ms")


if __name__ == "__main__":
    main()
