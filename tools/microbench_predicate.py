#!/usr/bin/env python3
"""Settle the two-stage pair-predicate question (VERDICT r3 item 4) with a
direct VPU microbenchmark: per (T, T) block, the symmetric kernels' exact
f32 predicate vs (a) a bf16 predicate and (b) a two-stage
bf16-reject + predicated f32 confirm.

If bf16 elementwise arithmetic is not materially faster than f32 on the
VPU (it is a storage format; the ALUs compute f32), the two-stage idea
cannot win and is recorded as refuted.

Usage: python tools/microbench_predicate.py [T] [reps]
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = int(sys.argv[1]) if len(sys.argv) > 1 else 512
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
GRID = 512  # pair blocks per launch


def _mk(mode: str):
    """mode: f32 | bf16 | two_stage"""

    def kernel(x_ref, y_ref, t_ref, eps_ref, out_ref):
        p = pl.program_id(0)
        xa = x_ref[0]
        ya = y_ref[0]
        ta = t_ref[0]
        # shift the "b side" by one row so blocks differ per step without
        # extra inputs (the DMA cost is out of scope here: compute only)
        xb = jnp.roll(xa, 1)
        yb = jnp.roll(ya, 1)
        tb = jnp.roll(ta, 1)
        eps2 = eps_ref[0, 0]
        eps_t = eps_ref[0, 1]
        if mode == "bf16":
            xab = xa.astype(jnp.bfloat16)
            xbb = xb.astype(jnp.bfloat16)
            yab = ya.astype(jnp.bfloat16)
            ybb = yb.astype(jnp.bfloat16)
            dx = xab[:, None] - xbb[None, :]
            dy = yab[:, None] - ybb[None, :]
            d2 = dx * dx + dy * dy
            dt = tb[None, :] - ta[:, None]
            mask = ((d2 <= jnp.bfloat16(eps2)) & (jnp.abs(dt) <= eps_t))
            out_ref[0, 0] = out_ref[0, 0] + jnp.sum(
                mask, axis=1, dtype=jnp.int32)
        elif mode == "two_stage":
            xab = xa.astype(jnp.bfloat16)
            xbb = xb.astype(jnp.bfloat16)
            yab = ya.astype(jnp.bfloat16)
            ybb = yb.astype(jnp.bfloat16)
            dx = xab[:, None] - xbb[None, :]
            dy = yab[:, None] - ybb[None, :]
            d2_lo = dx * dx + dy * dy  # ~3 rel eps of bf16 error
            dt = tb[None, :] - ta[:, None]
            tmask = jnp.abs(dt) <= eps_t
            # outward-rounded conservative bands
            margin = jnp.bfloat16(1.05)
            sure_out = d2_lo > jnp.bfloat16(eps2) * margin
            sure_in = d2_lo <= jnp.bfloat16(eps2) / margin
            uncertain = jnp.logical_not(sure_out | sure_in)

            @pl.when(jnp.any(uncertain))
            def _():
                dxf = xa[:, None] - xb[None, :]
                dyf = ya[:, None] - yb[None, :]
                d2f = dxf * dxf + dyf * dyf
                m = (d2f <= eps2) & tmask
                out_ref[0, 0] = out_ref[0, 0] + jnp.sum(
                    m, axis=1, dtype=jnp.int32)

            @pl.when(jnp.logical_not(jnp.any(uncertain)))
            def _():
                m = sure_in & tmask
                out_ref[0, 0] = out_ref[0, 0] + jnp.sum(
                    m, axis=1, dtype=jnp.int32)
        else:
            dx = xa[:, None] - xb[None, :]
            dy = ya[:, None] - yb[None, :]
            d2 = dx * dx + dy * dy
            dt = tb[None, :] - ta[:, None]
            mask = (d2 <= eps2) & (jnp.abs(dt) <= eps_t)
            out_ref[0, 0] = out_ref[0, 0] + jnp.sum(
                mask, axis=1, dtype=jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec((1, T), lambda p: (0, 0)),
            pl.BlockSpec((1, T), lambda p: (0, 0)),
            pl.BlockSpec((1, T), lambda p: (0, 0)),
            pl.BlockSpec((1, 2), lambda p: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, T), lambda p: (0, 0, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, 1, T), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def main():
    print(f"backend: {jax.default_backend()}, T={T}, grid={GRID}, "
          f"reps={REPS}")
    rng = np.random.default_rng(0)
    # ~8% of pairs inside eps at these densities (flagship-like sparsity)
    x = jnp.asarray(rng.uniform(0, 300, (1, T)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 300, (1, T)).astype(np.float32))
    t = jnp.asarray(rng.integers(0, 10, (1, T)).astype(np.float32))
    eps = jnp.asarray([[64.0, 2.0]], np.float32)  # eps2=64 (eps=8), eps_t=2

    results = {}
    for mode in ("f32", "bf16", "two_stage"):
        fn = jax.jit(_mk(mode))
        out = fn(x, y, t, eps)
        jax.block_until_ready(out)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = fn(x, y, t, eps)
            jax.block_until_ready(out)
            times.append((time.perf_counter() - t0) / REPS)
        per_block_us = min(times) / GRID * 1e6
        results[mode] = per_block_us
        print(f"{mode:10s}: {min(times)*1e3:8.3f} ms/launch "
              f"({per_block_us:7.3f} us per {T}x{T} block)  "
              f"checksum={int(jnp.sum(out))}")
    print(f"\nbf16/f32 ratio: {results['bf16']/results['f32']:.3f}  "
          f"two_stage/f32 ratio: {results['two_stage']/results['f32']:.3f}")
    print("(>0.95 means bf16 arithmetic buys nothing on this VPU and the "
          "two-stage predicate is refuted)")


if __name__ == "__main__":
    main()
