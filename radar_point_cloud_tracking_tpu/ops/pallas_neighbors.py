"""Pallas TPU kernels for the ST-neighbor sweeps.

The XLA-composed engine (ops/neighbors.py) gathers each candidate tile with
a separate dynamic-slice inside a scan; these kernels instead drive the
candidate stream through Pallas' scalar-prefetch pipeline: the grid is
(query_tile, candidate_slot) and the candidate block index comes from the
prefetched candidate table, so Mosaic double-buffers candidate tiles straight
from HBM while the VPU evaluates the (T x T) pair predicate.  Accumulators
live in the revisited output block (same index across the candidate axis).

Coordinates are passed as separate (Ntiles, 1, T) planes (lane-aligned,
legal (1, 1, T) Mosaic blocks); masks ride as int32 planes (Mosaic cannot
insert minor dims on sub-32-bit vectors).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .neighbors import INT_MAX, SpatialIndex

__all__ = ["min_sweep_pallas", "core_stats_pallas"]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pair_mask_block(xq, yq, zq, xc, yc, zc, tq, tc, vq, vc, eps2, eps_t):
    dx = xq[:, None] - xc[None, :]
    dy = yq[:, None] - yc[None, :]
    d2 = dx * dx + dy * dy
    if zq is not None:
        dz = zq[:, None] - zc[None, :]
        d2 = d2 + dz * dz
    dt = tc[None, :] - tq[:, None]
    return ((d2 <= eps2) & (jnp.abs(dt) <= eps_t)
            & (vq[:, None] > 0) & (vc[None, :] > 0)), dt


def _make_min_kernel(has_z: bool, use_limit: bool):
    def kernel(cand_ref, count_ref, *refs):
        # tensor refs layout (all blocks (1, 1, T) unless noted):
        #   queries: x, y, [z], t, v, [qlim]
        #   candidates: x, y, [z], t, v, payload, [bypass]
        #   scalars: eps2, eps_t  (1, 1) SMEM
        #   out: (1, 1, T) int32
        i = 0
        xq = refs[i][0, 0]; i += 1
        yq = refs[i][0, 0]; i += 1
        zq = refs[i][0, 0] if has_z else None
        i += 1 if has_z else 0
        tq = refs[i][0, 0]; i += 1
        vq = refs[i][0, 0]; i += 1
        qlim = refs[i][0, 0] if use_limit else None
        i += 1 if use_limit else 0
        xc = refs[i][0, 0]; i += 1
        yc = refs[i][0, 0]; i += 1
        zc = refs[i][0, 0] if has_z else None
        i += 1 if has_z else 0
        tc = refs[i][0, 0]; i += 1
        vc = refs[i][0, 0]; i += 1
        pay = refs[i][0, 0]; i += 1
        byp = refs[i][0, 0] if use_limit else None
        i += 1 if use_limit else 0
        eps2 = refs[i][0, 0]; i += 1
        eps_t = refs[i][0, 0]; i += 1
        out_ref = refs[i]

        q = pl.program_id(0)
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            out_ref[...] = jnp.full_like(out_ref, INT_MAX)

        live = k < count_ref[q]

        @pl.when(live)
        def _():
            mask, _ = _pair_mask_block(xq, yq, zq, xc, yc, zc, tq, tc,
                                       vq, vc, eps2, eps_t)
            if use_limit:
                ok = (pay[None, :] < qlim[:, None]) | (byp[None, :] > 0)
                m = mask & ok
            else:
                m = mask
            cand_min = jnp.min(
                jnp.where(m, pay[None, :], INT_MAX), axis=1)
            out_ref[0, 0] = jnp.minimum(out_ref[0, 0], cand_min)

    return kernel


@functools.partial(jax.jit, static_argnames=("use_limit",))
def min_sweep_pallas(
    index: SpatialIndex,
    payload: jnp.ndarray,  # (Ntiles, T) int32 (masked entries INT_MAX)
    eps_space: jnp.ndarray,
    eps_time: jnp.ndarray,
    query_limit: Optional[jnp.ndarray] = None,
    bypass_limit: Optional[jnp.ndarray] = None,
    use_limit: bool = False,
) -> jnp.ndarray:
    """Pallas implementation of neighbors.neighbor_min_sweep."""
    nt, t = index.num_tiles, index.tile
    d = index.coords.shape[-1]
    has_z = d >= 3
    k_pad = index.cand_idx.shape[1]

    def p3(a):  # (nt, t) -> (nt, 1, t): legal Mosaic blocks (1, 1, t)
        return a.reshape(nt, 1, t)

    planes_q = [p3(index.coords[..., 0]), p3(index.coords[..., 1])]
    if has_z:
        planes_q.append(p3(index.coords[..., 2]))
    planes_q += [p3(index.times), p3(index.valid.astype(jnp.int32))]
    if use_limit:
        planes_q.append(p3(query_limit))
    planes_c = list(planes_q[:2 + (1 if has_z else 0)])
    planes_c += [p3(index.times), p3(index.valid.astype(jnp.int32)),
                 p3(payload)]
    if use_limit:
        if bypass_limit is None:
            bypass_limit = jnp.zeros((nt, t), jnp.int32)
        planes_c.append(p3(bypass_limit.astype(jnp.int32)))

    q_spec = pl.BlockSpec((1, 1, t), lambda q, k, cand, cnt: (q, 0, 0))
    c_spec = pl.BlockSpec((1, 1, t),
                          lambda q, k, cand, cnt: (cand[q, k], 0, 0))
    s_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt, k_pad),
        in_specs=([q_spec] * len(planes_q) + [c_spec] * len(planes_c)
                  + [s_spec, s_spec]),
        out_specs=pl.BlockSpec((1, 1, t), lambda q, k, cand, cnt: (q, 0, 0)),
    )

    out = pl.pallas_call(
        _make_min_kernel(has_z, use_limit),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, 1, t), jnp.int32),
        interpret=_interpret(),
    )(index.cand_idx, index.cand_count,
      *planes_q, *planes_c,
      (eps_space * eps_space).reshape(1, 1),
      eps_time.reshape(1, 1))
    return out.reshape(nt, t)


def _make_stats_kernel(has_z: bool, n_offsets: int):
    ki = n_offsets

    def kernel(cand_ref, count_ref, *refs):
        i = 0
        xq = refs[i][0, 0]; i += 1
        yq = refs[i][0, 0]; i += 1
        zq = refs[i][0, 0] if has_z else None
        i += 1 if has_z else 0
        tq = refs[i][0, 0]; i += 1
        vq = refs[i][0, 0]; i += 1
        xc = refs[i][0, 0]; i += 1
        yc = refs[i][0, 0]; i += 1
        zc = refs[i][0, 0] if has_z else None
        i += 1 if has_z else 0
        tc = refs[i][0, 0]; i += 1
        vc = refs[i][0, 0]; i += 1
        eps2 = refs[i][0, 0]; i += 1
        eps_t = refs[i][0, 0]; i += 1
        deg_ref = refs[i]; i += 1
        bits_ref = refs[i]

        q = pl.program_id(0)
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            deg_ref[...] = jnp.zeros_like(deg_ref)
            bits_ref[...] = jnp.zeros_like(bits_ref)

        live = k < count_ref[q]

        @pl.when(live)
        def _():
            mask, dt = _pair_mask_block(xq, yq, zq, xc, yc, zc, tq, tc,
                                        vq, vc, eps2, eps_t)
            deg_ref[0, 0] = deg_ref[0, 0] + jnp.sum(
                mask, axis=1, dtype=jnp.int32)
            if ki > 0:
                dti = jnp.round(dt).astype(jnp.int32)
                bits = bits_ref[0, 0]
                for off in range(-ki, ki + 1):
                    hit = jnp.any(mask & (dti == off), axis=1)
                    bits = bits | jnp.where(
                        hit, np.int32(1 << (off + ki)), 0).astype(jnp.int32)
                bits_ref[0, 0] = bits

    return kernel


@functools.partial(jax.jit, static_argnames=("n_offsets",))
def core_stats_pallas(
    index: SpatialIndex,
    eps_space: jnp.ndarray,
    eps_time: jnp.ndarray,
    n_offsets: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas implementation of neighbors.neighbor_core_stats."""
    from .neighbors import _popcount

    nt, t = index.num_tiles, index.tile
    d = index.coords.shape[-1]
    has_z = d >= 3
    k_pad = index.cand_idx.shape[1]

    def p3(a):
        return a.reshape(nt, 1, t)

    planes_q = [p3(index.coords[..., 0]), p3(index.coords[..., 1])]
    if has_z:
        planes_q.append(p3(index.coords[..., 2]))
    planes_q += [p3(index.times), p3(index.valid.astype(jnp.int32))]
    planes_c = list(planes_q)

    q_spec = pl.BlockSpec((1, 1, t), lambda q, k, cand, cnt: (q, 0, 0))
    c_spec = pl.BlockSpec((1, 1, t),
                          lambda q, k, cand, cnt: (cand[q, k], 0, 0))
    s_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    o_spec = pl.BlockSpec((1, 1, t), lambda q, k, cand, cnt: (q, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt, k_pad),
        in_specs=([q_spec] * len(planes_q) + [c_spec] * len(planes_c)
                  + [s_spec, s_spec]),
        out_specs=(o_spec, o_spec),
    )

    deg, bits = pl.pallas_call(
        _make_stats_kernel(has_z, n_offsets),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((nt, 1, t), jnp.int32),
                   jax.ShapeDtypeStruct((nt, 1, t), jnp.int32)),
        interpret=_interpret(),
    )(index.cand_idx, index.cand_count,
      *planes_q, *planes_c,
      (eps_space * eps_space).reshape(1, 1),
      eps_time.reshape(1, 1))
    deg = deg.reshape(nt, t)
    bits = bits.reshape(nt, t)
    frame_count = _popcount(bits) if n_offsets > 0 else jnp.zeros_like(deg)
    return deg, frame_count
