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

__all__ = ["min_sweep_pallas", "core_stats_pallas", "min_sweep_pallas_dma",
           "core_stats_pallas_dma"]


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


# ---------------------------------------------------------------------------
# Manual-DMA variant: unbounded candidate tables
# ---------------------------------------------------------------------------
#
# The scalar-prefetch kernels above keep the whole (Ntiles, K) candidate
# table in SMEM, which caps problem size (~1 MB SMEM).  This variant streams
# candidates per query tile: the kernel DMAs its own candidate row from HBM
# into SMEM, then double-buffers candidate planes HBM -> VMEM while the VPU
# evaluates the previous tile's pair predicate.


def _make_dma_min_kernel(k_pad: int, tile: int):
    def kernel(count_ref, cand_hbm, fplanes_hbm, iplanes_hbm,
               qf_ref, eps_ref, out_ref,
               cand_smem, fbuf, ibuf, acc, sems, row_sem):
        q = pl.program_id(0)

        # candidate row: HBM -> SMEM ((1, K) slice covers the full trailing
        # dims, which Mosaic requires for leading-dim slicing)
        row = pltpu.make_async_copy(cand_hbm.at[q], cand_smem, row_sem)
        row.start()
        row.wait()

        # counts can exceed the static table width under an undersized
        # k_pad hint (detected + retried by the caller); stay in bounds
        n = jnp.minimum(count_ref[q], k_pad)
        eps2 = eps_ref[0, 0]
        eps_t = eps_ref[0, 1]

        xq = qf_ref[0, 0]
        yq = qf_ref[0, 1]
        tq = qf_ref[0, 2]

        def start_fetch(slot, k):
            c = cand_smem[0, k]
            f = pltpu.make_async_copy(fplanes_hbm.at[c], fbuf.at[slot],
                                      sems.at[slot, 0])
            i = pltpu.make_async_copy(iplanes_hbm.at[c], ibuf.at[slot],
                                      sems.at[slot, 1])
            f.start()
            i.start()

        def wait_fetch(slot, k):
            c = cand_smem[0, k]
            pltpu.make_async_copy(fplanes_hbm.at[c], fbuf.at[slot],
                                  sems.at[slot, 0]).wait()
            pltpu.make_async_copy(iplanes_hbm.at[c], ibuf.at[slot],
                                  sems.at[slot, 1]).wait()

        acc[...] = jnp.full_like(acc, INT_MAX)

        @pl.when(n > 0)
        def _():
            start_fetch(0, 0)

            def body(k, _):
                slot = jax.lax.rem(k, 2)

                @pl.when(k + 1 < n)
                def _():
                    start_fetch(jax.lax.rem(k + 1, 2), k + 1)

                wait_fetch(slot, k)
                xc = fbuf[slot, 0]
                yc = fbuf[slot, 1]
                tc = fbuf[slot, 2]
                pay = ibuf[slot, 1]
                dx = xq[:, None] - xc[None, :]
                dy = yq[:, None] - yc[None, :]
                dt = tc[None, :] - tq[:, None]
                # no validity operands: invalid points carry the far-away
                # sentinel coordinate (see neighbors._sort_and_tile), and
                # the fori_loop covers exactly the live candidates
                mask = ((dx * dx + dy * dy <= eps2)
                        & (jnp.abs(dt) <= eps_t))
                cand_min = jnp.min(jnp.where(mask, pay[None, :], INT_MAX),
                                   axis=1)
                acc[0] = jnp.minimum(acc[0], cand_min)
                return 0

            jax.lax.fori_loop(0, n, body, 0)

        out_ref[0, 0] = acc[0]

    return kernel


def _make_dma_stats_kernel(k_pad: int, tile: int):
    # degree needs only the float planes (x, y, t): no payload/validity
    # stream — the min kernel's second (iplanes) DMA would double this
    # kernel's HBM traffic for data it never reads
    def kernel(count_ref, cand_hbm, fplanes_hbm,
               qf_ref, eps_ref, deg_ref,
               cand_smem, fbuf, acc, sems, row_sem):
        q = pl.program_id(0)

        row = pltpu.make_async_copy(cand_hbm.at[q], cand_smem, row_sem)
        row.start()
        row.wait()

        n = jnp.minimum(count_ref[q], k_pad)
        eps2 = eps_ref[0, 0]
        eps_t = eps_ref[0, 1]

        xq = qf_ref[0, 0]
        yq = qf_ref[0, 1]
        tq = qf_ref[0, 2]

        def start_fetch(slot, k):
            c = cand_smem[0, k]
            pltpu.make_async_copy(fplanes_hbm.at[c], fbuf.at[slot],
                                  sems.at[slot]).start()

        def wait_fetch(slot, k):
            c = cand_smem[0, k]
            pltpu.make_async_copy(fplanes_hbm.at[c], fbuf.at[slot],
                                  sems.at[slot]).wait()

        acc[...] = jnp.zeros_like(acc)

        @pl.when(n > 0)
        def _():
            start_fetch(0, 0)

            def body(k, _):
                slot = jax.lax.rem(k, 2)

                @pl.when(k + 1 < n)
                def _():
                    start_fetch(jax.lax.rem(k + 1, 2), k + 1)

                wait_fetch(slot, k)
                xc = fbuf[slot, 0]
                yc = fbuf[slot, 1]
                tc = fbuf[slot, 2]
                dx = xq[:, None] - xc[None, :]
                dy = yq[:, None] - yc[None, :]
                dt = tc[None, :] - tq[:, None]
                # sentinel-coordinate invalid points need no validity test
                mask = ((dx * dx + dy * dy <= eps2)
                        & (jnp.abs(dt) <= eps_t))
                acc[0] = acc[0] + jnp.sum(mask, axis=1, dtype=jnp.int32)
                return 0

            jax.lax.fori_loop(0, n, body, 0)

        deg_ref[0, 0] = acc[0]

    return kernel


@jax.jit
def core_stats_pallas_dma(
    index: SpatialIndex,
    eps_space: jnp.ndarray,
    eps_time: jnp.ndarray,
) -> jnp.ndarray:
    """Manual-DMA ST-neighbor degree sweep (2D coords, no min_frames): the
    Pallas twin of neighbors.neighbor_core_stats' degree output.  Used by
    the hybrid clustering path (ops/stdbscan.py) for the min_frames == 1
    tracker case; the frame-presence variant falls back to XLA."""
    nt, t = index.num_tiles, index.tile
    k_pad = index.cand_idx.shape[1]

    zf = jnp.zeros_like(index.times)
    fplanes = jnp.stack([index.coords[..., 0], index.coords[..., 1],
                         index.times, zf, zf, zf, zf, zf], axis=1)
    eps = jnp.stack([eps_space * eps_space, eps_time]).reshape(1, 2)

    q_spec_f = pl.BlockSpec((1, 8, t), lambda q, cnt: (q, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            q_spec_f,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, t), lambda q, cnt: (q, 0, 0)),
        scratch_shapes=[
            pltpu.SMEM((1, k_pad), jnp.int32),
            pltpu.VMEM((2, 8, t), jnp.float32),
            pltpu.VMEM((1, t), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    deg = pl.pallas_call(
        _make_dma_stats_kernel(k_pad, t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, 1, t), jnp.int32),
        interpret=_interpret(),
    )(index.cand_count, index.cand_idx.reshape(nt, 1, k_pad),
      fplanes, fplanes, eps)
    return deg.reshape(nt, t)


@jax.jit
def min_sweep_pallas_dma(
    index: SpatialIndex,
    payload: jnp.ndarray,  # (Ntiles, T) int32
    eps_space: jnp.ndarray,
    eps_time: jnp.ndarray,
) -> jnp.ndarray:
    """Manual-DMA min sweep (2D coords, no limit variant): candidate table
    stays in HBM, tiles stream through double-buffered VMEM scratch."""
    nt, t = index.num_tiles, index.tile
    k_pad = index.cand_idx.shape[1]

    # packed candidate planes: one f32 stack (x, y, t), one i32 (valid,
    # pay) — padded to 8 rows so Mosaic can slice the leading dim (sublane
    # alignment)
    zf = jnp.zeros_like(index.times)
    fplanes = jnp.stack([index.coords[..., 0], index.coords[..., 1],
                         index.times, zf, zf, zf, zf, zf],
                        axis=1)  # (nt, 8, T)
    zi = jnp.zeros_like(payload)
    iplanes = jnp.stack([index.valid.astype(jnp.int32), payload,
                         zi, zi, zi, zi, zi, zi], axis=1)  # (nt, 8, T)
    eps = jnp.stack([eps_space * eps_space, eps_time]).reshape(1, 2)

    q_spec_f = pl.BlockSpec((1, 8, t), lambda q, cnt: (q, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # cand_count
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # cand_idx stays in HBM
            pl.BlockSpec(memory_space=pltpu.HBM),  # fplanes stay in HBM
            pl.BlockSpec(memory_space=pltpu.HBM),  # iplanes stay in HBM
            q_spec_f,  # query f32 planes (pipelined to VMEM)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # eps scalars
        ],
        out_specs=pl.BlockSpec((1, 1, t), lambda q, cnt: (q, 0, 0)),
        scratch_shapes=[
            pltpu.SMEM((1, k_pad), jnp.int32),
            pltpu.VMEM((2, 8, t), jnp.float32),
            pltpu.VMEM((2, 8, t), jnp.int32),
            pltpu.VMEM((1, t), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    out = pl.pallas_call(
        _make_dma_min_kernel(k_pad, t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, 1, t), jnp.int32),
        interpret=_interpret(),
    )(index.cand_count, index.cand_idx.reshape(nt, 1, k_pad),
      fplanes, iplanes, fplanes, eps)
    return out.reshape(nt, t)
