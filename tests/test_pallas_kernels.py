"""Pallas neighbor kernels vs the XLA-composed engine (interpret mode on
CPU; the same code compiles with Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from radar_point_cloud_tracking_tpu.ops.neighbors import (
    INT_MAX,
    build_spatial_index,
    neighbor_core_stats,
    neighbor_min_sweep,
)
from radar_point_cloud_tracking_tpu.ops.pallas_neighbors import (
    core_stats_pallas,
    min_sweep_pallas,
)


def _index(n=300, d=2, seed=0, tile=64):
    rng = np.random.default_rng(seed)
    coords = (rng.random((n, d)) * 50).astype(np.float32)
    times = rng.integers(0, 4, n).astype(np.float32)
    valid = np.ones(n, bool)
    valid[-7:] = False
    return build_spatial_index(jnp.asarray(coords), jnp.asarray(times),
                               jnp.asarray(valid), 4.0, 1.0, tile=tile)


@pytest.mark.parametrize("d", [2, 3])
def test_core_stats_matches_xla(d):
    idx = _index(d=d)
    es, et = jnp.float32(4.0), jnp.float32(1.0)
    deg_x, fc_x = neighbor_core_stats(idx, es, et, n_offsets=1)
    deg_p, fc_p = core_stats_pallas(idx, es, et, n_offsets=1)
    # outputs at invalid/padded slots are unspecified (the XLA engine's
    # sentinel-coordinate design lets invalid-invalid pairs count there;
    # every consumer masks with index.valid) — compare valid slots
    v = np.asarray(idx.valid)
    np.testing.assert_array_equal(np.asarray(deg_p)[v], np.asarray(deg_x)[v])
    np.testing.assert_array_equal(np.asarray(fc_p)[v], np.asarray(fc_x)[v])


def test_min_sweep_matches_xla():
    idx = _index()
    es, et = jnp.float32(4.0), jnp.float32(1.0)
    rng = np.random.default_rng(1)
    payload = rng.integers(0, 1000, idx.coords.shape[:2]).astype(np.int32)
    payload[rng.random(payload.shape) < 0.5] = INT_MAX
    # engine contract: invalid/padded slots never carry payloads (every
    # production caller writes them INT_MAX via where(core, ..., INT_MAX))
    payload[~np.asarray(idx.valid)] = INT_MAX
    pay = jnp.asarray(payload)
    out_x = neighbor_min_sweep(idx, pay, es, et)
    out_p = min_sweep_pallas(idx, pay, es, et)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_x))


def test_min_sweep_with_limit_matches_xla():
    idx = _index(seed=2)
    es, et = jnp.float32(4.0), jnp.float32(1.0)
    rng = np.random.default_rng(3)
    shape = idx.coords.shape[:2]
    payload = rng.integers(0, 500, shape).astype(np.int32)
    payload[~np.asarray(idx.valid)] = INT_MAX
    qlim = rng.integers(0, 500, shape).astype(np.int32)
    byp = rng.random(shape) < 0.2
    out_x = neighbor_min_sweep(idx, jnp.asarray(payload), es, et,
                               query_limit=jnp.asarray(qlim),
                               bypass_limit=jnp.asarray(byp),
                               use_limit=True)
    out_p = min_sweep_pallas(idx, jnp.asarray(payload), es, et,
                             query_limit=jnp.asarray(qlim),
                             bypass_limit=jnp.asarray(byp),
                             use_limit=True)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_x))


def test_dma_core_stats_matches_xla():
    """The manual-DMA degree sweep (the hybrid engine's production stats
    path on TPU, ops/stdbscan.py) must match the XLA engine bit-for-bit on
    valid slots.  Interpret mode on CPU; Mosaic compiles the same kernel
    on TPU (on-chip equality asserted by tools/profile_stdbscan.py)."""
    from radar_point_cloud_tracking_tpu.ops.pallas_neighbors import (
        core_stats_pallas_dma)

    idx = _index(seed=4)
    es, et = jnp.float32(4.0), jnp.float32(1.0)
    deg_x, _ = neighbor_core_stats(idx, es, et)
    deg_p = core_stats_pallas_dma(idx, es, et)
    v = np.asarray(idx.valid)
    np.testing.assert_array_equal(np.asarray(deg_p)[v], np.asarray(deg_x)[v])


def test_dma_min_sweep_matches_xla():
    from radar_point_cloud_tracking_tpu.ops.pallas_neighbors import (
        min_sweep_pallas_dma)

    idx = _index(seed=5)
    es, et = jnp.float32(4.0), jnp.float32(1.0)
    rng = np.random.default_rng(6)
    payload = rng.integers(0, 1000, idx.coords.shape[:2]).astype(np.int32)
    payload[rng.random(payload.shape) < 0.5] = INT_MAX
    payload[~np.asarray(idx.valid)] = INT_MAX
    pay = jnp.asarray(payload)
    out_x = neighbor_min_sweep(idx, pay, es, et)
    out_p = min_sweep_pallas_dma(idx, pay, es, et)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_x))


def test_dma_kernels_undersized_kpad_clamp():
    """With an undersized static k_pad the DMA kernels must stay in bounds
    (clamped loop) — results are then invalid and the caller's overflow
    check triggers a rebuild; here we only require no crash and agreement
    with the XLA engine under the SAME truncated candidate table."""
    from radar_point_cloud_tracking_tpu.ops.pallas_neighbors import (
        core_stats_pallas_dma)

    idx = _index(seed=7)
    k_small = max(1, idx.cand_idx.shape[1] // 2)
    idx_small = type(idx)(coords=idx.coords, times=idx.times,
                          valid=idx.valid, perm=idx.perm,
                          cand_idx=idx.cand_idx[:, :k_small],
                          cand_count=idx.cand_count, qorder=idx.qorder)
    es, et = jnp.float32(4.0), jnp.float32(1.0)
    deg_x, _ = neighbor_core_stats(idx_small, es, et)
    deg_p = core_stats_pallas_dma(idx_small, es, et)
    v = np.asarray(idx.valid)
    np.testing.assert_array_equal(np.asarray(deg_p)[v], np.asarray(deg_x)[v])
