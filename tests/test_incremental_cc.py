"""Round-2 machinery: gated incremental sweeps, packed state pull,
direct-index digitize edge cases."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radar_point_cloud_tracking_tpu.ops.neighbors import (
    INT_MAX,
    build_spatial_index,
    neighbor_min_sweep,
    neighbor_min_sweep_gated,
)
from radar_point_cloud_tracking_tpu.ops import tracking as tk


def _random_index(rng, n=700, tile=64):
    coords = rng.uniform(0, 300, (n, 2)).astype(np.float32)
    times = rng.integers(0, 10, n).astype(np.float32)
    valid = np.ones(n, bool)
    valid[rng.choice(n, 30, replace=False)] = False
    return build_spatial_index(jnp.asarray(coords), jnp.asarray(times),
                               jnp.asarray(valid), 8.0, 2.0, tile=tile)


def test_gated_sweep_all_changed_equals_full_sweep():
    rng = np.random.default_rng(3)
    idx = _random_index(rng)
    nt, t = idx.num_tiles, idx.tile
    payload = jnp.asarray(
        rng.integers(0, 1000, (nt, t)).astype(np.int32))
    es, et = jnp.float32(8.0), jnp.float32(2.0)
    full = neighbor_min_sweep(idx, payload, es, et)
    gated = neighbor_min_sweep_gated(
        idx, payload, es, et, jnp.full((nt, t), INT_MAX, jnp.int32),
        jnp.ones((nt,), bool))
    assert np.array_equal(np.asarray(full), np.asarray(gated))


def test_gated_sweep_partial_frontier_accumulates_exactly():
    """Scanning only changed tiles while folding into the accumulator must
    reproduce the full sweep whenever unchanged tiles' payload really is
    unchanged since the last fold (the invariant the CC loop maintains)."""
    rng = np.random.default_rng(4)
    idx = _random_index(rng)
    nt, t = idx.num_tiles, idx.tile
    es, et = jnp.float32(8.0), jnp.float32(2.0)

    pay0 = jnp.asarray(rng.integers(500, 1000, (nt, t)).astype(np.int32))
    acc = neighbor_min_sweep(idx, pay0, es, et)

    # decrease payloads in a few tiles only (monotone, like label rounds)
    changed = np.zeros(nt, bool)
    changed[rng.choice(nt, max(1, nt // 3), replace=False)] = True
    dec = rng.integers(0, 400, (nt, t)).astype(np.int32)
    pay1 = np.asarray(pay0).copy()
    pay1[changed] = np.minimum(pay1[changed], dec[changed])
    pay1 = jnp.asarray(pay1)

    gated = neighbor_min_sweep_gated(idx, pay1, es, et, acc,
                                     jnp.asarray(changed))
    full = neighbor_min_sweep(idx, pay1, es, et)
    assert np.array_equal(np.asarray(gated), np.asarray(full))


def test_pack_unpack_state_roundtrip():
    o, h = 16, 5
    rng = np.random.default_rng(0)
    state = tk.TrackerState(
        active=jnp.asarray(rng.random(o) < 0.5),
        object_id=jnp.asarray(rng.integers(0, 99, o).astype(np.int32)),
        last_pos=jnp.asarray(rng.normal(0, 1e4, (o, 2)).astype(np.float32)),
        last_seen=jnp.asarray(rng.integers(0, 50, o).astype(np.int32)),
        first_frame=jnp.asarray(rng.integers(0, 50, o).astype(np.int32)),
        frames_seen=jnp.asarray(rng.integers(0, 50, o).astype(np.int32)),
        vel_ring=jnp.asarray(
            rng.normal(0, 3, (o, h, 2)).astype(np.float32)),
        vel_count=jnp.asarray(rng.integers(0, 9, o).astype(np.int32)),
        type_code=jnp.asarray(rng.integers(0, 3, o).astype(np.int32)),
        next_id=jnp.int32(37),
    )
    packed = np.asarray(tk.pack_state_with(
        state, jnp.asarray([123], jnp.int32)))
    extra, out = tk.unpack_state(packed, o, h, 1)
    assert extra[0] == 123
    for a, b in zip(state, out):
        assert np.array_equal(np.asarray(a), np.asarray(b)), b
    assert out.next_id.shape == ()


def test_native_digitize_on_exact_edges():
    """Points landing exactly ON a float64 edge must bin like np.digitize."""
    native = pytest.importorskip(
        "radar_point_cloud_tracking_tpu.native")
    if not native.HAVE_NATIVE:
        pytest.skip("native library unavailable")

    # craft a sweep whose produced x values include exact edge hits:
    # x = (scale_div[r]*bin)*cos_r[r]; use cos=1, sin=0, scale_div=5
    n = 64
    rows = np.zeros(n, np.uint16)
    bins = np.arange(n).astype(np.uint16)
    vals = np.full(n, 100.0, np.float32)
    scale_div = np.array([5.0], np.float32)
    cos_r = np.array([1.0], np.float32)
    sin_r = np.array([0.0], np.float32)
    # edges at multiples of 5 -> every x = 5*bin is an exact edge hit
    x_edges = np.arange(0.0, 5.0 * n + 5.0, 5.0)
    y_edges = np.arange(-5.0, 10.0, 5.0)
    nx, ny = len(x_edges) - 1, len(y_edges) - 1

    count = np.zeros(nx * ny, np.int64)
    vsum = np.zeros(nx * ny, np.float64)
    native.land_grid_accumulate(rows, bins, vals, scale_div, cos_r, sin_r,
                                x_edges, y_edges, count, vsum)

    x = (scale_div[rows] * bins.astype(np.float32)) * cos_r[rows]
    y = (scale_div[rows] * bins.astype(np.float32)) * sin_r[rows]
    xi = np.clip(np.digitize(x, x_edges) - 1, 0, nx - 1)
    yi = np.clip(np.digitize(y, y_edges) - 1, 0, ny - 1)
    ref = np.bincount(xi.astype(np.int64) * ny + yi, minlength=nx * ny)
    assert np.array_equal(count, ref)
