"""Device assignment solver vs scipy.optimize.linear_sum_assignment."""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from radar_point_cloud_tracking_tpu.ops.hungarian import solve_lsa, solve_lsa_host


def _total(cost, row_of_col):
    t = 0.0
    for j, i in enumerate(row_of_col):
        if i >= 0:
            t += cost[i, j]
    return t


def test_square_random_matches_scipy():
    rng = np.random.default_rng(0)
    for n in (1, 2, 3, 5, 8, 16, 33):
        cost = rng.random((n, n)).astype(np.float32) * 100
        row_of_col = np.asarray(solve_lsa(jnp.asarray(cost)))
        ri, ci = linear_sum_assignment(cost)
        want_total = cost[ri, ci].sum()
        got_total = _total(cost, row_of_col)
        assert abs(got_total - want_total) < 1e-2, (n, got_total, want_total)
        # with unique optimum the assignment itself matches
        scipy_row_of_col = np.full(n, -1)
        scipy_row_of_col[ci] = ri
        np.testing.assert_array_equal(row_of_col, scipy_row_of_col)


def test_rectangular_padded():
    rng = np.random.default_rng(1)
    for n, m in [(3, 7), (7, 3), (1, 5), (6, 6)]:
        cost = rng.random((n, m)).astype(np.float32) * 50
        rows, cols = solve_lsa_host(cost)
        ri, ci = linear_sum_assignment(cost)
        assert abs(cost[rows, cols].sum() - cost[ri, ci].sum()) < 1e-3
        assert len(rows) == min(n, m)


def test_gated_association_scenario():
    """Tracker-style: distances with an unmatched far detection."""
    cost = np.array([
        [1.0, 90.0, 80.0],
        [85.0, 2.0, 70.0],
        [60.0, 75.0, 300.0],  # far detection, gated out downstream
    ], dtype=np.float32)
    row_of_col = np.asarray(solve_lsa(jnp.asarray(cost)))
    ri, ci = linear_sum_assignment(cost)
    scipy_roc = np.full(3, -1)
    scipy_roc[ci] = ri
    np.testing.assert_array_equal(row_of_col, scipy_roc)
