"""Device linear-sum-assignment (Hungarian / Jonker-Volgenant).

The reference associates clusters to tracks with host-side
``scipy.optimize.linear_sum_assignment`` (4_temporal_object_tracker.py:590).
Tracking a whole sequence without host round-trips needs the solver on
device: this is the shortest-augmenting-path formulation with dual
potentials, expressed with ``lax.fori_loop`` / ``lax.while_loop`` over
vectorized column updates — row count sequential steps, column work on the
VPU.  Exact optimum (identical total cost to scipy; identical assignment
whenever the optimum is unique).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["solve_lsa", "solve_lsa_host"]

_INF = np.float32(1e30)


@jax.jit
def solve_lsa(cost: jnp.ndarray,
              num_rows: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Solve the assignment problem for a square (N, N) cost matrix.

    Returns ``row_of_col`` (N,) int32 — row assigned to each column, -1 if
    unassigned.  ``num_rows`` (traced) restricts the augmenting loop to the
    first rows — with rows sorted real-first this solves the rectangular
    problem (num_rows x N) like scipy, at cost proportional to the *actual*
    row count instead of the padded capacity.
    """
    n = cost.shape[0]
    cost = cost.astype(jnp.float32)
    if num_rows is None:
        num_rows = jnp.int32(n)

    # p[j]: row matched to column j (virtual column n used as the augment
    # anchor); u/v: dual potentials.  The row duals are stored keyed BY THE
    # COLUMN currently holding the row (u[j] = dual of row p[j]): the
    # per-iteration tree update then is a pure elementwise select instead of
    # a scatter through p, and the dual follows its row during the
    # alternating-path flip.  Identical adds in identical order, so results
    # (and scipy tie-breaks) are bit-exact vs the row-keyed form.
    def solve_row(i, state):
        u, v, p = state
        # start an augmenting search from row i anchored at virtual col n;
        # row i has never been matched, so its dual is 0
        p = p.at[n].set(i)
        u = u.at[n].set(0.0)
        minv = jnp.full((n + 1,), _INF, jnp.float32)
        used = jnp.zeros((n + 1,), bool).at[n].set(True)
        way = jnp.zeros((n + 1,), jnp.int32)

        def augment_cond(s):
            _, _, _, _, j0, done = s
            return ~done

        def augment_body(s):
            minv_, used_, way_, (u_, v_), j0, _ = s
            i0 = p[j0]
            cur = cost[i0, :] - u_[j0] - v_[:n]
            cur = jnp.where(used_[:n], _INF, cur)
            better = cur < minv_[:n]
            minv_ = minv_.at[:n].set(jnp.where(better, cur, minv_[:n]))
            way_ = way_.at[:n].set(jnp.where(better, j0, way_[:n]))
            scan_min = jnp.where(used_[:n], _INF, minv_[:n])
            j1 = jnp.argmin(scan_min).astype(jnp.int32)
            delta = scan_min[j1]
            # update potentials along the tree, shrink others
            u_ = u_ + jnp.where(used_, delta, 0.0)
            v_ = jnp.where(used_, v_ - delta, v_)
            minv_ = jnp.where(used_, minv_, minv_ - delta)
            used_ = used_.at[j1].set(True)
            done = p[j1] < 0  # free column reached
            return minv_, used_, way_, (u_, v_), j1, done

        minv, used, way, (u, v), j0, _ = jax.lax.while_loop(
            augment_cond, augment_body,
            (minv, used, way, (u, v), jnp.int32(n), jnp.bool_(False)))

        # walk the alternating path back, flipping matches (each column
        # inherits the row — and the row's dual — from its tree parent)
        def flip_cond(s):
            j0_, _, _ = s
            return j0_ != n

        def flip_body(s):
            j0_, p_, u_ = s
            j1 = way[j0_]
            p_ = p_.at[j0_].set(p_[j1])
            u_ = u_.at[j0_].set(u_[j1])
            return j1, p_, u_

        _, p, u = jax.lax.while_loop(flip_cond, flip_body, (j0, p, u))
        return u, v, p

    u0 = jnp.zeros((n + 1,), jnp.float32)
    # NOTE: classic JV column-reduction duals are deliberately NOT used:
    # they are only valid for perfect matchings.  This solver stops after
    # ``num_rows`` augmentations (a partial matching proportional to the
    # actual detection count), where a free column's nonzero potential would
    # make reduced-shortest paths diverge from true-shortest ones and yield
    # non-optimal partial assignments (observed: wrong gating-test matches).
    v0 = jnp.zeros((n + 1,), jnp.float32)
    p0 = jnp.full((n + 1,), -1, jnp.int32)
    _, _, p = jax.lax.fori_loop(0, jnp.minimum(num_rows, n), solve_row,
                                (u0, v0, p0))
    return p[:n]


def solve_lsa_host(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host-convenience wrapper returning (row_ind, col_ind) like scipy."""
    n, m = cost.shape
    size = max(n, m)
    pad = np.full((size, size), 1e6, dtype=np.float32)
    pad[:n, :m] = cost
    row_of_col = np.asarray(solve_lsa(jnp.asarray(pad)))
    rows, cols = [], []
    for j in range(m):
        i = int(row_of_col[j])
        if i < n:
            rows.append(i)
            cols.append(j)
    order = np.argsort(rows)
    return np.asarray(rows)[order], np.asarray(cols)[order]
