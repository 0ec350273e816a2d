"""Greedy GIF cluster tracker + comparison-GIF writer
(viz/denoise_plots.py), previously the only untested visualization path.

greedy_track_clusters must reproduce the reference's two-pass semantics
(stdbscan_denoising_pipeline.py:506-569): every cluster first picks its
nearest previous-frame centroid, then assignment walks in cluster order —
the first claimant of a contested id keeps it and later claimants get NEW
ids (not their second-best match).
"""

from pathlib import Path

import numpy as np
import pytest

from radar_point_cloud_tracking_tpu.viz.denoise_plots import (
    HAS_MATPLOTLIB,
    create_comparison_gif,
    greedy_track_clusters,
)


def _pts(rows):
    """rows of (x, y, frame) -> (N, 4) [x, y, intensity, frame]."""
    a = np.asarray(rows, np.float64)
    out = np.zeros((len(a), 4))
    out[:, :2] = a[:, :2]
    out[:, 2] = 100.0
    out[:, 3] = a[:, 2]
    return out


def test_greedy_persistent_id_across_frames():
    """A blob drifting < max_dist per frame keeps one global id."""
    pts = _pts([(0, 0, 0), (1, 0, 0),
                (5, 0, 1), (6, 0, 1),
                (10, 0, 2), (11, 0, 2)])
    labels = np.array([0, 0, 0, 0, 0, 0])
    gmap, n = greedy_track_clusters(pts, labels)
    assert n == 1
    assert gmap == {(0, 0): 0, (1, 0): 0, (2, 0): 0}


def test_greedy_new_cluster_and_gate():
    """A second far-away cluster gets a new id; a jump past max_dist breaks
    the track (new id)."""
    pts = _pts([(0, 0, 0),
                (0, 0, 1), (100, 0, 1),
                (100, 30, 2)])  # 30 m > max_dist=20 from (100, 0)
    labels = np.array([0, 0, 1, 0])
    gmap, n = greedy_track_clusters(pts, labels)
    assert gmap[(0, 0)] == 0
    assert gmap[(1, 0)] == 0  # continued
    assert gmap[(1, 1)] == 1  # new far cluster
    assert gmap[(2, 0)] == 2  # gate broken -> new id
    assert n == 3


def test_greedy_contested_id_goes_to_first_claimant():
    """Reference corner: two clusters both nearest to the SAME previous id —
    the first (ascending local id) keeps it, the second gets a NEW id even
    though another previous id was in range."""
    # frame 0: gid0 at (0,0), gid1 at (10,0)
    # frame 1: cluster0 at (1,0) and cluster1 at (2,0) — both nearest gid0;
    #          cluster1's second-best (gid1, d=8 < 20) must NOT be taken
    pts = _pts([(0, 0, 0), (10, 0, 0),
                (1, 0, 1), (2, 0, 1)])
    labels = np.array([0, 1, 0, 1])
    gmap, n = greedy_track_clusters(pts, labels)
    assert gmap[(0, 0)] == 0 and gmap[(0, 1)] == 1
    assert gmap[(1, 0)] == 0  # first claimant keeps the contested id
    assert gmap[(1, 1)] == 2  # NEW id, not second-best gid1
    assert n == 3


def test_greedy_noise_ignored():
    pts = _pts([(0, 0, 0), (50, 50, 0), (1, 0, 1)])
    labels = np.array([0, -1, 0])
    gmap, n = greedy_track_clusters(pts, labels)
    assert (0, -1) not in gmap and n == 1


@pytest.mark.skipif(not HAS_MATPLOTLIB, reason="matplotlib unavailable")
def test_create_comparison_gif_smoke(tmp_path):
    """A real multi-frame GIF lands on disk; temp frames are cleaned up;
    the first frame is skipped (reference parity)."""
    rng = np.random.default_rng(5)
    rows = []
    labels = []
    for f in range(4):
        for i in range(30):
            rows.append((f * 2 + rng.normal(0, 0.5),
                         rng.normal(0, 0.5), f))
            labels.append(0)
        for i in range(10):  # noise
            rows.append((rng.uniform(-20, 20), rng.uniform(-20, 20), f))
            labels.append(-1)
    pts = _pts(rows)
    create_comparison_gif(tmp_path, pts, np.asarray(labels), fps=4)

    gif = tmp_path / "stdbscan_comparison.gif"
    assert gif.exists() and gif.stat().st_size > 0
    assert not (tmp_path / "_temp_frames").exists()

    from PIL import Image

    with Image.open(gif) as im:
        assert im.is_animated
        assert im.n_frames == 3  # 4 frames minus the skipped first
