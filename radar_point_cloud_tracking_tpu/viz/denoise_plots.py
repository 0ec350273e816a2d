"""Denoising visualizations: before/after, temporal grid, noise stats,
animated comparison GIF with greedy cross-frame cluster tracking.

Capability parity with stdbscan_denoising_pipeline.py:376-760.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Tuple

import numpy as np

from .plotting import HAS_MATPLOTLIB

if HAS_MATPLOTLIB:
    import matplotlib.pyplot as plt
    from matplotlib.patches import Patch

__all__ = [
    "plot_before_after",
    "plot_temporal_clusters",
    "plot_noise_reduction_stats",
    "greedy_track_clusters",
    "create_comparison_gif",
    "render_denoise_outputs",
]

PLOT_MAX_POINTS = 500_000


def _subsample(arrs, max_pts, seed=0):
    n = len(arrs[0])
    if n <= max_pts:
        return arrs
    idx = np.random.default_rng(seed).choice(n, max_pts, replace=False)
    return [a[idx] for a in arrs]


def plot_before_after(output_dir: Path, points: np.ndarray,
                      labels: np.ndarray) -> None:
    """Raw cloud (intensity) vs denoised cloud (cluster colors)."""
    if not HAS_MATPLOTLIB:
        return
    fig, axes = plt.subplots(1, 2, figsize=(14, 6))

    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    rx, ry, rz = _subsample([x, y, z], PLOT_MAX_POINTS)
    sc1 = axes[0].scatter(rx, ry, c=rz, cmap="viridis", s=0.5, alpha=0.5)
    axes[0].set_xlabel("X (meters)")
    axes[0].set_ylabel("Y (meters)")
    axes[0].set_title(f"Raw Point Cloud\n({len(x):,} points)")
    axes[0].set_aspect("equal")
    plt.colorbar(sc1, ax=axes[0], label="Intensity")

    sig = labels >= 0
    dx, dy, dl = _subsample([x[sig], y[sig], labels[sig]], PLOT_MAX_POINTS)
    axes[1].scatter(dx, dy, c=dl, cmap="tab20", s=0.5, alpha=0.5)
    n_clusters = len(np.unique(labels[sig])) if sig.any() else 0
    axes[1].set_xlabel("X (meters)")
    axes[1].set_ylabel("Y (meters)")
    axes[1].set_title(
        f"ST-DBSCAN Denoised\n({int(sig.sum()):,} points, {n_clusters} clusters)")
    axes[1].set_aspect("equal")

    plt.tight_layout()
    plt.savefig(Path(output_dir) / "denoising_comparison.png", dpi=200)
    plt.close()


def plot_temporal_clusters(output_dir: Path, points: np.ndarray,
                           labels: np.ndarray) -> None:
    """Up to 6 sample frames with noise gray + cluster colors."""
    if not HAS_MATPLOTLIB:
        return
    frame_idx = points[:, 3].astype(int)
    unique_frames = np.unique(frame_idx)
    sample = unique_frames[::max(1, len(unique_frames) // 6)][:6]

    fig, axes = plt.subplots(2, 3, figsize=(15, 10))
    axes = axes.flatten()
    for ax_i, fid in enumerate(sample):
        ax = axes[ax_i]
        m = frame_idx == fid
        x, y, fl = points[m, 0], points[m, 1], labels[m]
        if len(x) > 50000:
            x, y, fl = _subsample([x, y, fl], 50000)
        noise = fl == -1
        if noise.any():
            ax.scatter(x[noise], y[noise], c="lightgray", s=0.3, alpha=0.3,
                       label="Noise")
        if (~noise).any():
            ax.scatter(x[~noise], y[~noise], c=fl[~noise], cmap="tab20", s=1,
                       alpha=0.7)
        ax.set_xlabel("X (m)")
        ax.set_ylabel("Y (m)")
        ax.set_title(f"Frame {fid}")
        ax.set_aspect("equal")
    plt.suptitle("ST-DBSCAN Clustering Across Time Frames", fontsize=14)
    plt.tight_layout()
    plt.savefig(Path(output_dir) / "temporal_clusters.png", dpi=200)
    plt.close()


def plot_noise_reduction_stats(output_dir: Path, stats: Dict) -> None:
    """Pie (noise vs signal) + bar (raw/denoised/clusters)."""
    if not HAS_MATPLOTLIB:
        return
    fig, axes = plt.subplots(1, 2, figsize=(12, 5))
    sizes = [stats["noise_points"], stats["signal_points"]]
    lbls = [f"Noise\n({stats['noise_points']:,})",
            f"Signal\n({stats['signal_points']:,})"]
    axes[0].pie(sizes, labels=lbls, colors=["#ff6b6b", "#4ecdc4"],
                autopct="%1.1f%%", startangle=90)
    axes[0].set_title("Point Classification")

    cats = ["Raw Points", "Denoised Points", "Clusters Found"]
    vals = [stats["total_points"], stats["signal_points"],
            stats["num_clusters"]]
    bars = axes[1].bar(cats, vals, color=["#3498db", "#2ecc71", "#9b59b6"])
    axes[1].set_ylabel("Count")
    axes[1].set_title("Denoising Results")
    for bar, val in zip(bars, vals):
        axes[1].text(bar.get_x() + bar.get_width() / 2,
                     bar.get_height() + 0.01 * max(vals), f"{val:,}",
                     ha="center", va="bottom", fontsize=10)
    plt.tight_layout()
    plt.savefig(Path(output_dir) / "noise_reduction_stats.png", dpi=200)
    plt.close()


def greedy_track_clusters(points: np.ndarray, labels: np.ndarray,
                          max_dist: float = 20.0) -> Tuple[Dict, int]:
    """Greedy nearest-centroid cross-frame cluster tracking for consistent
    GIF colors (stdbscan_denoising_pipeline.py:506-569).

    Returns ({(frame_id, local_cluster_id): global_id}, next_global_id).
    """
    frame_idx = points[:, 3].astype(int)
    global_map: Dict = {}
    next_gid = 0
    prev: Dict[int, Tuple[float, float]] = {}

    for fid in np.unique(frame_idx):
        m = frame_idx == fid
        fl = labels[m]
        fx, fy = points[m, 0], points[m, 1]
        centroids = {}
        for cid in np.unique(fl[fl >= 0]):
            cm = fl == cid
            centroids[int(cid)] = (fx[cm].mean(), fy[cm].mean())

        # two passes, like the reference: EVERY cluster first picks its
        # nearest previous centroid (ties to a contested id are allowed),
        # then assignment walks in cluster order — the first claimant keeps
        # the id and later claimants get NEW ids, not their second choice
        # (stdbscan_denoising_pipeline.py:538-566)
        matches = []
        for cid, (cx, cy) in centroids.items():
            best, best_d = None, max_dist
            for gid, (px, py) in prev.items():
                d = np.hypot(cx - px, cy - py)
                if d < best_d:
                    best, best_d = gid, d
            matches.append((cid, best, cx, cy))

        used = set()
        new_prev = {}
        for cid, best, cx, cy in matches:
            if best is None or best in used:
                best = next_gid
                next_gid += 1
            used.add(best)
            global_map[(int(fid), cid)] = best
            new_prev[best] = (cx, cy)
        prev = new_prev
    return global_map, next_gid


def create_comparison_gif(output_dir: Path, points: np.ndarray,
                          labels: np.ndarray, fps: int = 2) -> None:
    """Side-by-side raw vs clustered animation with persistent cluster ids."""
    if not HAS_MATPLOTLIB:
        return
    try:
        from PIL import Image
    except ImportError:  # pragma: no cover
        print("Pillow required for GIF generation")
        return

    frame_idx = points[:, 3].astype(int)
    unique_frames = np.unique(frame_idx)
    if len(unique_frames) > 1:  # skip the (often glitched) first frame
        unique_frames = unique_frames[1:]
    if len(unique_frames) == 0:
        return

    global_map, total_tracked = greedy_track_clusters(points, labels)
    cmap = plt.get_cmap("tab20")
    colors = {i: cmap(i % 20)[:3] for i in range(max(20, total_tracked + 1))}

    x_all, y_all = points[:, 0], points[:, 1]
    pad_x = (x_all.max() - x_all.min()) * 0.1
    pad_y = (y_all.max() - y_all.min()) * 0.1
    xlim = (x_all.min() - pad_x, x_all.max() + pad_x)
    ylim = (y_all.min() - pad_y, y_all.max() + pad_y)

    tmp = Path(output_dir) / "_temp_frames"
    tmp.mkdir(exist_ok=True)
    frame_paths = []
    for i, fid in enumerate(unique_frames):
        m = frame_idx == fid
        x, y, z, fl = points[m, 0], points[m, 1], points[m, 2], labels[m]
        fig, axes = plt.subplots(1, 2, figsize=(18, 7))

        ax1 = axes[0]
        if len(x):
            zn = np.clip(z / z.max() if z.max() > 0 else z, 0, 1)
            sc = ax1.scatter(x, y, c=zn, cmap="viridis", s=1.5, alpha=0.7)
            plt.colorbar(sc, ax=ax1, label="Intensity", shrink=0.7)
        ax1.set_xlim(xlim)
        ax1.set_ylim(ylim)
        ax1.set_title(f"Raw Point Cloud\n{len(x):,} points")
        ax1.set_aspect("equal")
        ax1.grid(True, alpha=0.3)

        ax2 = axes[1]
        noise = fl == -1
        if noise.any():
            ax2.scatter(x[noise], y[noise], c="lightgray", s=1, alpha=0.3)
        legend_items = []
        for cid in np.unique(fl[fl >= 0]):
            cm = fl == cid
            gid = global_map.get((int(fid), int(cid)), int(cid))
            color = colors[gid % len(colors)]
            ax2.scatter(x[cm], y[cm], c=[color], s=2, alpha=0.8)
            cx, cy = x[cm].mean(), y[cm].mean()
            ax2.annotate(f"{gid}", (cx, cy), fontsize=9, fontweight="bold",
                         ha="center", va="center",
                         bbox=dict(boxstyle="circle,pad=0.3", facecolor=color,
                                   edgecolor="black", linewidth=0.5, alpha=0.9),
                         color="white" if sum(color) < 1.5 else "black")
            legend_items.append((gid, color, int(cm.sum())))
        ax2.set_xlim(xlim)
        ax2.set_ylim(ylim)
        ax2.set_title(
            f"ST-DBSCAN Clustered\n{len(np.unique(fl[fl >= 0]))} clusters, "
            f"{int(noise.sum()):,} noise points")
        ax2.set_aspect("equal")
        ax2.grid(True, alpha=0.3)

        legend = [Patch(facecolor="lightgray", edgecolor="gray",
                        label="Noise (filtered)")]
        legend_items.sort(key=lambda t: -t[2])
        for gid, color, count in legend_items[:10]:
            legend.append(Patch(facecolor=color, edgecolor="black",
                                linewidth=0.5,
                                label=f"Cluster {gid} ({count:,} pts)"))
        ax2.legend(handles=legend, loc="center left",
                   bbox_to_anchor=(1.02, 0.5), fontsize=9, title="Legend")

        fig.suptitle(f"Frame {int(fid) + 1} of {len(unique_frames)}",
                     fontsize=14, fontweight="bold", y=0.98)
        plt.tight_layout(rect=[0, 0, 0.88, 0.95])
        fp = tmp / f"frame_{i:04d}.png"
        plt.savefig(fp, dpi=150, facecolor="white")
        plt.close()
        frame_paths.append(fp)

    images = [Image.open(fp) for fp in frame_paths]
    images[0].save(Path(output_dir) / "stdbscan_comparison.gif",
                   save_all=True, append_images=images[1:],
                   duration=int(1000 / fps), loop=0)
    for fp in frame_paths:
        fp.unlink()
    tmp.rmdir()


def render_denoise_outputs(result, output_dir: Path,
                           skip_gif: bool = True) -> None:
    output_dir = Path(output_dir)
    plot_before_after(output_dir, result.points, result.labels)
    plot_temporal_clusters(output_dir, result.points, result.labels)
    plot_noise_reduction_stats(output_dir, result.stats)
    if not skip_gif:
        create_comparison_gif(output_dir, result.points, result.labels)
