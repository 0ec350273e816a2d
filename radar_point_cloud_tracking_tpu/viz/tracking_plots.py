"""Tracking visualizations: per-frame object plots + summary figures.

Capability parity with 4_temporal_object_tracker.py:695-829 — two-panel
frame plots (raw points by gain / tracked objects with ID labels and
velocity arrows) and the trajectory + classification summary.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from .plotting import HAS_MATPLOTLIB
from ..config import PipelineConfig
from ..ops.colors import golden_ratio_color

if HAS_MATPLOTLIB:
    import matplotlib.pyplot as plt
    import matplotlib.patches as mpatches

__all__ = ["plot_frame_with_objects", "plot_tracking_summary",
           "render_tracking_outputs"]

_GAIN_PLOT_COLORS = {40: "blue", 50: "green", 70: "orange", 75: "red"}


def plot_frame_with_objects(
    frame_points: np.ndarray,  # (N, 2)
    frame_gains: np.ndarray,  # (N,)
    frame_labels: np.ndarray,  # (N,) cluster labels for this frame's points
    objects: list,  # rows: dict(object_id, object_type, x, y, vel, cluster_id)
    frame_id: int,
    output_path: Path,
) -> None:
    """Two panels: raw by gain / tracked objects with labels + arrows."""
    if not HAS_MATPLOTLIB:
        return
    fig, axes = plt.subplots(1, 2, figsize=(16, 8))

    ax1 = axes[0]
    for gain in np.unique(frame_gains):
        mask = frame_gains == gain
        ax1.scatter(frame_points[mask, 0], frame_points[mask, 1],
                    c=_GAIN_PLOT_COLORS.get(int(gain), "gray"), s=0.5,
                    alpha=0.5, label=f"Gain {int(gain)}")
    ax1.set_xlabel("X (m)")
    ax1.set_ylabel("Y (m)")
    ax1.set_title(f"Frame {frame_id}: Raw Points by Gain")
    ax1.legend(markerscale=10)
    ax1.set_aspect("equal")
    ax1.grid(True, alpha=0.3)

    ax2 = axes[1]
    ax2.scatter(frame_points[:, 0], frame_points[:, 1], c="lightgray", s=0.5,
                alpha=0.3)
    for obj in objects:
        color = np.array(golden_ratio_color(obj["object_id"])) / 255.0
        mask = frame_labels == obj["cluster_id"]
        if mask.any():
            ax2.scatter(frame_points[mask, 0], frame_points[mask, 1],
                        c=[color], s=2, alpha=0.8)
        label = f"{obj['object_type'][0].upper()}{obj['object_id']}"
        ax2.annotate(label, (obj["x"], obj["y"]), fontsize=8, ha="center",
                     va="bottom",
                     bbox=dict(boxstyle="round", facecolor="white", alpha=0.7))
        if obj["object_type"] == "boat" and obj.get("vel") is not None:
            vel = np.asarray(obj["vel"]) * 5
            ax2.arrow(obj["x"], obj["y"], vel[0], vel[1], head_width=3,
                      head_length=2, fc="red", ec="red")
    ax2.set_xlabel("X (m)")
    ax2.set_ylabel("Y (m)")
    ax2.set_title(f"Frame {frame_id}: Tracked Objects")
    ax2.set_aspect("equal")
    ax2.grid(True, alpha=0.3)
    ax2.legend(handles=[
        mpatches.Patch(color="green", label="Buoy (stationary)"),
        mpatches.Patch(color="red", label="Boat (moving)"),
    ])

    plt.tight_layout()
    Path(output_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(output_path, dpi=150)
    plt.close(fig)


def plot_tracking_summary(objects_rows: list, trajectory_rows: list,
                          output_path: Path) -> None:
    """Left: trajectories colored by class; right: classification counts."""
    if not HAS_MATPLOTLIB:
        return
    fig, axes = plt.subplots(1, 2, figsize=(16, 8))

    by_obj = {}
    for row in trajectory_rows:
        by_obj.setdefault(row["object_id"], []).append(row)
    types = {r["object_id"]: r["object_type"] for r in objects_rows}

    ax1 = axes[0]
    for oid, rows in by_obj.items():
        if len(rows) < 2:
            continue
        xs = [r["x"] for r in rows]
        ys = [r["y"] for r in rows]
        otype = types.get(oid, "unknown")
        if otype == "buoy":
            ax1.plot(xs, ys, "go-", markersize=4, alpha=0.7)
            ax1.annotate(f"B{oid}", (xs[-1], ys[-1]), fontsize=8)
        elif otype == "boat":
            ax1.plot(xs, ys, "r-", linewidth=2, alpha=0.7)
            ax1.scatter(xs, ys, c="red", s=10)
            ax1.annotate(f"V{oid}", (xs[-1], ys[-1]), fontsize=8)
        else:
            ax1.plot(xs, ys, "b--", alpha=0.5)
    ax1.set_xlabel("X (m)")
    ax1.set_ylabel("Y (m)")
    ax1.set_title("Object Trajectories")
    ax1.set_aspect("equal")
    ax1.grid(True, alpha=0.3)

    ax2 = axes[1]
    counts = {"Buoys": 0, "Boats": 0, "Unknown": 0}
    for r in objects_rows:
        if r["object_type"] == "buoy":
            counts["Buoys"] += 1
        elif r["object_type"] == "boat":
            counts["Boats"] += 1
        else:
            counts["Unknown"] += 1
    bars = ax2.bar(list(counts), list(counts.values()),
                   color=["green", "red", "blue"], alpha=0.7)
    ax2.set_ylabel("Count")
    ax2.set_title("Object Classification Summary")
    for bar, count in zip(bars, counts.values()):
        ax2.annotate(str(count),
                     xy=(bar.get_x() + bar.get_width() / 2, bar.get_height()),
                     ha="center", va="bottom", fontsize=12)

    plt.tight_layout()
    Path(output_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(output_path, dpi=150)
    plt.close(fig)


def render_tracking_outputs(result, output_dir: Path,
                            config: Optional[PipelineConfig] = None,
                            every_nth: Optional[int] = None) -> None:
    """Sampled per-frame plots + summary for a TrackingResult."""
    if not HAS_MATPLOTLIB:
        return
    output_dir = Path(output_dir)
    viz_dir = output_dir / "visualizations"
    viz_dir.mkdir(parents=True, exist_ok=True)

    pts = result.points  # (N, 6) x y i local fid gain
    f = result.ingested.num_frames
    step = every_nth or max(1, f // 10)
    records = result.records
    obj_rows = {r["object_id"]: r for r in result.objects_rows()}

    for fi in range(0, f, step):
        fid = int(result.ingested.frame_ids[fi])
        mask = pts[:, 3].astype(int) == fi
        frame_pts = pts[mask][:, :2]
        frame_gains = pts[mask][:, 5].astype(int)
        frame_labels = result.labels[mask]

        objects = []
        for slot in range(records["seen"].shape[1]):
            if records["seen"][fi, slot]:
                oid = int(records["object_id"][fi, slot])
                row = obj_rows.get(oid)
                if row is None:
                    continue
                # nearest cluster centroid for point coloring
                cs = result.cluster_stats
                best, best_d = -1, 5.0
                for k in range(cs["valid"].shape[1]):
                    if cs["valid"][fi, k]:
                        d = np.hypot(
                            cs["centroids"][fi, k, 0] - records["pos"][fi, slot, 0],
                            cs["centroids"][fi, k, 1] - records["pos"][fi, slot, 1])
                        if d < best_d:
                            best, best_d = int(cs["label"][fi, k]), d
                vel = None
                if row["object_type"] == "boat" and "vel" in records:
                    vel = records["vel"][fi, slot]
                objects.append({
                    "object_id": oid,
                    "object_type": row["object_type"],
                    "x": float(records["pos"][fi, slot, 0]),
                    "y": float(records["pos"][fi, slot, 1]),
                    "cluster_id": best,
                    "vel": vel,
                })
        plot_frame_with_objects(frame_pts, frame_gains, frame_labels, objects,
                                fid, viz_dir / f"frame_{fid:04d}.png")

    plot_tracking_summary(result.objects_rows(), result.trajectory_rows(),
                          output_dir / "tracking_summary.png")
