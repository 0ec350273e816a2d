"""Experiment summary charts: bar comparisons, parameter-space bubble chart
and a results table rendered as PNG.

Capability parity with PointCloudWorkF/run_experiments.py:321-463.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List

import numpy as np

from .plotting import HAS_MATPLOTLIB

if HAS_MATPLOTLIB:
    import matplotlib.pyplot as plt

__all__ = ["generate_summary_charts"]


def generate_summary_charts(results: List[Dict], output_dir: Path) -> None:
    if not HAS_MATPLOTLIB or not results:
        return
    output_dir = Path(output_dir)
    names = [r["name"].replace("_", "\n") for r in results]
    x = np.arange(len(names))

    # 1. three-panel bar comparison
    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    panels = [
        ("noise_pct", "Noise Removed (%)", "Noise Reduction by Parameter Set",
         "#e74c3c", "{:.1f}%"),
        ("num_clusters", "Number of Clusters",
         "Clusters Detected by Parameter Set", "#9b59b6", "{}"),
        ("signal_points", "Signal Points Retained",
         "Signal Points by Parameter Set", "#2ecc71", "{:,}"),
    ]
    for ax, (key, ylabel, title, color, fmt) in zip(axes, panels):
        vals = [r[key] for r in results]
        bars = ax.bar(x, vals, color=color, edgecolor="black")
        ax.set_xlabel("Experiment")
        ax.set_ylabel(ylabel)
        ax.set_title(title)
        ax.set_xticks(x)
        ax.set_xticklabels(names, fontsize=9)
        for bar, val in zip(bars, vals):
            ax.text(bar.get_x() + bar.get_width() / 2,
                    bar.get_height() + 0.01 * max(max(vals), 1),
                    fmt.format(val), ha="center", va="bottom", fontsize=9)
    plt.tight_layout()
    plt.savefig(output_dir / "experiment_comparison.png", dpi=200)
    plt.close()

    # 2. parameter-space bubble chart
    if len(results) > 1:
        fig, ax = plt.subplots(figsize=(10, 8))
        eps = [r["eps_space"] for r in results]
        ms = [r["min_samples"] for r in results]
        noise = [r["noise_pct"] for r in results]
        clusters = [r["num_clusters"] for r in results]
        sc = ax.scatter(eps, ms, s=[c * 50 + 100 for c in clusters], c=noise,
                        cmap="RdYlGn_r", edgecolors="black", linewidth=1.5,
                        alpha=0.7)
        for i, r in enumerate(results):
            ax.annotate(r["name"], (eps[i], ms[i]), xytext=(5, 5),
                        textcoords="offset points", fontsize=9)
        ax.set_xlabel("Spatial Radius (eps_space)")
        ax.set_ylabel("Min Samples")
        ax.set_title("Parameter Space Exploration\n"
                     "(bubble size = clusters, color = noise %)")
        plt.colorbar(sc, ax=ax, label="Noise Removed (%)")
        ax.grid(True, alpha=0.3)
        plt.tight_layout()
        plt.savefig(output_dir / "parameter_exploration.png", dpi=200)
        plt.close()

    # 3. results table PNG
    fig, ax = plt.subplots(figsize=(12, max(3, len(results) * 0.8 + 2)))
    ax.axis("off")
    headers = ["Experiment", "eps_space", "eps_time", "min_samples",
               "min_frames", "Noise %", "Clusters", "Signal Pts", "Time (s)"]
    cells = [[r["name"], f"{r['eps_space']:.1f}", f"{r['eps_time']:.1f}",
              str(r["min_samples"]), str(r["min_frames"]),
              f"{r['noise_pct']:.1f}%", str(r["num_clusters"]),
              f"{r['signal_points']:,}", f"{r['elapsed_seconds']:.1f}"]
             for r in results]
    table = ax.table(cellText=cells, colLabels=headers, loc="center",
                     cellLoc="center", colColours=["#3498db"] * len(headers))
    table.auto_set_font_size(False)
    table.set_fontsize(10)
    table.scale(1.2, 1.8)
    for i in range(len(headers)):
        table[(0, i)].set_text_props(color="white", fontweight="bold")
    if len(results) > 1:
        bn = max(range(len(results)), key=lambda i: results[i]["noise_pct"])
        bc = max(range(len(results)), key=lambda i: results[i]["num_clusters"])
        table[(bn + 1, 5)].set_facecolor("#c8e6c9")
        table[(bc + 1, 6)].set_facecolor("#c8e6c9")
    ax.set_title("Experiment Results Summary", fontsize=14,
                 fontweight="bold", pad=20)
    plt.tight_layout()
    plt.savefig(output_dir / "results_summary_table.png", dpi=200,
                bbox_inches="tight")
    plt.close()
