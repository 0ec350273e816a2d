"""Experiment harness: parameter sweeps over the denoising pipeline with
timing capture, JSON results, LaTeX report and summary charts.

Capability parity with PointCloudWorkF/run_experiments.py:112-532.  Unlike
the reference (which shells out to the pipeline script per run), experiments
run in-process by default so device programs stay compiled across runs; a
``subprocess_mode`` flag reproduces the isolated-run behaviour with a
timeout.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from dataclasses import dataclass
from datetime import datetime
from pathlib import Path
from typing import Dict, List, Optional

from ..config import PipelineConfig

__all__ = ["ExperimentSpec", "DEFAULT_EXPERIMENTS", "run_experiment",
           "run_experiments", "generate_latex_report"]


@dataclass
class ExperimentSpec:
    name: str
    eps_space: float = 8.0
    eps_time: float = 2.0
    min_samples: int = 15
    min_frames: int = 2
    description: str = ""


DEFAULT_EXPERIMENTS: List[ExperimentSpec] = [
    ExperimentSpec("default", 8.0, 2.0, 15, 2, "Default parameters"),
    ExperimentSpec("tight_spatial", 5.0, 2.0, 15, 2,
                   "Tighter spatial radius (5m)"),
    ExperimentSpec("aggressive", 5.0, 1.5, 25, 3, "Aggressive filtering"),
]


def run_experiment(
    spec: ExperimentSpec,
    data_dir: Path,
    output_root: Path,
    max_frames: int = 10,
    config: Optional[PipelineConfig] = None,
    subprocess_mode: bool = False,
    timeout_s: int = 600,
    verbose: bool = True,
) -> Dict:
    """Run one parameter set; returns the stats row (reference
    run_experiments.py:112-198)."""
    out_name = (f"results_{spec.name}_epsS{spec.eps_space}_epsT{spec.eps_time}"
                f"_minS{spec.min_samples}_minF{spec.min_frames}")
    out_dir = Path(output_root) / out_name

    row = {
        "name": spec.name,
        "description": spec.description,
        "eps_space": spec.eps_space,
        "eps_time": spec.eps_time,
        "min_samples": spec.min_samples,
        "min_frames": spec.min_frames,
        "output_dir": str(out_dir),
        "total_points": 0, "noise_points": 0, "signal_points": 0,
        "num_clusters": 0, "noise_pct": 0.0,
    }

    start = time.time()
    if subprocess_mode:
        cmd = [sys.executable, "-m", "radar_point_cloud_tracking_tpu.cli.main"]
        if config is not None:
            # the child re-reads the config from disk (its own process
            # can't see this one's PipelineConfig object)
            cfg_path = Path(output_root) / f"{out_name}_config.yaml"
            cfg_path.parent.mkdir(parents=True, exist_ok=True)
            config.to_yaml(cfg_path)
            cmd += ["-c", str(cfg_path)]
        cmd += ["denoise", "--data-dir", str(data_dir),
                "--output-dir", str(out_dir),
                "--eps-space", str(spec.eps_space),
                "--eps-time", str(spec.eps_time),
                "--min-samples", str(spec.min_samples),
                "--min-frames", str(spec.min_frames),
                "--max-frames", str(max_frames),
                "--skip-gif"]
        try:
            subprocess.run(cmd, timeout=timeout_s, check=False,
                           capture_output=not verbose)
        except subprocess.TimeoutExpired:
            row["timeout"] = True
        # read back stats like the reference does
        stats_file = out_dir / "denoising_stats.csv"
        if stats_file.exists():
            import pandas as pd

            df = pd.read_csv(stats_file)
            if len(df):
                r = df.iloc[0]
                row.update(total_points=int(r["total_points"]),
                           noise_points=int(r["noise_points"]),
                           signal_points=int(r["signal_points"]),
                           num_clusters=int(r["num_clusters"]),
                           noise_pct=float(r["noise_reduction_pct"]))
    else:
        from ..models.denoiser import run_denoising_pipeline

        result = run_denoising_pipeline(
            data_dir, out_dir, eps_space=spec.eps_space,
            eps_time=spec.eps_time, min_samples=spec.min_samples,
            min_frames=spec.min_frames, max_frames=max_frames,
            no_viz=False, skip_gif=True, config=config, verbose=verbose)
        st = result.stats
        row.update(total_points=int(st["total_points"]),
                   noise_points=int(st["noise_points"]),
                   signal_points=int(st["signal_points"]),
                   num_clusters=int(st["num_clusters"]),
                   noise_pct=float(st["noise_reduction_pct"]))
    row["elapsed_seconds"] = time.time() - start
    return row


def run_experiments(
    data_dir: Path,
    output_root: Path,
    experiments: Optional[List[ExperimentSpec]] = None,
    max_frames: int = 10,
    config: Optional[PipelineConfig] = None,
    verbose: bool = True,
) -> List[Dict]:
    """Run the sweep; saves intermediate JSON after every experiment and the
    LaTeX + chart summary at the end."""
    if experiments is None:
        experiments = DEFAULT_EXPERIMENTS
    output_root = Path(output_root)
    output_root.mkdir(parents=True, exist_ok=True)
    results: List[Dict] = []
    for i, spec in enumerate(experiments):
        if verbose:
            print(f"\n=== experiment {i + 1}/{len(experiments)}: {spec.name} ===")
        row = run_experiment(spec, data_dir, output_root, max_frames, config,
                             verbose=verbose)
        results.append(row)
        with (output_root / "experiment_results.json").open("w") as fh:
            json.dump(results, fh, indent=2)

    generate_latex_report(results,
                          output_root / "stdbscan_comparison_report.tex")
    try:
        from ..viz.experiment_plots import generate_summary_charts

        generate_summary_charts(results, output_root)
    except Exception as exc:  # noqa: BLE001 - charts are best-effort
        print(f"chart generation failed: {exc}", file=sys.stderr)
    return results


def _tex_escape(s: str) -> str:
    return s.replace("_", r"\_")


def generate_latex_report(results: List[Dict], output_path: Path) -> None:
    """Parameter-comparison report (reference run_experiments.py:201-318)."""
    date = datetime.now().strftime("%B %d, %Y")
    lines = [
        r"\documentclass[11pt]{article}",
        r"\usepackage[margin=1in]{geometry}",
        r"\usepackage{booktabs}",
        r"\usepackage{longtable}",
        r"\title{ST-DBSCAN Radar Point Cloud Denoising\\"
        r"Parameter Comparison Report (TPU pipeline)}",
        r"\author{Generated by radar\_point\_cloud\_tracking\_tpu}",
        rf"\date{{{date}}}",
        r"\begin{document}",
        r"\maketitle",
        r"\section{Experiment Results}",
        r"\begin{table}[h]",
        r"\centering",
        r"\begin{tabular}{lrrrr}",
        r"\toprule",
        r"\textbf{Experiment} & \textbf{Noise \%} & \textbf{Clusters} & "
        r"\textbf{Signal Pts} & \textbf{Time (s)} \\",
        r"\midrule",
    ]
    for r in results:
        lines.append(
            f"{_tex_escape(r['name'])} & {r['noise_pct']:.1f}\\% & "
            f"{r['num_clusters']} & {r['signal_points']:,} & "
            f"{r['elapsed_seconds']:.1f} \\\\")
    lines += [
        r"\bottomrule",
        r"\end{tabular}",
        r"\end{table}",
        r"\section{Parameter Settings}",
        r"\begin{longtable}{lrrrrl}",
        r"\toprule",
        r"\textbf{Name} & eps\_space & eps\_time & min\_samples & "
        r"min\_frames & Description \\",
        r"\midrule",
    ]
    for r in results:
        lines.append(
            f"{_tex_escape(r['name'])} & {r['eps_space']} & {r['eps_time']} & "
            f"{r['min_samples']} & {r['min_frames']} & "
            f"{_tex_escape(r['description'])} \\\\")
    lines += [r"\bottomrule", r"\end{longtable}"]

    if results:
        best = max(results, key=lambda r: r["noise_pct"])
        fastest = min(results, key=lambda r: r["elapsed_seconds"])
        lines += [
            r"\section{Analysis}",
            f"Highest noise reduction: \\textbf{{{_tex_escape(best['name'])}}} "
            f"({best['noise_pct']:.1f}\\%). "
            f"Fastest run: \\textbf{{{_tex_escape(fastest['name'])}}} "
            f"({fastest['elapsed_seconds']:.1f}s).",
        ]
    lines.append(r"\end{document}")
    Path(output_path).write_text("\n".join(lines))
