#!/usr/bin/env python3
"""End-to-end benchmark: TPU pipeline vs the CPU reference composition.

Measures the headline metric from BASELINE.json — frames/sec for the full
fuse -> cluster -> track pipeline (CSV parse through trajectories.csv) on a
synthetic 100-frame multi-gain sequence — against a CPU baseline that uses
the reference's implementation choices (pandas CSV parsing, sklearn BallTree
radius queries, sequential Python BFS expansion, scipy Hungarian).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}
Extra diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

EPS_SPACE, EPS_TIME, MIN_SAMPLES = 8.0, 2.0, 15
THRESHOLD, STRIDE = 10.0, 4


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _generate(num_frames, tmp):
    from radar_point_cloud_tracking_tpu.experiments.synthetic import (
        SceneConfig, generate_scene_dataset)

    cfg = SceneConfig(num_frames=num_frames, num_rows=1024, num_bins=512,
                      num_boats=3, num_buoys=4, noise_rate=0.002, seed=7)
    t0 = time.perf_counter()
    data_dir = generate_scene_dataset(Path(tmp) / "data", cfg)
    log(f"synthetic dataset ({num_frames} frames x 3 gains, "
        f"{cfg.num_rows}x{cfg.num_bins}) in {time.perf_counter() - t0:.1f}s")
    return data_dir


def run_cpu_reference(data_dir: Path, out_dir: Path):
    """Reference-style CPU pipeline: pandas parse + numpy convert + BallTree
    ST-DBSCAN + scipy Hungarian tracking + trajectories.csv."""
    import pandas as pd

    import radar_point_cloud_tracking_tpu as rpt
    from radar_point_cloud_tracking_tpu.reference_impl.oracle import (
        OracleTracker, oracle_convert_sweep, oracle_st_dbscan,
        oracle_filter_land, oracle_land_mask, oracle_occupancy_grid)

    t0 = time.perf_counter()
    files_by_gain = rpt.discover_files(data_dir)
    frame_files = rpt.group_files_by_frame(files_by_gain)

    frames = []
    for i, ff in enumerate(frame_files):
        xs = []
        for gain in sorted(ff):
            df = pd.read_csv(ff[gain], header=None, skiprows=1, engine="c")
            table = df.fillna(0).to_numpy(np.float32)
            angles = np.deg2rad(table[:, 4] * np.float32(360.0 / 8196.0))
            x, y, z = oracle_convert_sweep(table[:, 5:], angles, table[:, 1],
                                           THRESHOLD, STRIDE)
            if len(x):
                xs.append(np.column_stack([x, y, z]))
        if xs:
            frames.append((i, np.concatenate(xs)))
    t_load = time.perf_counter() - t0

    # land filter
    t1 = time.perf_counter()
    if len(frames) > 10:
        count, isum, edges = oracle_occupancy_grid(
            [p[:, :2] for _, p in frames], [p[:, 2] for _, p in frames], 5.0)
        land = oracle_land_mask(count, isum, len(frames), 0.8, 100.0)
        frames = [(fid, pts[oracle_filter_land(pts[:, :2], land, edges)])
                  for fid, pts in frames]
    t_land = time.perf_counter() - t1

    t2 = time.perf_counter()
    coords = np.concatenate([p[:, :2] for _, p in frames])
    times = np.concatenate([np.full(len(p), fid, np.float32)
                            for fid, p in frames])
    labels = oracle_st_dbscan(coords, times, EPS_SPACE, EPS_TIME, MIN_SAMPLES)
    t_cluster = time.perf_counter() - t2

    t3 = time.perf_counter()
    tracker = OracleTracker()
    offset = 0
    for fid, pts in frames:
        n = len(pts)
        fl = labels[offset:offset + n]
        cents = [pts[fl == lbl, :2].mean(axis=0)
                 for lbl in sorted(set(fl[fl >= 0]))]
        tracker.update(np.asarray(cents).reshape(-1, 2), fid)
        offset += n
    out_dir.mkdir(parents=True, exist_ok=True)
    pd.DataFrame(tracker.trajectories()).to_csv(
        out_dir / "trajectories.csv", index=False)
    t_track = time.perf_counter() - t3

    total = time.perf_counter() - t0
    log(f"CPU reference: load={t_load:.1f}s land={t_land:.1f}s "
        f"cluster={t_cluster:.1f}s track={t_track:.1f}s total={total:.1f}s "
        f"({len(coords):,} pts, {len(np.unique(labels[labels >= 0]))} clusters)")
    return total, labels, tracker


def run_tpu_pipeline(data_dir: Path, out_dir: Path):
    from radar_point_cloud_tracking_tpu.config import PipelineConfig
    from radar_point_cloud_tracking_tpu.models.tracker import (
        run_tracking_pipeline)

    cfg = PipelineConfig()
    cfg.radar.num_echo_columns = 512

    # warmup: compile on a tiny prefix so the measured run is steady-state
    t0 = time.perf_counter()
    run_tracking_pipeline(data_dir, Path(out_dir) / "warmup", max_frames=12,
                          eps_space=EPS_SPACE, eps_time=EPS_TIME,
                          min_samples=MIN_SAMPLES,
                          intensity_threshold=THRESHOLD, point_stride=STRIDE,
                          config=cfg, verbose=False, visualize=False)
    log(f"TPU warmup (compile) {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    result = run_tracking_pipeline(
        data_dir, out_dir, eps_space=EPS_SPACE, eps_time=EPS_TIME,
        min_samples=MIN_SAMPLES, intensity_threshold=THRESHOLD,
        point_stride=STRIDE, config=cfg, verbose=False, visualize=False)
    total = time.perf_counter() - t0
    log(f"TPU pipeline total={total:.1f}s stages={result.timings} "
        f"({result.n_points:,} pts, {result.num_clusters} clusters)")
    return total, result


def main():
    num_frames = int(os.environ.get("BENCH_FRAMES", "100"))

    # pay the tunnel's once-per-process device<->host handshake up front so
    # it doesn't pollute stage measurements
    import jax.numpy as jnp

    t0 = time.perf_counter()
    np.asarray(jnp.ones(8))
    log(f"device handshake {time.perf_counter() - t0:.1f}s")

    with tempfile.TemporaryDirectory() as tmp:
        data_dir = _generate(num_frames, tmp)

        tpu_time, result = run_tpu_pipeline(data_dir, Path(tmp) / "tpu_out")
        cpu_time, cpu_labels, cpu_tracker = run_cpu_reference(
            data_dir, Path(tmp) / "cpu_out")

        # correctness: exact-match labels + tracks between TPU and CPU ref
        match = bool(np.array_equal(result.labels, cpu_labels))
        want = sorted(cpu_tracker.summary(), key=lambda r: r["object_id"])
        got = result.objects_rows()
        tracks_match = (
            len(got) == len(want)
            and all(g["object_id"] == w["object_id"]
                    and g["object_type"] == w["object_type"]
                    for g, w in zip(got, want)))
        log(f"exact-match: labels={match} tracks={tracks_match} "
            f"(objects: {len(got)})")

        tpu_fps = num_frames / tpu_time
        cpu_fps = num_frames / cpu_time
        print(json.dumps({
            "metric": "radar frames/sec end-to-end (fuse+cluster+track), "
                      f"{num_frames}-frame multi-gain sequence; "
                      f"exact_match={match and tracks_match}",
            "value": round(tpu_fps, 3),
            "unit": "frames/s",
            "vs_baseline": round(tpu_fps / cpu_fps, 2),
        }))


if __name__ == "__main__":
    main()
