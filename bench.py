#!/usr/bin/env python3
"""End-to-end benchmark: TPU pipeline vs the CPU reference composition.

Measures the headline metric from BASELINE.json — frames/sec for the full
fuse -> cluster -> track pipeline (CSV parse through tracking results) on a
synthetic multi-gain sequence — against a CPU baseline using the reference's
implementation choices (pandas CSV parsing, sklearn BallTree radius queries,
sequential Python BFS expansion, scipy Hungarian).

Protocol:
- the dataset (default 100 frames x 3 gains, 2048x1024 sweeps) is generated
  once and cached under .bench_data/;
- the TPU pipeline runs twice with identical shapes; the second (steady
  state, all programs cached) is measured;
- the CPU reference is measured on a BENCH_CPU_FRAMES prefix (default 40)
  and extrapolated linearly to the full length — every reference stage
  scales at least linearly in frames, so this favors the CPU baseline;
- the CPU prefix is run BENCH_CPU_REPEATS times (default 3) and the MEDIAN
  total is the denominator (the shared host swings run-to-run);
- the TPU full sequence is likewise measured BENCH_TPU_REPEATS times
  (default 3) after one warmup, and the MEDIAN is the numerator — the
  recorded ratio is a median-vs-median protocol on both sides;
- the denominator composition is validated against the LITERAL reference
  tracker script (/root/reference/PointCloudWork/4_temporal_object_tracker.py,
  same defaults: threshold 10, stride 4, eps 8/2/15) run once per dataset as
  a subprocess; its wall time is cached beside the dataset and logged next
  to the oracle's on every run;
- exact-match of cluster labels and track identities is verified on the
  CPU-measured prefix.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N,
   "vs_committed_baseline": N}
vs_baseline re-times the CPU oracle live (median of repeats, still hostage
to shared-host load); vs_committed_baseline divides by the PINNED
median-of-N denominator recorded by tools/record_cpu_baseline.py, so it
moves only when the TPU numerator does.  Diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

EPS_SPACE, EPS_TIME, MIN_SAMPLES = 8.0, 2.0, 15
THRESHOLD, STRIDE = 10.0, 4
NUM_ROWS = int(os.environ.get("BENCH_ROWS", "2048"))
NUM_BINS = int(os.environ.get("BENCH_BINS", "1024"))
NOISE_RATE = float(os.environ.get("BENCH_NOISE", "0.008"))
DEFAULT_FRAME_CAP = 131072
FRAME_CAP = int(os.environ.get("BENCH_FRAME_CAP", str(DEFAULT_FRAME_CAP)))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _wait_for_device():
    """The axon tunnel has transient outages (handshake 12-500s normally,
    occasionally UNAVAILABLE for stretches) — the round-end bench artifact
    must not die to one.  Probe ``jax.devices()`` in a SUBPROCESS (jax
    caches a failed backend init for the life of a process, so the probe
    must not be this process) until it succeeds or the wait budget runs
    out, then let the caller handshake in-process."""
    import subprocess

    budget = float(os.environ.get("BENCH_DEVICE_WAIT_S", "1800"))
    if budget <= 0:
        return
    deadline = time.monotonic() + budget
    probe = "import jax; jax.devices(); print(jax.default_backend())"
    attempt = 0
    while True:
        attempt += 1
        t0 = time.perf_counter()
        try:
            # 900s per attempt: degraded-but-live handshakes have measured
            # up to ~520s; anything past 900 is a dead tunnel for now
            proc = subprocess.run([sys.executable, "-c", probe],
                                  capture_output=True, text=True,
                                  timeout=900)
            if proc.returncode == 0:
                backend = (proc.stdout.strip().splitlines() or ["?"])[-1]
                log(f"device probe ok (attempt {attempt}, "
                    f"{time.perf_counter() - t0:.0f}s, backend {backend})")
                return
            tail = (proc.stderr.strip().splitlines() or ["?"])[-1]
            log(f"device probe failed (attempt {attempt}, "
                f"{time.perf_counter() - t0:.0f}s): {tail[-200:]}")
        except subprocess.TimeoutExpired:
            log(f"device probe timed out after 900s (attempt {attempt})")
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            log("device wait budget exhausted; proceeding (the in-process "
                "handshake will raise if the backend is still down)")
            return
        time.sleep(min(120.0, max(10.0, remaining)))


def _handshake():
    """In-process device handshake with outage recovery: try directly (no
    extra cost on a healthy tunnel); on failure, wait out the outage with
    subprocess probes and RE-EXEC the bench in a child — jax caches a
    failed backend init for the process lifetime, so this process can
    never retry itself."""
    t0 = time.perf_counter()
    try:
        import jax.numpy as jnp

        np.asarray(jnp.ones(8))
    except Exception as e:
        log(f"device init failed ({type(e).__name__}: {e})")
        if os.environ.get("_BENCH_REEXEC") == "1":
            raise  # the child already waited once; give up loudly
        import subprocess

        _wait_for_device()
        env = dict(os.environ)
        env["_BENCH_REEXEC"] = "1"
        # rebuild from __file__ (argv is unusable under `python -c`); the
        # bench mode rides entirely on env vars
        rc = subprocess.call(
            [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
            env=env)
        sys.exit(rc)
    log(f"device handshake {time.perf_counter() - t0:.1f}s")


# committed (in-repo) bench records, keyed by dataset signature: the
# full-sequence oracle labels/track record and the literal-reference wall
# time survive a fresh clone, so the exactness assert never silently skips
RECORDS_DIR = Path(__file__).resolve().parent / "bench_records"


def _dataset_sig(num_frames: int) -> str:
    sig = f"f{num_frames}_r{NUM_ROWS}_b{NUM_BINS}_v4"
    if NOISE_RATE != 0.008:  # keep the default dataset cache key stable
        sig += f"_n{NOISE_RATE:g}"
    return sig


def _record_path(sig: str, name: str, data_dir: Path) -> Path | None:
    """A committed bench_records/<sig>/<name> wins; fall back to the record
    cached beside the (gitignored) dataset."""
    committed = RECORDS_DIR / sig / name
    if committed.exists():
        return committed
    local = data_dir / name
    return local if local.exists() else None


def _dataset(num_frames: int) -> Path:
    from radar_point_cloud_tracking_tpu.experiments.synthetic import (
        SceneConfig, generate_scene_dataset)

    sig = _dataset_sig(num_frames)
    data_dir = Path(__file__).resolve().parent / ".bench_data" / sig
    if (data_dir / "gain_75").is_dir():
        log(f"dataset cache hit: {data_dir}")
        return data_dir
    cfg = SceneConfig(num_frames=num_frames, num_rows=NUM_ROWS,
                      num_bins=NUM_BINS, num_boats=4, num_buoys=5,
                      noise_rate=NOISE_RATE, seed=7)
    t0 = time.perf_counter()
    generate_scene_dataset(data_dir, cfg)
    log(f"synthetic dataset ({num_frames} frames x 3 gains, "
        f"{NUM_ROWS}x{NUM_BINS}) in {time.perf_counter() - t0:.1f}s")
    return data_dir


def _cpu_parse_frames(data_dir: Path, max_frames: int):
    """The reference parse recipe (pandas read_csv + fillna + the
    4_temporal_object_tracker.py:184-232 conversion), shared by BOTH CPU
    denominators so a parse fix cannot skew one benchmark and not the other.
    Runs INSIDE the callers' timed regions.  Returns [(frame_idx, (n, 3)
    x/y/z array)] with empty frames skipped but original indices kept."""
    import pandas as pd

    import radar_point_cloud_tracking_tpu as rpt
    from radar_point_cloud_tracking_tpu.reference_impl.oracle import (
        oracle_convert_sweep)

    files_by_gain = rpt.discover_files(data_dir)
    frame_files = rpt.group_files_by_frame(files_by_gain)[:max_frames]
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
    return frames


def run_cpu_reference(data_dir: Path, max_frames: int):
    """Reference-style CPU pipeline (pandas + BallTree + BFS + scipy)."""
    from radar_point_cloud_tracking_tpu.reference_impl.oracle import (
        OracleTracker, oracle_st_dbscan,
        oracle_filter_land, oracle_land_mask, oracle_occupancy_grid)

    t0 = time.perf_counter()
    frames = _cpu_parse_frames(data_dir, max_frames)
    t_load = time.perf_counter() - t0

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
    t_track = time.perf_counter() - t3

    total = time.perf_counter() - t0
    log(f"CPU reference [{max_frames} frames]: load={t_load:.1f}s "
        f"land={t_land:.1f}s cluster={t_cluster:.1f}s track={t_track:.1f}s "
        f"total={total:.1f}s ({len(coords):,} pts, "
        f"{len(np.unique(labels[labels >= 0]))} clusters)")
    return total, labels, tracker


def validate_reference_denominator(data_dir: Path, max_frames: int):
    """Time the LITERAL reference tracker once per dataset (cached).

    bench.py's denominator is reference_impl/oracle.py — a re-derived
    composition of the reference's implementation choices.  To validate that
    the oracle is a fair (not inflated) stand-in, run the actual reference
    script on the same data with identical parameters and record its wall
    time next to the oracle's.  Subprocess, --no-viz, land filter on.
    """
    import subprocess
    import tempfile

    ref_script = Path("/root/reference/PointCloudWork/"
                      "4_temporal_object_tracker.py")
    name = f"refcheck_f{max_frames}.json"
    cache = _record_path(data_dir.name, name, data_dir)
    if cache is not None:
        rec = json.loads(cache.read_text())
        log(f"literal reference (cached, {cache.parent.name}): "
            f"{rec['elapsed_s']:.1f}s for {rec['frames']} frames")
        return rec["elapsed_s"]
    if not ref_script.exists() or os.environ.get("BENCH_SKIP_REFCHECK"):
        log("literal reference check skipped (script missing or disabled)")
        return None
    log(f"timing the literal reference script on {max_frames} frames "
        "(once per dataset)...")
    try:
        with tempfile.TemporaryDirectory() as tmp:
            t0 = time.perf_counter()
            proc = subprocess.run(
                [sys.executable, str(ref_script), "--data-dir", str(data_dir),
                 "--output-dir", tmp, "--max-frames", str(max_frames),
                 "--no-viz"],
                capture_output=True, text=True, timeout=3600)
            elapsed = time.perf_counter() - t0
    except subprocess.TimeoutExpired:
        log("literal reference run timed out after 3600s; check skipped")
        return None
    if proc.returncode != 0:
        log(f"literal reference run FAILED (rc={proc.returncode}): "
            f"{proc.stderr[-500:]}")
        return None
    (data_dir / name).write_text(json.dumps({"elapsed_s": elapsed,
                                             "frames": max_frames}))
    log(f"literal reference: {elapsed:.1f}s for {max_frames} frames")
    return elapsed


def run_tpu(data_dir: Path, max_frames: int, label: str):
    from radar_point_cloud_tracking_tpu.config import PipelineConfig
    from radar_point_cloud_tracking_tpu.models.ingest import FrameBatchLoader
    from radar_point_cloud_tracking_tpu.models.tracker import TrackingPipeline
    import radar_point_cloud_tracking_tpu as rpt

    cfg = PipelineConfig()
    cfg.radar.num_echo_columns = NUM_BINS
    # the scene's sea clutter produces hundreds of concurrent short-lived
    # tracks (CPU reference is unbounded); capacities must exceed the real
    # maxima for exact-match — the Hungarian cost scales with actual counts
    cfg.tracking.max_objects = 512
    cfg.tracking.max_clusters_per_frame = 256

    files_by_gain = rpt.discover_files(data_dir)
    frame_files = rpt.group_files_by_frame(files_by_gain)[:max_frames]

    loader = FrameBatchLoader(cfg, intensity_threshold=THRESHOLD,
                              point_stride=STRIDE, verbose=False,
                              frame_capacity=FRAME_CAP)
    pipe = TrackingPipeline(cfg, verbose=False)
    t0 = time.perf_counter()
    result = pipe.ingest_and_run(frame_files, loader, eps_space=EPS_SPACE,
                                 eps_time=EPS_TIME, min_samples=MIN_SAMPLES)
    total = time.perf_counter() - t0
    log(f"TPU [{label}, {max_frames} frames]: total={total:.1f}s "
        f"stages={ {k: round(v, 2) for k, v in result.timings.items()} } "
        f"({result.n_points:,} pts, {result.num_clusters} clusters)")
    return total, result


def _measure_tpu_median(run_fn, repeats: int):
    """Measured reps with the element-median protocol shared by every mode.

    Returns (median_time, all_times, last_result).  Only the LAST rep's
    result is retained — each result pins padded device buffers (hundreds of
    MB at bench scale) and labels/stats are deterministic across reps, so
    holding every rep alive would only add allocator pressure to the very
    runs being timed.  The median is the middle ELEMENT (upper-middle for
    even counts), not an average, so the recorded time is a real run."""
    times = []
    result = None
    for r in range(repeats):
        t, result = run_fn(f"measured {r + 1}/{repeats}")
        times.append(t)
    order = int(np.argsort(times, kind="stable")[len(times) // 2])
    return times[order], times, result


def _committed_baseline_ratio(data_dir: Path, name: str, cpu_frames: int,
                              tpu_fps: float,
                              cpu_labels=None) -> float | None:
    """Speedup against the PINNED denominator (tools/record_cpu_baseline.py).

    The live `vs_baseline` re-times the CPU oracle under whatever load the
    shared host carries that day (observed 1.75x spread across reps), so the
    headline ratio wobbled across rounds while fps rose monotonically.  The
    committed record fixes the denominator to a median-of-N quiet-host run
    with its environment block stored beside it; this ratio only moves when
    the NUMERATOR does."""
    rec_path = _record_path(data_dir.name, name, data_dir)
    if rec_path is None:
        log(f"no committed CPU baseline {name}; run "
            "tools/record_cpu_baseline.py to pin the denominator")
        return None
    rec = json.loads(rec_path.read_text())
    if rec["frames"] != cpu_frames:
        log(f"committed baseline {name} covers {rec['frames']} frames, "
            f"bench measured {cpu_frames}; skipped")
        return None
    # staleness guard: the record stores the oracle labels' sha precisely so
    # a drifted oracle/scene (same dataset sig, different labeling — hence
    # different timing) cannot silently keep the obsolete denominator
    if cpu_labels is not None and "labels_sha256" in rec:
        import hashlib

        got = hashlib.sha256(np.ascontiguousarray(
            np.asarray(cpu_labels).astype(np.int32))).hexdigest()
        if got != rec["labels_sha256"]:
            log(f"committed baseline {name} is STALE (oracle labels sha "
                f"{got[:12]}… != recorded {rec['labels_sha256'][:12]}…); "
                "re-pin with tools/record_cpu_baseline.py")
            return None
    ratio = round(tpu_fps / (cpu_frames / rec["median_seconds"]), 2)
    log(f"vs committed baseline ({name}: {rec['median_seconds']}s "
        f"median of {len(rec['env']['times_s'])}): {ratio}x")
    return ratio


def _regression_record(rec_path: Path, payload: dict, check_keys) -> bool | None:
    """Compare `payload` against a committed record, or write the first one.

    Returns the comparison verdict, or None when a new record was written
    (the log tells the operator to commit it)."""
    if rec_path.exists():
        rec = json.loads(rec_path.read_text())
        ok = all(rec.get(k) == payload[k] for k in check_keys)
        log(f"labels match committed record {rec_path.name}: {ok} "
            f"({rec.get('num_clusters')} recorded clusters)")
        return ok
    rec_path.parent.mkdir(parents=True, exist_ok=True)
    rec_path.write_text(json.dumps(payload))
    log(f"wrote new regression record {rec_path} (commit it)")
    return None


DEN_MIN_FRAMES = 2  # denoiser temporal-persistence default
# (stdbscan_denoising_pipeline.py:68-77: thr 10, stride 4, min_frames 2)


def run_cpu_denoise_reference(data_dir: Path, max_frames: int):
    """Reference-style CPU denoising pipeline: pandas parse -> flat concat
    with the frame-INDEX time axis (no land filter) -> BallTree ST-DBSCAN
    with the min_frames persistence core test and the denoiser's
    scan-order border semantics (stdbscan_denoising_pipeline.py:862-1013)."""
    from radar_point_cloud_tracking_tpu.reference_impl.oracle import (
        oracle_st_dbscan)

    t0 = time.perf_counter()
    frames = _cpu_parse_frames(data_dir, max_frames)
    t_load = time.perf_counter() - t0

    t1 = time.perf_counter()
    if frames:
        coords = np.concatenate([p[:, :2] for _, p in frames])
        times = np.concatenate([np.full(len(p), i, np.float32)
                                for i, p in frames])
    else:
        coords = np.empty((0, 2), np.float32)
        times = np.empty((0,), np.float32)
    labels = oracle_st_dbscan(coords, times, EPS_SPACE, EPS_TIME,
                              MIN_SAMPLES, min_frames=DEN_MIN_FRAMES,
                              border_mode="if_earlier")
    t_cluster = time.perf_counter() - t1

    total = time.perf_counter() - t0
    noise = int(np.sum(labels < 0))
    log(f"CPU denoise reference [{max_frames} frames]: load={t_load:.1f}s "
        f"cluster={t_cluster:.1f}s total={total:.1f}s "
        f"({len(coords):,} pts, "
        f"{len(np.unique(labels[labels >= 0]))} clusters, "
        f"{100.0 * noise / max(len(coords), 1):.1f}% noise)")
    return total, labels


def run_tpu_denoise(data_dir: Path, max_frames: int, label: str):
    from radar_point_cloud_tracking_tpu.config import PipelineConfig
    from radar_point_cloud_tracking_tpu.models.denoiser import denoise_frames
    from radar_point_cloud_tracking_tpu.models.ingest import FrameBatchLoader
    import radar_point_cloud_tracking_tpu as rpt

    cfg = PipelineConfig()
    cfg.radar.num_echo_columns = NUM_BINS

    files_by_gain = rpt.discover_files(data_dir)
    frame_files = rpt.group_files_by_frame(files_by_gain)[:max_frames]
    loader = FrameBatchLoader(cfg, intensity_threshold=THRESHOLD,
                              point_stride=STRIDE, verbose=False,
                              frame_capacity=FRAME_CAP)
    t0 = time.perf_counter()
    ingested = loader.load_sequence(frame_files)
    result = denoise_frames(ingested, EPS_SPACE, EPS_TIME, MIN_SAMPLES,
                            DEN_MIN_FRAMES, cfg, verbose=False)
    # the denoiser's deliverable IS the per-point labeling and the CPU
    # denominator ends with labels in host memory, so the numerator pays the
    # same d2h before the timer stops (~38 MB at bench scale through this
    # rig's ~17 MB/s tunnel).  Coordinates already passed through host memory
    # during the parse, so labels are the only asymmetric pull.
    _ = result.labels
    total = time.perf_counter() - t0
    log(f"TPU denoise [{label}, {max_frames} frames]: total={total:.1f}s "
        f"stages={ {k: round(v, 2) for k, v in result.timings.items()} } "
        f"({result.n_points:,} pts, {result.num_clusters} clusters, "
        f"{result.stats['noise_reduction_pct']:.1f}% noise)")
    return total, result


def run_denoise_bench():
    """BENCH_DENOISE=1 mode: the denoising flagship
    (stdbscan_denoising_pipeline.py) as a recorded artifact — same
    median-vs-median protocol as the tracker headline.

    Exactness protocol: without the land filter the reference BFS is
    SUPERLINEAR in frames (land cells stay occupied in every frame, so
    spatial neighbor lists grow with the sequence): the measured 6-frame
    oracle run takes ~450 s and 100 frames extrapolate to ~35 HOURS, so a
    full-sequence oracle record is infeasible here.  Instead (a) the
    CPU-measured prefix (default 6 frames, 568k points) is asserted
    bit-exact against the oracle, and (b) the full-sequence device
    labeling is regression-checked against a committed record (the
    envelope pattern, run_envelope)."""
    import hashlib

    import jax
    import jax.numpy as jnp

    num_frames = int(os.environ.get("BENCH_FRAMES", "100"))
    cpu_frames = min(int(os.environ.get("BENCH_CPU_FRAMES", "6")),
                     num_frames)
    cpu_repeats = max(1, int(os.environ.get("BENCH_CPU_REPEATS", "3")))
    tpu_repeats = max(1, int(os.environ.get("BENCH_TPU_REPEATS", "3")))

    _handshake()
    data_dir = _dataset(num_frames)

    _, prefix_result = run_tpu_denoise(data_dir, cpu_frames, "prefix")
    cpu_times = []
    for _ in range(cpu_repeats):
        t, cpu_labels = run_cpu_denoise_reference(data_dir, cpu_frames)
        cpu_times.append(t)
    cpu_time = float(np.median(cpu_times))
    log(f"CPU denoise median of {cpu_repeats}: {cpu_time:.1f}s "
        f"(runs: {[round(t, 1) for t in cpu_times]})")
    match = bool(np.array_equal(prefix_result.labels, cpu_labels))
    log(f"exact-match on {cpu_frames}-frame prefix: labels={match} "
        f"({prefix_result.num_clusters} clusters)")

    run_tpu_denoise(data_dir, num_frames, "warmup")
    tpu_time, tpu_times, full_result = _measure_tpu_median(
        lambda lbl: run_tpu_denoise(data_dir, num_frames, lbl), tpu_repeats)
    log(f"TPU denoise median of {tpu_repeats}: {tpu_time:.2f}s "
        f"(runs: {[round(t, 2) for t in tpu_times]})")

    # full-sequence regression record (device labels; validity rests on the
    # oracle-exact prefix above + the engine equivalence suite).  A
    # nonstandard frame cap legitimately changes the labeling, so the record
    # is only checked/written at the default cap.
    rec_match = None
    if FRAME_CAP != DEFAULT_FRAME_CAP:
        log("nonstandard BENCH_FRAME_CAP: regression record skipped")
    else:
        got_hash = hashlib.sha256(np.ascontiguousarray(
            full_result.labels.astype(np.int32))).hexdigest()
        rec_match = _regression_record(
            RECORDS_DIR / _dataset_sig(num_frames)
            / f"denoise_f{num_frames}_regression.json",
            {"labels_sha256": got_hash,
             "num_points": int(full_result.n_points),
             "num_clusters": int(full_result.num_clusters),
             "noise_points": int(full_result.stats["noise_points"])},
            ("labels_sha256", "num_clusters", "noise_points"))

    tpu_fps = num_frames / tpu_time
    cpu_fps = cpu_frames / cpu_time
    out = {
        "metric": "denoising pipeline frames/sec end-to-end "
                  f"(ST-DBSCAN min_frames={DEN_MIN_FRAMES}), "
                  f"{num_frames}-frame multi-gain {NUM_ROWS}x{NUM_BINS} "
                  f"sequence; exact_match={match}",
        "value": round(tpu_fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(tpu_fps / cpu_fps, 2),
        "noise_reduction_pct": round(
            full_result.stats["noise_reduction_pct"], 2),
        "env": {
            "host_cores": os.cpu_count(),
            "backend": jax.default_backend(),
            "tpu_times_s": [round(t, 2) for t in tpu_times],
            "cpu_times_s": [round(t, 1) for t in cpu_times],
        },
    }
    # same conditional-omit schema as the tracker mode: the key appears only
    # when a committed denominator exists (never as null)
    committed = _committed_baseline_ratio(
        data_dir, f"cpu_denoise_baseline_f{cpu_frames}.json", cpu_frames,
        tpu_fps, cpu_labels=cpu_labels)
    if committed is not None:
        out["vs_committed_baseline"] = committed
    if rec_match is not None:
        out["labels_match_committed_record"] = rec_match
    print(json.dumps(out))


def _envelope_ply(path: Path, n_points: int = 10_000_000,
                  seed: int = 11) -> Path:
    """Deterministic 10M-point clustering scene at the reference's documented
    scale ceiling (radar-pipeline/config/default.yaml:20-31): 4000 Gaussian
    blobs + uniform clutter over a 20x20 km area, colored with the 3 gain
    tints so color->time inference exercises the real cluster path."""
    from radar_point_cloud_tracking_tpu.core.containers import PointCloud
    from radar_point_cloud_tracking_tpu.core.writers import write_ply

    if path.exists():
        log(f"envelope PLY cache hit: {path}")
        return path
    rng = np.random.default_rng(seed)
    n_blobs = 4000
    per_blob = (n_points // 2) // n_blobs
    centers = rng.uniform(-10_000, 10_000, (n_blobs, 2)).astype(np.float32)
    blob_xy = (np.repeat(centers, per_blob, axis=0)
               + rng.normal(0.0, 1.5, (n_blobs * per_blob, 2))
               ).astype(np.float32)
    n_clutter = n_points - len(blob_xy)
    clutter = rng.uniform(-10_000, 10_000, (n_clutter, 2)).astype(np.float32)
    xy = np.concatenate([blob_xy, clutter])
    z = rng.uniform(0.0, 50.0, (len(xy),)).astype(np.float32)
    perm = rng.permutation(len(xy))
    xy, z = xy[perm], z[perm]
    from radar_point_cloud_tracking_tpu.config import GainConfig

    gcfg = GainConfig()
    gain_tints = np.array([gcfg.colors[g] for g in sorted(gcfg.colors)],
                          np.uint8)
    colors = gain_tints[rng.integers(0, 3, len(xy))]
    path.parent.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()
    write_ply(path, PointCloud(x=xy[:, 0], y=xy[:, 1], z=z, colors=colors),
              use_binary=True)
    log(f"envelope PLY ({len(xy):,} pts) written in "
        f"{time.perf_counter() - t0:.1f}s")
    return path


def run_envelope():
    """BENCH_ENVELOPE=1 mode: the 10M-point clustering envelope as a
    repeatable artifact — steady-state wall time, an exactness spot-check
    (device vs CPU oracle on a deterministic subsample), and a committed
    labels-hash regression record."""
    import hashlib

    import jax.numpy as jnp

    from radar_point_cloud_tracking_tpu.config import ClusteringConfig
    from radar_point_cloud_tracking_tpu.core.loaders import load_ply
    from radar_point_cloud_tracking_tpu.models.cluster_ply import (
        cluster_point_cloud)
    from radar_point_cloud_tracking_tpu.ops.colors import (
        infer_time_from_colors)
    from radar_point_cloud_tracking_tpu.reference_impl.oracle import (
        oracle_st_dbscan)

    _handshake()

    base = Path(__file__).resolve().parent / ".bench_data" / "ply10m"
    ply = _envelope_ply(base / "envelope_10m_v2.ply")
    t0 = time.perf_counter()
    cloud = load_ply(ply)
    log(f"loaded {cloud.size:,} points in {time.perf_counter() - t0:.1f}s")

    cfg = ClusteringConfig(eps_space=5.0, eps_time=1.0, min_samples=10,
                           max_points=10_000_000)
    times_ms = []
    labels = None
    for rep in range(2):  # rep 0 compiles; rep 1 is steady state
        t0 = time.perf_counter()
        labels = cluster_point_cloud(cloud, cfg)
        times_ms.append(time.perf_counter() - t0)
        log(f"envelope rep{rep}: {times_ms[-1]:.1f}s, "
            f"{len(np.unique(labels[labels >= 0]))} clusters")
    steady = times_ms[-1]
    num_clusters = int(len(np.unique(labels[labels >= 0])))

    # exactness spot-check: a deterministic 300k subsample clustered by both
    # engines must match bit-for-bit (the full 10M oracle run is O(hours))
    sub = np.random.default_rng(3).choice(cloud.size, 300_000, replace=False)
    sub.sort()
    coords = np.column_stack([cloud.x[sub], cloud.y[sub], cloud.z[sub]])
    sub_times = infer_time_from_colors(cloud.colors[sub])
    t0 = time.perf_counter()
    want = oracle_st_dbscan(coords.astype(np.float32),
                            sub_times.astype(np.float32),
                            cfg.eps_space, cfg.eps_time, cfg.min_samples)
    log(f"subsample oracle: {time.perf_counter() - t0:.1f}s")
    from radar_point_cloud_tracking_tpu.ops.stdbscan import st_dbscan
    got = st_dbscan(coords, sub_times, cfg.eps_space, cfg.eps_time,
                    cfg.min_samples, config=cfg)
    sub_match = bool(np.array_equal(got, np.asarray(want)))
    log(f"subsample exact-match (300k pts): {sub_match}")

    # regression record: committed labels hash for the full 10M labeling
    sha = hashlib.sha256(
        np.ascontiguousarray(labels.astype(np.int32))).hexdigest()
    sha_match = _regression_record(
        RECORDS_DIR / "envelope_10m_v2.json",
        {"labels_sha256": sha, "num_clusters": num_clusters,
         "num_points": int(cloud.size)},
        ("labels_sha256", "num_clusters"))

    out = {
        "metric": "10M-point ST-DBSCAN clustering envelope "
                  "(reference scale ceiling), steady-state seconds",
        "value": round(steady, 2),
        "unit": "s",
        "vs_baseline": None,
        "num_clusters": num_clusters,
        "subsample_exact_match": sub_match,
        "compile_rep_s": round(times_ms[0], 2),
    }
    if sha_match is not None:
        out["labels_match_committed_record"] = sha_match
    print(json.dumps(out))


def main():
    num_frames = int(os.environ.get("BENCH_FRAMES", "100"))
    cpu_frames = min(int(os.environ.get("BENCH_CPU_FRAMES", "40")), num_frames)
    cpu_repeats = max(1, int(os.environ.get("BENCH_CPU_REPEATS", "3")))

    import jax
    import jax.numpy as jnp

    _handshake()

    data_dir = _dataset(num_frames)

    # exactness check on the CPU-measured prefix; CPU time = median of repeats
    _, prefix_result = run_tpu(data_dir, cpu_frames, "prefix")
    cpu_times = []
    for rep in range(cpu_repeats):
        t, cpu_labels, cpu_tracker = run_cpu_reference(data_dir, cpu_frames)
        cpu_times.append(t)
    cpu_time = float(np.median(cpu_times))
    log(f"CPU reference median of {cpu_repeats}: {cpu_time:.1f}s "
        f"(runs: {[round(t, 1) for t in cpu_times]})")
    ref_time = validate_reference_denominator(data_dir, cpu_frames)
    if ref_time is not None:
        note = ("the literal script is slower, so the oracle denominator "
                "UNDERSTATES the speedup (conservative)"
                if ref_time > cpu_time else
                "the oracle is slower than the literal script — the "
                "recorded ratio would overstate; investigate")
        log(f"denominator check: oracle {cpu_time:.1f}s vs literal "
            f"reference {ref_time:.1f}s ({ref_time / cpu_time:.2f}x; "
            f"{note})")
    match = bool(np.array_equal(prefix_result.labels, cpu_labels))
    want = sorted(cpu_tracker.summary(), key=lambda r: r["object_id"])
    got = prefix_result.objects_rows()
    tracks_match = (len(got) == len(want)
                    and all(g["object_id"] == w["object_id"]
                            and g["object_type"] == w["object_type"]
                            for g, w in zip(got, want)))
    log(f"exact-match on {cpu_frames}-frame prefix: labels={match} "
        f"tracks={tracks_match} (objects: {len(got)})")

    # steady-state timing on the full sequence: warm once, then measure
    # BENCH_TPU_REPEATS reps and take the median (same protocol as the CPU
    # denominator — a single rep is hostage to host/tunnel noise).  Reps
    # here cost ~3s each, so the default is 5: a median of 5 absorbs two
    # noisy reps where a median of 3 records one (observed: reps
    # 2.88/4.31/4.0 — one clean rep, two tunnel-stalled, median 4.0)
    tpu_repeats = max(1, int(os.environ.get("BENCH_TPU_REPEATS", "5")))
    run_tpu(data_dir, num_frames, "warmup")
    tpu_time, tpu_times, full_result = _measure_tpu_median(
        lambda lbl: run_tpu(data_dir, num_frames, lbl), tpu_repeats)
    log(f"TPU median of {tpu_repeats}: {tpu_time:.2f}s "
        f"(runs: {[round(t, 2) for t in tpu_times]})")

    # full-sequence exactness against the committed oracle record
    # (bench_records/<sig>/oracle_f<N>.json, written by
    # tools/record_oracle_full.py); the labels pull happens after the
    # timers stop
    full_match = None
    oracle_full = _record_path(data_dir.name, f"oracle_f{num_frames}.json",
                               data_dir)
    if FRAME_CAP != DEFAULT_FRAME_CAP:
        # a nonstandard cap truncates per-frame points, so a mismatch against
        # the committed record would be expected, not a regression
        log("nonstandard BENCH_FRAME_CAP: full-sequence oracle check skipped")
        oracle_full = None
    if oracle_full is not None:
        import hashlib
        rec = json.loads(oracle_full.read_text())
        got_hash = hashlib.sha256(
            np.ascontiguousarray(full_result.labels.astype(np.int32))
        ).hexdigest()
        got_objects = [(r["object_id"], r["object_type"])
                       for r in full_result.objects_rows()]
        want_objects = [tuple(o) for o in rec["objects"]]
        full_match = bool(got_hash == rec["labels_sha256"]
                          and got_objects == want_objects)
        log(f"exact-match on FULL {num_frames}-frame sequence: {full_match} "
            f"({rec['num_clusters']} oracle clusters)")
    else:
        log(f"no full-sequence oracle record for {data_dir.name}; run "
            "tools/record_oracle_full.py to create one")

    tpu_fps = num_frames / tpu_time
    cpu_fps = cpu_frames / cpu_time  # linear extrapolation (see module doc)
    out = {
        "metric": "radar frames/sec end-to-end (fuse+cluster+track), "
                  f"{num_frames}-frame multi-gain {NUM_ROWS}x{NUM_BINS} "
                  f"sequence; exact_match={match and tracks_match}",
        "value": round(tpu_fps, 3),
        "unit": "frames/s",
        # denominator: the oracle composition (median of repeats) — the
        # literal reference script measured ~10x slower on the same data,
        # so this ratio is the conservative lower bound
        "vs_baseline": round(tpu_fps / cpu_fps, 2),
    }
    committed = _committed_baseline_ratio(
        data_dir, f"cpu_baseline_f{cpu_frames}.json", cpu_frames, tpu_fps,
        cpu_labels=cpu_labels)
    if committed is not None:
        out["vs_committed_baseline"] = committed
    if ref_time is not None:
        out["vs_literal_reference"] = round(
            tpu_fps / (cpu_frames / ref_time), 2)
    if full_match is not None:
        out["exact_match_full_sequence"] = full_match
    # environment record: the recorded ratio depends on this rig's shape
    # (single host core serializes the CSV parse; the TPU sits behind a
    # ~17 MB/s tunnel) — state it so the number is interpretable off-rig
    timings = full_result.timings
    out["env"] = {
        "host_cores": os.cpu_count(),
        "backend": jax.default_backend(),
        "tpu_times_s": [round(t, 2) for t in tpu_times],
        "cpu_times_s": [round(t, 1) for t in cpu_times],
        "host_parse_share": round(
            timings.get("ingest_parse", 0.0) / tpu_time, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if any(a in ("-h", "--help") for a in sys.argv[1:]):
        # modes ride on env vars, not flags — without this guard a stray
        # `bench.py --help` silently runs the FULL tracker bench and holds
        # the single-client TPU tunnel for ~20 minutes
        print("usage: [BENCH_DENOISE=1 | BENCH_ENVELOPE=1] python bench.py\n"
              "  (no flags; modes and knobs are env vars: BENCH_FRAMES, "
              "BENCH_CPU_FRAMES,\n   BENCH_CPU_REPEATS, BENCH_TPU_REPEATS "
              "— see module docstring)")
        sys.exit(0)
    if os.environ.get("BENCH_ENVELOPE"):
        run_envelope()
    elif os.environ.get("BENCH_DENOISE"):
        run_denoise_bench()
    else:
        main()
