#!/usr/bin/env python3
"""Record the COMMITTED CPU-baseline denominators for bench.py.

The live `vs_baseline` ratio re-times the CPU oracle on every bench run on
a shared host, so it wobbles with host load (observed 1.75x spread across
reps at denoise scale) even while the TPU fps moves monotonically.  This
tool pins the denominator: it runs each CPU reference N times, stores the
median plus the full run list and an environment block under
bench_records/<dataset-sig>/, and bench.py then reports
`vs_committed_baseline` (stable) next to `vs_baseline` (live).

Run it on as quiet a host as available; the record keeps every rep so the
spread is auditable.  Usage:

    python tools/record_cpu_baseline.py [tracker|denoise|both] \
        [frames=N] [cpu_frames=N] [reps=N]
"""
import hashlib
import json
import os
import platform
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def _env_block(times):
    return {
        "host_cores": os.cpu_count(),
        "platform": platform.platform(),
        "python": platform.python_version(),
        "times_s": [round(t, 1) for t in times],
        "recorded_unix": int(time.time()),
    }


def _record(path: Path, payload: dict) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(payload, indent=1))
    print(f"wrote {path}")


def main():
    mode = "both"
    num_frames, cpu_frames, reps = 100, None, 5
    for a in sys.argv[1:]:
        if a in ("tracker", "denoise", "both"):
            mode = a
        elif a.startswith("frames="):
            num_frames = int(a.split("=", 1)[1])
        elif a.startswith("cpu_frames="):
            cpu_frames = int(a.split("=", 1)[1])
        elif a.startswith("reps="):
            reps = int(a.split("=", 1)[1])

    data_dir = bench._dataset(num_frames)
    sig = data_dir.name

    if mode in ("tracker", "both"):
        cf = cpu_frames or 40
        times, sha = [], None
        for r in range(reps):
            t, labels, _tracker = bench.run_cpu_reference(data_dir, cf)
            times.append(t)
            h = hashlib.sha256(np.ascontiguousarray(
                labels.astype(np.int32))).hexdigest()
            if sha is not None and sha != h:  # explicit: survives -O
                raise SystemExit("oracle labels varied across reps — "
                                 "unstable oracle, refusing to pin")
            sha = h
        _record(bench.RECORDS_DIR / sig / f"cpu_baseline_f{cf}.json", {
            "pipeline": "tracker",
            "frames": cf,
            "median_seconds": round(float(np.median(times)), 1),
            "labels_sha256": sha,
            "env": _env_block(times),
        })

    if mode in ("denoise", "both"):
        cf = cpu_frames or 6
        times, sha = [], None
        for r in range(reps):
            t, labels = bench.run_cpu_denoise_reference(data_dir, cf)
            times.append(t)
            h = hashlib.sha256(np.ascontiguousarray(
                labels.astype(np.int32))).hexdigest()
            if sha is not None and sha != h:  # explicit: survives -O
                raise SystemExit("oracle labels varied across reps — "
                                 "unstable oracle, refusing to pin")
            sha = h
        _record(bench.RECORDS_DIR / sig
                / f"cpu_denoise_baseline_f{cf}.json", {
            "pipeline": "denoise",
            "frames": cf,
            "median_seconds": round(float(np.median(times)), 1),
            "labels_sha256": sha,
            "env": _env_block(times),
        })


if __name__ == "__main__":
    main()
