#!/usr/bin/env python3
"""Time the native CSV parse alone over the cached bench dataset.

No JAX import (no device handshake): measures the pure host parse floor.
Set RADAR_NATIVE_READBUF=1 to A/B the read()-buffer input path.

Usage: python tools/profile_parse.py [reps]
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from radar_point_cloud_tracking_tpu import native

    base = Path(__file__).resolve().parent.parent / ".bench_data"
    data_dir = base / "f100_r2048_b1024_v4"
    files = sorted(data_dir.glob("gain_*/*.csv"))
    total_bytes = sum(f.stat().st_size for f in files)
    print(f"{len(files)} files, {total_bytes / 1e9:.2f} GB, "
          f"readbuf={os.environ.get('RADAR_NATIVE_READBUF', '0')}")

    for rep in range(reps):
        t0 = time.perf_counter()
        npts = 0
        for f in files:
            rows_a, bins_a, vals_a, ang, sc, gain, u8 = \
                native.parse_radar_points(f, 1024, 10.0, 4, 4096, 1 << 20)
            npts += len(rows_a)
        dt = time.perf_counter() - t0
        print(f"rep{rep}: {dt:.2f}s  {total_bytes / dt / 1e9:.2f} GB/s  "
              f"{npts:,} pts")


if __name__ == "__main__":
    main()
