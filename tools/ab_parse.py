#!/usr/bin/env python3
"""Paired A/B of two _radar_native.so builds on the cached bench dataset.

This host's run-to-run mood swings (same binary: 0.93s..1.45s observed)
exceed most real parser effects, so single-binary timing is useless for
deciding a change: load BOTH libraries into one process and alternate
A,B,A,B,... full-dataset passes.  Reports per-library medians and verifies
the two parses are bit-identical on every file.

Usage: python tools/ab_parse.py OLD.so NEW.so [pairs=4]
"""
import ctypes
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bind(path):
    lib = ctypes.CDLL(str(path))
    lib.parse_radar_points.restype = ctypes.c_int
    lib.parse_radar_points.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int),
    ]
    return lib


def run_pass(lib, files, threshold=10.0, stride=4, num_echo=1024,
             max_rows=4096, max_pts=1 << 20, collect=False):
    pt_row = np.empty(max_pts, np.uint16)
    pt_bin = np.empty(max_pts, np.uint16)
    pt_val = np.empty(max_pts, np.float32)
    row_angle = np.zeros(max_rows, np.float32)
    row_scale = np.zeros(max_rows, np.float32)
    rows_out = ctypes.c_int(0)
    gain_out = ctypes.c_float(0)
    u8_ok = ctypes.c_int(0)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    f32p = ctypes.POINTER(ctypes.c_float)
    total = 0
    outs = []
    t0 = time.perf_counter()
    for f in files:
        n = lib.parse_radar_points(
            str(f).encode(), num_echo, threshold, stride,
            pt_row.ctypes.data_as(u16p), pt_bin.ctypes.data_as(u16p),
            pt_val.ctypes.data_as(f32p), row_angle.ctypes.data_as(f32p),
            row_scale.ctypes.data_as(f32p), max_rows, max_pts,
            ctypes.byref(rows_out), ctypes.byref(gain_out),
            ctypes.byref(u8_ok))
        assert n >= 0, f
        total += n
        if collect:
            outs.append((pt_row[:n].copy(), pt_bin[:n].copy(),
                         pt_val[:n].copy(), row_angle[:rows_out.value].copy(),
                         row_scale[:rows_out.value].copy(), gain_out.value,
                         u8_ok.value))
    return time.perf_counter() - t0, total, outs


def main():
    old_so, new_so = sys.argv[1], sys.argv[2]
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    base = Path(__file__).resolve().parent.parent / ".bench_data"
    files = sorted((base / "f100_r2048_b1024_v4").glob("gain_*/*.csv"))
    total_bytes = sum(f.stat().st_size for f in files)
    print(f"{len(files)} files, {total_bytes / 1e9:.2f} GB, {pairs} pairs")

    a, b = bind(old_so), bind(new_so)

    # bit-exactness first, on a prefix (full compare is memory-heavy)
    _, na, outs_a = run_pass(a, files[:30], collect=True)
    _, nb, outs_b = run_pass(b, files[:30], collect=True)
    assert na == nb, (na, nb)
    for fa, fb in zip(outs_a, outs_b):
        for va, vb in zip(fa, fb):
            assert np.array_equal(va, vb), "A/B outputs differ"
    print(f"bit-exact on 30-file prefix ({na:,} pts)")

    run_pass(a, files)  # warm the page cache once
    ta, tb = [], []
    for p in range(pairs):
        dt_a, n_a, _ = run_pass(a, files)
        dt_b, n_b, _ = run_pass(b, files)
        assert n_a == n_b
        ta.append(dt_a)
        tb.append(dt_b)
        print(f"pair {p}: A={dt_a:.3f}s  B={dt_b:.3f}s")
    ma, mb = np.median(ta), np.median(tb)
    print(f"A median {ma:.3f}s ({total_bytes / ma / 1e9:.2f} GB/s)   "
          f"B median {mb:.3f}s ({total_bytes / mb / 1e9:.2f} GB/s)   "
          f"B/A = {mb / ma:.3f}")


if __name__ == "__main__":
    main()
