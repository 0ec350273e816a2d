#!/usr/bin/env python3
"""Measure whether device ingest work actually hides under the host parse.

models/ingest.py claims parse-of-f+1 overlaps device conversion of frame f
via JAX async dispatch.  This decomposes the tracker-flagship ingest stage:

- parse floor:   consume _parsed_stream alone (host threads, no device)
- full ingest:   load_sequence (parse + device convert/pack + transfers)
- serial resid:  full - parse = device work NOT hidden under the parse

If the residual is small vs the known grid/pack device time (~0.2-0.3 s at
bench scale, BENCH_r04 stage timers), the overlap is real and parse is the
ingest floor; if the residual ~equals the device time, dispatch is serial
and overlapping is a free win.  Reference analog: parallel frame loading,
stdbscan_denoising_pipeline.py:234-257.

Usage: python tools/profile_ingest_overlap.py [frames=N] [reps=N]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    frames, reps = 100, 3
    for a in sys.argv[1:]:
        if a.startswith("frames="):
            frames = int(a.split("=", 1)[1])
        elif a.startswith("reps="):
            reps = int(a.split("=", 1)[1])

    import bench
    import jax
    import radar_point_cloud_tracking_tpu as rpt
    from radar_point_cloud_tracking_tpu.config import PipelineConfig
    from radar_point_cloud_tracking_tpu.models.ingest import FrameBatchLoader

    data_dir = bench._dataset(frames)
    cfg = PipelineConfig()
    cfg.radar.num_echo_columns = bench.NUM_BINS

    files_by_gain = rpt.discover_files(data_dir)
    frame_files = rpt.group_files_by_frame(files_by_gain)[:frames]
    print(f"{len(frame_files)} frames, backend={jax.default_backend()}")

    def loader():
        return FrameBatchLoader(cfg, intensity_threshold=bench.THRESHOLD,
                                point_stride=bench.STRIDE, verbose=False,
                                frame_capacity=bench.FRAME_CAP)

    # warm: compile the conversion programs + touch the page cache
    ing = loader().load_sequence(frame_files)
    jax.block_until_ready(ing.xyi)

    parse_times, full_times = [], []
    for rep in range(reps):
        ld = loader()
        t0 = time.perf_counter()
        npts = sum(sum(len(s[1]) for s in parsed)
                   for _, _, parsed in ld._parsed_stream(frame_files))
        parse_times.append(time.perf_counter() - t0)

        ld = loader()
        t0 = time.perf_counter()
        ing = ld.load_sequence(frame_files)
        jax.block_until_ready(ing.xyi)
        full_times.append(time.perf_counter() - t0)
        print(f"rep {rep}: parse-only {parse_times[-1]*1e3:6.0f} ms "
              f"({npts:,} pts) | full ingest {full_times[-1]*1e3:6.0f} ms "
              f"| residual {(full_times[-1]-parse_times[-1])*1e3:6.0f} ms")

    pmin, fmin = min(parse_times), min(full_times)
    print(f"best: parse-only {pmin*1e3:.0f} ms, full {fmin*1e3:.0f} ms, "
          f"residual {(fmin-pmin)*1e3:.0f} ms "
          f"({100*(fmin-pmin)/fmin:.0f}% of full ingest)")

    # decompose the residual: pack+dispatch on PRE-PARSED input (parse
    # excluded) = the work that would have to hide under the parse
    ld = loader()
    cached = list(ld._parsed_stream(frame_files))
    pack_times = []
    for rep in range(reps):
        ld = loader()
        t0 = time.perf_counter()
        ing = ld._pack_stream(iter(cached), len(cached), 32, 10**9)
        jax.block_until_ready(ing.xyi)
        pack_times.append(time.perf_counter() - t0)
    print(f"pack+dispatch on pre-parsed input: "
          f"{[round(t*1e3) for t in pack_times]} ms "
          f"(best {min(pack_times)*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
