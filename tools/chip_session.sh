#!/bin/bash
# Chip-measurement queue for the next tunnel window (run from repo root).
# Each step is its own process (fresh handshake) and logs to .chip_logs/;
# failures don't stop the queue.  Order: cheap validations first, the
# bench records last (they benefit from every engine decision above).
set -u
mkdir -p .chip_logs
run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 3600 "$@" > ".chip_logs/$name.log" 2>&1
  rc=$?
  echo "--- $name rc=$rc; tail:"
  tail -25 ".chip_logs/$name.log"
}

# 1. engine matrix: old-jump vs slot-jump vs symmetric, kernel standalones,
#    index build cost with/without pairs (asserts label equality on chip)
run ab_engines python tools/ab_engines.py 4

# 1b. denoise-scale engine A/B (min_frames sym stats + sym sweeps)
run ab_denoise env AB_DENOISE=1 python tools/ab_engines.py

# 2. scatter/segment primitive costs (gates the min_frames symmetric stats)
run microbench_scatter python tools/microbench_scatter.py

# 4. records: tracker flagship, denoising flagship, 10M envelope
run bench python bench.py
run bench_denoise env BENCH_DENOISE=1 python bench.py
run bench_envelope env BENCH_ENVELOPE=1 python bench.py
echo "=== chip session complete; logs in .chip_logs/ ==="
