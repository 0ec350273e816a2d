#!/bin/bash
# Queued chip work for tunnel window 5+: waits for the device (subprocess
# probe, like bench.py), then runs the denoise-scale pairs-only A/B and a
# confirming tracker bench.  Logs to .chip_logs/.
cd /root/repo
mkdir -p .chip_logs
probe() {
  timeout 90 python -c "import jax; jax.devices()" > /dev/null 2>&1
}
echo "[queue] waiting for device..."
for i in $(seq 1 200); do
  if probe; then echo "[queue] device up after $i probes"; break; fi
  sleep 45
done
if ! probe; then echo "[queue] device never came up"; exit 1; fi
echo "[queue] running denoise pairs-only A/B"
timeout 1500 python -u tools/ab_pairs_only.py denoise \
  > .chip_logs/ab_pairs_only_denoise.log 2>&1
tail -12 .chip_logs/ab_pairs_only_denoise.log
echo "[queue] running tracker bench (artifact-of-record protocol)"
timeout 2400 python -u bench.py > .chip_logs/bench_r3w5.log 2>&1
tail -5 .chip_logs/bench_r3w5.log
echo "[queue] done"
