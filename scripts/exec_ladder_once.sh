#!/usr/bin/env bash
# One executor-mode ladder round (2 vs 8 executors x 4 cores, sf1.0),
# started only after the host quiets down. Bests persist via --reuse.
set -u
cd "$(dirname "$0")/.."
LOAD_MAX=${1:-4.0}
quiet=0
for _ in $(seq 1 360); do
  l1=$(awk '{print $1}' /proc/loadavg)
  if awk -v l="$l1" -v m="$LOAD_MAX" 'BEGIN{exit !(l<m)}'; then
    quiet=$((quiet + 1)); [ "$quiet" -ge 2 ] && break
  else
    quiet=0
  fi
  sleep 30
done
echo "[exec-ladder] starting (load $(cut -d' ' -f1-3 /proc/loadavg))" >&2
# 1 vs 4 executors x 2 cores: the literal N-vs-4N-executors criterion in
# the region where cores still add usable memory bandwidth on this box
python scripts/bench_scaling.py --sf 1.0 --rounds 1 --trials 2 --reuse \
  --executors --exec-cores 2 --exec-mem-mb 7168 --pair 1 4
# 2 vs 8 executors x 4 cores: the saturated top rung, for transparency
python scripts/bench_scaling.py --sf 1.0 --rounds 1 --trials 2 --reuse \
  --executors --exec-cores 4 --exec-mem-mb 7168 --pair 2 8
