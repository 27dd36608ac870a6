#!/usr/bin/env bash
# Run bench_scaling ladder rounds only in quiet windows (low host load).
# The sandbox shows multi-minute co-tenant contention episodes that swing
# identical Spark runs 2-7x; per-config bests persist via --reuse, so each
# quiet-window round can only improve the recorded numbers.
#
# Usage: scripts/scale_quiet_hunter.sh [max_rounds] [load_threshold]
set -u
cd "$(dirname "$0")/.."
MAX_ROUNDS=${1:-6}
LOAD_MAX=${2:-4.0}
for i in $(seq 1 "$MAX_ROUNDS"); do
  # wait for a quiet window: 1-min load below threshold, twice in a row
  quiet=0
  for _ in $(seq 1 240); do  # give up waiting after ~2h per round
    l1=$(awk '{print $1}' /proc/loadavg)
    if awk -v l="$l1" -v m="$LOAD_MAX" 'BEGIN{exit !(l<m)}'; then
      quiet=$((quiet + 1))
      [ "$quiet" -ge 2 ] && break
    else
      quiet=0
    fi
    sleep 30
  done
  if [ "$quiet" -lt 2 ]; then
    # no quiet window within the wait budget: skip rather than burn a
    # long run whose numbers are guaranteed contended
    echo "[hunter] round $i SKIPPED: no quiet window (load $(cat /proc/loadavg | cut -d' ' -f1-3))" >&2
    continue
  fi
  echo "[hunter] round $i starting (load $(cat /proc/loadavg | cut -d' ' -f1-3))" >&2
  python scripts/bench_scaling.py --sf 1.0 --rounds 1 --trials 2 --reuse \
    --pair 2 8 --pair 8 32 >> /tmp/scale_hunter.log 2>&1
  echo "[hunter] round $i done" >&2
done
