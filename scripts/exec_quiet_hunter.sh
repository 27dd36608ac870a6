#!/usr/bin/env bash
# Executor-ladder twin of scale_quiet_hunter.sh: run local-cluster ladder
# rounds only in quiet host windows; per-config bests persist via --reuse
# so each round can only improve the recorded numbers.
#
# Usage: scripts/exec_quiet_hunter.sh [max_rounds] [load_threshold]
set -u
cd "$(dirname "$0")/.."
MAX_ROUNDS=${1:-6}
LOAD_MAX=${2:-3.0}
for i in $(seq 1 "$MAX_ROUNDS"); do
  quiet=0
  for _ in $(seq 1 120); do  # give up waiting after ~1h per round
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
    echo "[exec-hunter] round $i SKIPPED: no quiet window (load $(cut -d' ' -f1-3 /proc/loadavg))" >&2
    continue
  fi
  echo "[exec-hunter] round $i starting (load $(cut -d' ' -f1-3 /proc/loadavg))" >&2
  python scripts/bench_scaling.py --sf 1.0 --rounds 1 --trials 2 --reuse \
    --executors --pair 1 4 --pair 2 8 >> /tmp/exec_hunter.log 2>&1
  echo "[exec-hunter] round $i done" >&2
done
