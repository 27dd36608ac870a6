#!/usr/bin/env python
"""Interleaved A/B: shuffle-codec zstd level 1 (Spark default) vs 3 at
local[8] and local[32], sf1.0, fresh JVM per run via spark-submit.

The 8->32 scaling gap is memory-bandwidth-bound (BENCH/BASELINE.md);
a higher zstd level trades the 32-core config's surplus CPU for fewer
bytes over the shared bus, so if the wall is really bytes, level 3
should lift 32-core throughput more than 8-core. Bests persist to
``.bench/zstd-level-ab.json`` across invocations (the host has
multi-minute co-tenant contention episodes — best-of-N over
interleaved rounds converges on uncontended throughput). Level-1
runs double as fresh samples for the main scaling bests.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from bench_scaling import submit_one  # noqa: E402

SF = 1.0
STATE = os.path.join(REPO, ".bench", "zstd-level-ab.json")
CONFS = {
    "zstd1": "",
    "zstd3": "spark.io.compression.zstd.level=3",
}


def load_state() -> dict:
    if os.path.exists(STATE):
        with open(STATE) as f:
            return json.load(f)
    return {}


def save_state(best: dict) -> None:
    with open(STATE, "w") as f:
        json.dump(best, f, indent=2)


def maybe_update_main_best(cpus: int, r: dict) -> None:
    """A level-1 run is a valid sample for the main scaling bests."""
    p = os.path.join(REPO, ".bench", f"scale-best-{cpus}-sf{SF}.json")
    cur = None
    if os.path.exists(p):
        with open(p) as f:
            cur = json.load(f)
    if cur is None or r["cdc_events_per_sec"] > cur["cdc_events_per_sec"]:
        with open(p, "w") as f:
            json.dump(r, f)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    best = load_state()
    for rnd in range(rounds):
        for tag, conf in CONFS.items():
            os.environ["SPARK_GRAFT_SUBMIT_CONF"] = conf
            for cpus in (8, 32):
                key = f"{tag}-{cpus}"
                try:
                    r = submit_one(cpus, SF, 4, trials=2)
                except Exception as e:  # contention can kill a JVM; keep going
                    print(f"[ab] {key} round {rnd} failed: {e}", file=sys.stderr)
                    continue
                if tag == "zstd1":
                    maybe_update_main_best(cpus, r)
                if key not in best or r["cdc_events_per_sec"] > best[key]["cdc_events_per_sec"]:
                    best[key] = r
                    save_state(best)
                print(
                    f"[ab] round {rnd} {key}: {r['cdc_events_per_sec']:,.0f} ev/s "
                    f"(best {best[key]['cdc_events_per_sec']:,.0f})",
                    file=sys.stderr,
                )
    eff = {}
    for tag in CONFS:
        lo, hi = best.get(f"{tag}-8"), best.get(f"{tag}-32")
        if lo and hi:
            eff[tag] = round(
                hi["cdc_events_per_sec"] / lo["cdc_events_per_sec"] / 4, 3
            )
    print(json.dumps({"best": {k: v["cdc_events_per_sec"] for k, v in best.items()}, "efficiency_8_32": eff}))


if __name__ == "__main__":
    main()
