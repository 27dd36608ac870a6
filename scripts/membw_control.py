#!/usr/bin/env python
"""Memory-bandwidth + pure-CPU controls at the executor-ladder core
counts — the decomposition instrument for the one below-target rung.

The executor ladder (BENCH/BASELINE-executors.md) measures the CDC
replay at 1x4 vs 4x4 local-cluster executors (4 -> 16 cores) at
efficiency ~0.75, below the north rule's 0.8. Two hypotheses:

  (a) the ENGINE stops scaling (a serialized stage, lock, or skew
      appears at 16 concurrent tasks), or
  (b) the BOX stops scaling: 16 memory-heavy workers on one socket
      share one memory bus, so aggregate bandwidth — the resource the
      replay demonstrably saturates (BENCH/BASELINE-executors.md:
      uncompressed-WAL and zstd-codec experiments) — sublinearly
      scales no matter what the code does.

This control separates them with two workloads that bracket the replay:

  * ``cpu``  — tight ALU loop over an L1-resident buffer; zero bus
    pressure. If THIS scales ~1.0 from 4 -> 16 procs, the box has the
    cores and the scheduler is not the problem.
  * ``triad`` — STREAM-triad a[:] = b + s*c over arrays far beyond L3;
    pure bus pressure, no compute to hide behind. Its 4 -> 16
    efficiency IS the box's bandwidth scaling ceiling for
    memory-bound work.

A replay whose 4->16 efficiency lands between the two controls — and at
or above triad — is scaling as well as the memory system allows; the
residual vs 1.0 is machine topology, not plan structure. Each worker is
a separate OS process (like an executor JVM); workers run
barrier-started for a fixed wall window and report bytes moved.

Usage:
    python scripts/membw_control.py                  # P in {1,4,16}, both modes
    python scripts/membw_control.py --procs 4 16 --secs 8
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time

import numpy as np

# triad working set per process: 3 x 24M doubles = 576 MB, ~30x this
# box's L3 slice — every element is a bus transaction
TRIAD_N = 24_000_000
# cpu-mode buffer: 4k int64 = 32 KB, L1-resident
CPU_N = 4_096


def _worker(mode: str, secs: float, ready_q, start_evt, out_q) -> None:
    if mode == "triad":
        b = np.ones(TRIAD_N)
        c = np.ones(TRIAD_N)
        a = np.zeros(TRIAD_N)
        # bytes touched per pass: read b, read c, write a (+RFO read of a
        # on most x86 unless NT stores are used — count the conservative
        # 3 streams so the efficiency RATIO, which is what we use, is
        # exact even if the absolute GB/s is a lower bound)
        bytes_per_pass = 3 * 8 * TRIAD_N
        ready_q.put(1)  # allocation done — sound barrier, not a sleep
        start_evt.wait()
        t0 = time.perf_counter()
        passes = 0
        while time.perf_counter() - t0 < secs:
            np.multiply(c, 3.0, out=a)
            np.add(a, b, out=a)
            passes += 1
        dt = time.perf_counter() - t0
        out_q.put(("triad", passes * bytes_per_pass, dt))
    else:
        acc = np.arange(CPU_N, dtype=np.uint64)
        mix = np.uint64(0x9E3779B97F4A7C15)
        sh = np.uint64(13)
        ready_q.put(1)
        start_evt.wait()
        t0 = time.perf_counter()
        iters = 0
        while time.perf_counter() - t0 < secs:
            # xorshift-ish integer mix: ALU-bound, no memory traffic
            # beyond the L1-resident buffer
            acc = (acc * mix) ^ (acc >> sh)
            acc = acc + np.roll(acc, 1)
            iters += 1
        dt = time.perf_counter() - t0
        out_q.put(("cpu", iters * CPU_N, dt))


def run_level(mode: str, procs: int, secs: float) -> dict:
    ctx = mp.get_context("spawn")  # fresh interpreters, like executor JVMs
    start_evt = ctx.Event()
    ready_q = ctx.Queue()
    out_q = ctx.Queue()
    ps = [
        ctx.Process(target=_worker, args=(mode, secs, ready_q, start_evt, out_q))
        for _ in range(procs)
    ]
    for p in ps:
        p.start()
    # readiness handshake, not a fixed sleep: a straggler still importing
    # numpy or zero-filling its arrays when the gun fires would run its
    # window partly alone and inflate the aggregate (sum(units)/mean(dt))
    for _ in ps:
        ready_q.get()
    start_evt.set()
    results = [out_q.get() for _ in ps]
    for p in ps:
        p.join()
    total_units = sum(r[1] for r in results)
    mean_dt = sum(r[2] for r in results) / len(results)
    rate = total_units / mean_dt  # aggregate bytes/s or ops/s
    return {"mode": mode, "procs": procs, "aggregate_rate": rate, "secs": mean_dt}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, nargs="+", default=[1, 4, 16])
    ap.add_argument("--secs", type=float, default=8.0)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    best: dict[tuple[str, int], dict] = {}
    for rnd in range(args.rounds):
        # interleave configs within each round (same discipline as the
        # replay ladder: back-to-back ordering measures co-tenant load)
        for mode in ("cpu", "triad"):
            for p in args.procs:
                r = run_level(mode, p, args.secs)
                k = (mode, p)
                if k not in best or r["aggregate_rate"] > best[k]["aggregate_rate"]:
                    best[k] = r
                unit = "GB/s" if mode == "triad" else "Gop/s"
                print(
                    f"[round {rnd}] {mode:5s} P={p:2d}: "
                    f"{r['aggregate_rate'] / 1e9:8.2f} {unit}",
                    flush=True,
                )

    rows = []
    for mode in ("cpu", "triad"):
        base_p = min(args.procs)
        base = best[(mode, base_p)]["aggregate_rate"]
        for p in args.procs:
            r = best[(mode, p)]
            factor = p / base_p
            eff = (r["aggregate_rate"] / base) / factor
            rows.append(
                {
                    "mode": mode,
                    "procs": p,
                    "aggregate_rate": round(r["aggregate_rate"] / 1e9, 2),
                    "unit": "GB/s" if mode == "triad" else "Gop/s",
                    "speedup_vs_p%d" % base_p: round(r["aggregate_rate"] / base, 3),
                    "efficiency": round(eff, 3),
                }
            )
    print(json.dumps(rows, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
