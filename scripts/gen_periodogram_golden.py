"""Regenerate the golden per-key periodogram peaks for the
``grouped_periodogram_peak`` DuckDB oracle.

Same device as ``gen_img_golden.py`` (the golden-sample trick that took
the imaging kernels from rows-only to full driver oracles): the
Lomb–Scargle kernel's per-key scalar outputs at the DRIVER GATE's scale
factor (sf0.01 — the SF the driver runs oracles at) are frozen at full
double precision into ``operators/periodogram_golden.py`` and become the
VALUES side of the oracle; ``n_obs`` and the key set are recomputed
independently in pure SQL and joined against them, so the driver
verifies the whole distributed path (scan → groupBy → Arrow batch →
kernel → filter) end to end instead of recording a rows-only smoke run.

NOT self-ratifying: the kernel itself is pinned in
``tests/test_grouped_kernels.py`` against textbook behaviour (a synthetic
sinusoid's period recovered within grid resolution, NaN on degenerate
series) — this block freezes the already-validated kernel's outputs.

Unlike the imaging golden block (pure function of doc_id, valid at any
SF), a key's event SERIES differs per SF, so these rows are pinned to
ONE dataset: the sf0.01 gate tables. The oracle embeds that scope; the
full-scale behaviour is exercised by bench.py at sf0.1 (unoracled, as
before).

The generator deliberately does NOT use Spark: it replays the kernel
over pandas groups read straight from parquet, so the frozen values are
independent of the Spark plumbing the driver then verifies.

Rerun after any intentional kernel change:

    python scripts/gen_periodogram_golden.py && \
        python -m pytest tests/test_grouped_kernels.py -q
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    from astro_data_pipeline_spark.operators.grouped_analytics import (
        _MIN_OBS,
        _lomb_scargle,
    )

    pdf = (
        pq.read_table(os.path.join(SF_DIR, "events.parquet"))
        .select(["user_id", "ts", "value"])
        .to_pandas()
    )
    rows = []
    for _uid, g in sorted(pdf.groupby("user_id"), key=lambda kv: kv[0]):
        out = _lomb_scargle(g)
        n = int(out["n_obs"].iloc[0])
        if n < _MIN_OBS:
            continue
        freq = float(out["peak_freq_hz"].iloc[0])
        power = float(out["peak_power"].iloc[0])
        # a NaN peak (all events at one instant) would need NULL-vs-NaN
        # canon the oracle can't express — refuse to freeze it silently
        assert np.isfinite(freq) and np.isfinite(power), (_uid, freq, power)
        rows.append(
            f"    ({int(out['user_id'].iloc[0])}, {n}, {freq!r}, "
            f"{power!r}, {bool(out['is_periodic'].iloc[0])}),"
        )

    path = os.path.join(
        REPO, "astro_data_pipeline_spark", "operators", "periodogram_golden.py"
    )
    with open(path, "w") as f:
        f.write(
            '"""Golden per-key Lomb-Scargle peaks — GENERATED, do not edit.\n\n'
            "Produced by ``scripts/gen_periodogram_golden.py`` (see its\n"
            "docstring for scope and why these are not self-ratifying);\n"
            "consumed by the ``grouped_periodogram_peak`` DuckDB oracle in\n"
            "``operators/grouped_analytics.py``. Valid ONLY for the sf0.01\n"
            "gate tables — a key's series differs per SF.\n"
            '"""\n\n'
            f'GOLDEN_SF_DIR = "{SF_DIR}"\n\n'
            "# (user_id, n_obs, peak_freq_hz, peak_power, is_periodic)\n"
            "PEAKS = [\n" + "\n".join(rows) + "\n]\n"
        )
    print(f"wrote {path}: {len(rows)} golden keys")


if __name__ == "__main__":
    main()
