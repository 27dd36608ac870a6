"""Regenerate the golden-sample kernel outputs for the imaging queries.

Writes ``astro_data_pipeline_spark/multimodal/golden.py``: for every
image in the deterministic golden sample (``doc_id % GOLDEN_SAMPLE_MOD
== 0`` within the image stripe, ``doc_id <= GOLDEN_MAX_DOC_ID``), the
P1–P5 kernel scalar outputs at full double precision (``repr`` —
shortest round-trip, so DuckDB parses back the identical bits).

These rows become the VALUES side of the imaging queries' DuckDB
oracles. They are NOT self-ratifying: the kernels that produce them are
independently pinned in ``tests/test_imaging.py`` (hand-computed bias
levels, the reference gain table, L.A.Cosmic spike-vs-star behaviour and
false-positive bounds, median selection network vs ``np.median``,
component labelling vs a BFS flood fill) — the golden block freezes
those already-validated kernels' outputs so the DRIVER can verify the
distributed pipeline end-to-end (scan → catalog derivation →
``mapInPandas`` → metrics) instead of recording a rows-only smoke run.

Rerun after any intentional kernel change:

    python scripts/gen_img_golden.py && python -m pytest tests/test_imaging.py -q
"""

from __future__ import annotations

import os
import sys
from multiprocessing import Pool

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN_SAMPLE_MOD = 51
GOLDEN_MAX_DOC_ID = 4999  # ids present at the driver bench SF (sf0.1)

INSTRUMENTS = ["WFC3", "NIRCAM", "MIRI", "GENERIC"]
FILTERS = ["F606W", "F814W-NARROW", "F160W"]


class _Row:
    def __init__(self, doc_id: int):
        tri = (doc_id // 3) % 3
        self.doc_id = doc_id
        self.instrument = INSTRUMENTS[doc_id % 4]
        self.filter = FILTERS[tri]
        self.exptime = float((doc_id % 7) * 30 + 30)
        self.width = (tri + 2) * 64
        self.height = ((doc_id % 2) + 2) * 48


def _one(doc_id: int) -> dict:
    from astro_data_pipeline_spark.multimodal.imaging import (
        ALL_PARTS,
        _process_one,
    )

    return _process_one(_Row(doc_id), ALL_PARTS)


def main() -> None:
    ids = [
        i
        for i in range(0, GOLDEN_MAX_DOC_ID + 1, GOLDEN_SAMPLE_MOD)
        if i % 3 == 0  # the image stripe; mod 51 implies mod 3, kept explicit
    ]
    with Pool(min(24, os.cpu_count() or 4)) as p:
        outs = p.map(_one, ids)

    def r(v) -> str:
        return repr(float(v))

    quality, calib, cosmic = [], [], []
    for o in outs:
        d = o["doc_id"]
        quality.append(
            f"    ({d}, {r(o['snr'])}, {r(o['seeing_fwhm'])}, "
            f"{r(o['limiting_mag'])}, {r(o['stellarity'])}, "
            f"{o['n_sources']}, {r(o['quality_score'])}),"
        )
        calib.append(
            f"    ({d}, {r(o['bias_overscan'])}, {r(o['bias_corner'])}, "
            f"{r(o['flat_norm'])}, {o['n_bad_pixels']}),"
        )
        cosmic.append(
            f"    ({d}, {o['n_cosmic_rays']}, {o['cr_iterations']}),"
        )

    path = os.path.join(REPO, "astro_data_pipeline_spark", "multimodal", "golden.py")
    with open(path, "w") as f:
        f.write(
            '"""Golden-sample imaging kernel outputs — GENERATED, do not edit.\n\n'
            "Produced by ``scripts/gen_img_golden.py`` (see its docstring for\n"
            "why these are not self-ratifying); consumed by the imaging\n"
            "queries' DuckDB oracles in ``multimodal/imaging.py``.\n"
            '"""\n\n'
            f"GOLDEN_SAMPLE_MOD = {GOLDEN_SAMPLE_MOD}\n"
            f"GOLDEN_MAX_DOC_ID = {GOLDEN_MAX_DOC_ID}\n\n"
            "# (doc_id, snr, seeing_fwhm, limiting_mag, stellarity,"
            " n_sources, quality_score)\nQUALITY = [\n"
            + "\n".join(quality)
            + "\n]\n\n"
            "# (doc_id, bias_overscan, bias_corner, flat_norm,"
            " n_bad_pixels)\nCALIB = [\n"
            + "\n".join(calib)
            + "\n]\n\n"
            "# (doc_id, n_cosmic_rays, cr_iterations)\nCOSMIC = [\n"
            + "\n".join(cosmic)
            + "\n]\n"
        )
    print(f"wrote {path}: {len(ids)} golden images")


if __name__ == "__main__":
    main()
