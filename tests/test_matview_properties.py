"""Randomized matview maintenance: seeded random op sequences (inserts,
updates, deletes, group migrations, NULL groups/values, batched commits,
skipped-refresh cycles, view compaction under MoR mode) checked against
a full recompute after EVERY refresh. The bespoke tests pin single
transitions; the compositions — a delete retracting an extreme in the
same multi-commit range as a group migration and a resurrection — are
where untested interactions would live (same rationale as the replay
and schema-evolution property suites)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from astro_data_pipeline_spark.lakehouse import LakeTable
from astro_data_pipeline_spark.lakehouse.matview import AggSpec, IncrementalAggView

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("grp", T.StringType(), True),
        T.StructField("v", T.LongType(), True),
        T.StructField("w", T.DoubleType(), True),
    ]
)

GROUPS = ["g0", "g1", "g2", None]
SPECS = [
    AggSpec("count", None, "n"),
    AggSpec("sum", "v", "sv"),
    AggSpec("avg", "v", "av"),
    AggSpec("max", "v", "mx"),
    AggSpec("min", "v", "mn"),
]


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(r[c] for c in cols) for r in df.select(*cols).collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("write_mode", ["cow", "mor"])
def test_random_interleavings_match_full_recompute(spark, tmp_path, seed, write_mode):
    rng = random.Random(1000 * seed + (write_mode == "mor"))
    base = LakeTable.create(
        spark, str(tmp_path / "b"), SCHEMA, ["k"], n_buckets=4
    )
    live: dict[int, tuple] = {}
    # seed rows
    init = []
    for k in range(12):
        row = (k, rng.choice(GROUPS), rng.randrange(-50, 50), None)
        live[k] = row
        init.append((*row, "insert"))
    base.merge(
        spark.createDataFrame(init, "k long, grp string, v long, w double, op string")
    )
    view = IncrementalAggView.create(
        spark, str(tmp_path / "mv"), base, ["grp"], SPECS, n_buckets=4,
        write_mode=write_mode,
    )

    for cycle in range(4):
        # 1-2 commits per cycle, each a batch of random ops
        for _ in range(rng.randrange(1, 3)):
            batch, touched = [], set()
            for _ in range(rng.randrange(1, 5)):
                k = rng.randrange(0, 16)
                if k in touched:
                    continue  # merge contract: key-collapsed batches
                touched.add(k)
                if k in live and rng.random() < 0.3:
                    batch.append((k, None, None, None, "delete"))
                    del live[k]
                else:
                    # insert or update; group migration and value flips
                    # (incl. the group's current extreme) arise naturally
                    row = (
                        k,
                        rng.choice(GROUPS),
                        rng.choice([None, rng.randrange(-50, 50)]),
                        rng.choice([None, float(rng.randrange(0, 10))]),
                    )
                    op = "update" if k in live else "insert"
                    live[k] = row
                    batch.append((*row, op))
            if batch:
                base.merge_mor(
                    spark.createDataFrame(
                        batch, "k long, grp string, v long, w double, op string"
                    )
                )
        if rng.random() < 0.25:
            continue  # skipped refresh: next one spans multiple commits
        view.refresh()
        if write_mode == "mor" and rng.random() < 0.3:
            view.table.compact()
        assert _rows(view.read()) == _rows(view.full_compute()), (
            f"seed={seed} mode={write_mode} cycle={cycle}"
        )

    # catch up any skipped tail, then cross-check against a FRESH view
    view.refresh()
    fresh = IncrementalAggView.create(
        spark, str(tmp_path / "fresh"), base, ["grp"], SPECS, n_buckets=4
    )
    assert _rows(view.read()) == _rows(fresh.read())
