"""Property-style schema-evolution invariance: a randomized interleaving
of merges (CoW and MoR), adds, widens, drops, compactions and rebuckets
must keep ``read()`` equal to a driver-side dict model at every step.

The point mirrors tests/test_replay_properties.py: the dedicated unit
tests each pin ONE evolution transition; real tables accumulate
arbitrary interleavings (add then widen then drop then re-merge through
mixed narrow/wide base and delta files), and the bugs live in the
compositions nobody wrote a bespoke test for.

Seeds are parametrized (not hypothesis-driven): each Spark op costs
~0.5-2 s, so a handful of very different deterministic sequences beats
shrinking. Float values are multiples of 0.25 — exactly representable in
float32 — so float->double widening compares exact, never epsilon.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import types as T

from astro_data_pipeline_spark.lakehouse import LakeTable

_SPARK_T = {"int": T.IntegerType(), "long": T.LongType(), "float": T.FloatType(), "double": T.DoubleType()}
_WIDE_OF = {"int": "long", "float": "double"}


class _Model:
    """Driver-side reference: dict of rows + a typed schema."""

    def __init__(self):
        self.cols: dict[str, str] = {"a": "int", "b": "float"}  # name -> tag
        self.rows: dict[str, dict] = {}
        self.dropped: set[str] = set()
        self._next_col = 0

    def value_for(self, rng, tag: str):
        if tag == "int":
            return int(rng.integers(-1000, 1000))
        if tag == "long":
            return int(rng.integers(-(2**40), 2**40))
        # float/double: exact in binary32
        return float(rng.integers(-4000, 4000)) * 0.25

    def to_pandas(self) -> pd.DataFrame:
        cols = ["k", *self.cols]
        data = [
            {"k": k, **{c: r.get(c) for c in self.cols}} for k, r in self.rows.items()
        ]
        df = pd.DataFrame(data, columns=cols)
        return df.sort_values("k").reset_index(drop=True)


def _spark_schema(model: _Model) -> T.StructType:
    return T.StructType(
        [T.StructField("k", T.StringType(), False)]
        + [T.StructField(n, _SPARK_T[t], True) for n, t in model.cols.items()]
    )


def _batch_df(spark, model: _Model, batch: list[tuple[str, dict | None]]):
    """Build a merge batch (key, row-or-None-for-delete) at current types."""
    schema = _spark_schema(model).add(T.StructField("op", T.StringType(), False))
    rows = []
    for k, r in batch:
        if r is None:
            rows.append((k, *[None] * len(model.cols), "delete"))
        else:
            rows.append((k, *[r.get(c) for c in model.cols], "upsert"))
    return spark.createDataFrame(rows, schema)


def _check(table: LakeTable, model: _Model) -> None:
    got = (
        table.read()
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)[["k", *model.cols]]
    )
    want = model.to_pandas()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_random_evolution_sequences_match_model(spark, tmp_path, seed):
    rng = np.random.default_rng(seed)
    model = _Model()
    table = LakeTable.create(
        spark, str(tmp_path / f"evo{seed}"), _spark_schema(model), ["k"], n_buckets=4
    )

    def op_merge():
        keys = [f"k{int(i)}" for i in rng.integers(0, 30, size=int(rng.integers(1, 8)))]
        batch: dict[str, dict | None] = {}
        for k in keys:
            if k in model.rows and rng.random() < 0.3:
                batch[k] = None  # delete
            else:
                batch[k] = {c: model.value_for(rng, t) for c, t in model.cols.items()}
        df = _batch_df(spark, model, list(batch.items()))
        if rng.random() < 0.5:
            table.merge(df, delete_op="delete")
        else:
            table.merge_mor(df, delete_op="delete")
        for k, r in batch.items():
            if r is None:
                model.rows.pop(k, None)
            else:
                model.rows[k] = dict(r)

    def op_add():
        model._next_col += 1
        name = f"c{model._next_col}"
        tag = str(rng.choice(["int", "float", "long"]))
        table.add_columns([T.StructField(name, _SPARK_T[tag], True)])
        model.cols[name] = tag
        # existing rows null-fill; future merges carry values

    def op_widen():
        cands = [n for n, t in model.cols.items() if t in _WIDE_OF]
        if not cands:
            return
        name = str(rng.choice(cands))
        wide = _WIDE_OF[model.cols[name]]
        table.widen_columns({name: _SPARK_T[wide]})
        model.cols[name] = wide

    def op_drop():
        if len(model.cols) < 2:  # engine refuses dropping the last value col
            return
        name = str(rng.choice(sorted(model.cols)))
        table.drop_columns([name])
        model.cols.pop(name)
        model.dropped.add(name)
        for r in model.rows.values():
            r.pop(name, None)

    def op_compact():
        table.compact()

    def op_rebucket():
        table.rebucket(int(rng.choice([2, 4, 8])))
        model.dropped.clear()

    ops = [op_merge, op_merge, op_merge, op_add, op_widen, op_drop, op_compact, op_rebucket]
    weights = np.array([0.30, 0.15, 0.10, 0.12, 0.12, 0.08, 0.08, 0.05])
    weights = weights / weights.sum()
    op_merge()  # always start with data
    for _step in range(10):
        ops[int(rng.choice(len(ops), p=weights))]()
        _check(table, model)

    # and the poison invariant held throughout: every currently-dropped
    # name is refused for re-add
    for name in model.dropped:
        with pytest.raises(ValueError, match="resurrect"):
            table.add_columns([T.StructField(name, T.StringType(), True)])
