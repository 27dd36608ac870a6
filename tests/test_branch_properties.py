"""Property-style branch/WAP invariance: a randomized interleaving of
merges, schema evolution, compaction, branch forks, publishes, and
drops must keep EVERY live ref's ``read()`` equal to its own
driver-side dict model at every step.

Same rationale as tests/test_evolution_properties.py: the bespoke
branch tests pin single transitions; the bugs live in compositions —
e.g. the snapshot-id collision where a main commit after a fork
overwrote the branch's snapshot file was exactly a two-ref
interleaving no single-transition test exercised. Publish is modeled
honestly: it must succeed iff main has not moved since the fork, and
on conflict BOTH refs must be byte-unchanged.
"""

from __future__ import annotations

import copy

import numpy as np
import pytest
from pyspark.sql import types as T

from astro_data_pipeline_spark.lakehouse import CommitConflictError, LakeTable

from .test_evolution_properties import (
    _SPARK_T,
    _WIDE_OF,
    _Model,
    _batch_df,
    _check,
    _spark_schema,
)


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_random_branch_sequences_match_per_ref_models(spark, tmp_path, seed):
    rng = np.random.default_rng(seed)
    models: dict[str, _Model] = {"main": _Model()}
    views: dict[str, LakeTable] = {}
    fork_clean = {"ok": False}  # main untouched since the live branch forked?
    main = LakeTable.create(
        spark,
        str(tmp_path / f"br{seed}"),
        _spark_schema(models["main"]),
        ["k"],
        n_buckets=4,
    )
    views["main"] = main

    def pick_ref() -> str:
        return str(rng.choice(sorted(models)))

    def op_merge(ref: str | None = None):
        ref = ref or pick_ref()
        model, view = models[ref], views[ref]
        keys = [f"k{int(i)}" for i in rng.integers(0, 30, size=int(rng.integers(1, 8)))]
        batch: dict[str, dict | None] = {}
        for k in keys:
            if k in model.rows and rng.random() < 0.3:
                batch[k] = None
            else:
                batch[k] = {c: model.value_for(rng, t) for c, t in model.cols.items()}
        df = _batch_df(spark, model, list(batch.items()))
        if rng.random() < 0.5:
            view.merge(df, delete_op="delete")
        else:
            view.merge_mor(df, delete_op="delete")
        for k, r in batch.items():
            if r is None:
                model.rows.pop(k, None)
            else:
                model.rows[k] = dict(r)
        if ref == "main" and "staging" in models:
            fork_clean["ok"] = False

    def op_evolve(ref: str | None = None):
        ref = ref or pick_ref()
        model, view = models[ref], views[ref]
        roll = rng.random()
        if roll < 0.45:
            model._next_col += 1
            name = f"{ref[0]}{model._next_col}"
            tag = str(rng.choice(["int", "float", "long"]))
            view.add_columns([T.StructField(name, _SPARK_T[tag], True)])
            model.cols[name] = tag
        elif roll < 0.8:
            cands = [n for n, t in model.cols.items() if t in _WIDE_OF]
            if not cands:
                return
            name = str(rng.choice(cands))
            wide = _WIDE_OF[model.cols[name]]
            view.widen_columns({name: _SPARK_T[wide]})
            model.cols[name] = wide
        else:
            if len(model.cols) < 2:
                return
            name = str(rng.choice(sorted(model.cols)))
            view.drop_columns([name])
            model.cols.pop(name)
            for r in model.rows.values():
                r.pop(name, None)
        if ref == "main" and "staging" in models:
            fork_clean["ok"] = False

    def op_compact():
        views[pick_ref()].compact()

    def op_fork():
        if "staging" in models:
            return
        views["staging"] = main.create_branch("staging")
        models["staging"] = copy.deepcopy(models["main"])
        fork_clean["ok"] = True

    def op_publish():
        if "staging" not in models:
            return
        if fork_clean["ok"]:
            main.fast_forward("staging")
            models["main"] = copy.deepcopy(models["staging"])
            fork_clean["ok"] = True  # heads equal again: branch still "clean"
        else:
            before = {r: _snap_id(v) for r, v in views.items()}
            with pytest.raises(CommitConflictError):
                main.fast_forward("staging")
            after = {r: _snap_id(v) for r, v in views.items()}
            assert after == before  # conflict must not move ANY ref
            main.drop_branch("staging")
            models.pop("staging")
            views.pop("staging")

    def op_drop_branch():
        if "staging" not in models:
            return
        main.drop_branch("staging")
        models.pop("staging")
        views.pop("staging")

    def _snap_id(v: LakeTable) -> int:
        return v.current_snapshot().snapshot_id

    ops = [op_merge, op_merge, op_evolve, op_compact, op_fork, op_publish, op_drop_branch]
    weights = np.array([0.28, 0.14, 0.16, 0.08, 0.16, 0.12, 0.06])
    weights = weights / weights.sum()
    op_merge("main")
    for _step in range(12):
        ops[int(rng.choice(len(ops), p=weights))]()
        for ref in sorted(models):
            _check(views[ref], models[ref])

    # wind down: publish-or-drop, then main must still match its model
    if "staging" in models:
        op_publish()
    if "staging" in models:
        op_drop_branch()
    _check(main, models["main"])
    main.expire_snapshots(keep_last=2)
    _check(main, models["main"])
