"""Every registered query with an oracle must match DuckDB at sf0.01 —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from astro_data_pipeline_spark import registry

from .oracle_utils import compare_query

_ORACLED = sorted(registry.all_oracles().keys())


@pytest.mark.parametrize("name", _ORACLED)
def test_query_matches_oracle(spark, sf_dir, name):
    qd = registry.get(name)
    compare_query(spark, sf_dir, qd.fn, qd.oracle)


def test_entry_smoke(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) >= 3
    # every query key has a callable; every oracle key exists in queries
    qs, os_ = mod.queries(), mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(callable(f) for f in qs.values())
