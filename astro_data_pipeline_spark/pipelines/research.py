"""The reference's research workflow TEMPLATE restated over this engine.

``airflow/dags/research_workflow_templates.py:51-140``
(create_algorithm_comparison_dag) is a parameterized DAG factory:
discover the candidate algorithms for one processing step, fan out one
task per algorithm over the same input, then a comparison task pulls
every candidate's metrics and ranks them. The Spark restatement keeps
the template shape — ``algorithm_comparison_pipeline(step, algorithms)``
builds the DAG from its parameter list — and swaps the data plane: the
"algorithms" compared are this engine's three oracled near-duplicate
detectors run over the same ``documents`` corpus, each contributing its
candidate-pair count as the comparison metric.

Because every compared algorithm is itself a registered, DuckDB-oracled
query, the template's whole run manifest composes their oracles: the
fan-out tasks' ``rows_out`` are pinned by subqueries over the SAME
oracle SQL the individual queries are gated on — the control plane and
the data plane are checked by one hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with siblings)
from pyspark.sql import types as T

# the compared algorithms register their oracles on import — keep this
# explicit so importing pipelines.research alone still composes them
from ..textops import chunking as _chunking  # noqa: F401
from ..textops import dedup as _dedup  # noqa: F401
from ..textops import similarity as _similarity  # noqa: F401
from .. import registry
from ..registry import query
from .orchestrator import Pipeline, PipelineContext

# the template's default parameter set (the reference compares three
# cosmic-ray removers; this engine compares its three oracled near-dup
# detectors on the same corpus)
DEDUP_ALGORITHMS = (
    "dedup_jaccard_shingle_pairs",
    "dedup_embedding_cosine_pairs",
    "dedup_substring_overlap_pairs",
)


def algorithm_comparison_pipeline(
    step: str, algorithms: tuple[str, ...]
) -> Pipeline:
    """Template factory (create_algorithm_comparison_dag :51-140):
    discover → one fan-out task per algorithm → compare. Any list of
    registered query names works; the fan-out breadth is a parameter,
    exactly like the reference's ``algorithms_to_compare`` param."""

    def discover(ctx: PipelineContext) -> int:
        """AlgorithmDiscoveryOperator analog (:86-90): candidates for
        this processing step known to the registry."""
        known = registry.all_queries()
        missing = [name for name in algorithms if name not in known]
        if missing:
            raise ValueError(f"unknown algorithms for {step}: {missing}")
        return len(algorithms)

    def mk_test(name: str):
        def test_algorithm(ctx: PipelineContext) -> int:
            # the candidate metric: pairs the detector surfaces on the
            # shared corpus (CosmicRayRemovalOperator analog :100-108)
            return registry.get(name).fn(ctx.spark, ctx.sf_dir).count()

        return test_algorithm

    def compare(ctx: PipelineContext) -> int:
        """compare_algorithm_results analog (:111-128): rank candidates
        by their metric; the ranking is pushed to xcom for callers."""
        results = {name: int(ctx.pull(f"test_algorithm_{name}")) for name in algorithms}
        ranking = sorted(results, key=lambda n: (-results[n], n))
        ctx._push("comparison_ranking", ranking)
        return len(results)

    p = Pipeline(f"algorithm_comparison_{step}", parallelism=4)
    p.add_task("discover_available_algorithms", discover)
    for name in algorithms:
        p.add_task(
            f"test_algorithm_{name}",
            mk_test(name),
            upstream=["discover_available_algorithms"],
        )
    p.add_task(
        "compare_algorithm_results",
        compare,
        upstream=[f"test_algorithm_{name}" for name in algorithms],
    )
    return p


_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("task", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("attempts", T.LongType(), False),
        T.StructField("rows_out", T.LongType(), True),
    ]
)


def _composed_oracle() -> str:
    """The manifest oracle composes the compared algorithms' OWN gate
    oracles as count subqueries — one hash checks both planes."""
    parts = [
        "SELECT 'compare_algorithm_results' AS task, 'success' AS status,"
        " CAST(1 AS BIGINT) AS attempts,"
        f" CAST({len(DEDUP_ALGORITHMS)} AS BIGINT) AS rows_out",
        f"UNION ALL SELECT 'discover_available_algorithms', 'success', 1,"
        f" {len(DEDUP_ALGORITHMS)}",
    ]
    for name in DEDUP_ALGORITHMS:
        sub = registry.get(name).oracle
        parts.append(
            f"UNION ALL SELECT 'test_algorithm_{name}', 'success', 1,"
            f" (SELECT count(*) FROM ({sub}))"
        )
    body = "\n    ".join(parts)
    return f"SELECT * FROM (\n    {body}\n    ) ORDER BY task"


@query("pipeline_algorithm_comparison", oracle=_composed_oracle())
def pipeline_algorithm_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the algorithm-comparison template over the three oracled
    near-dup detectors and return the deterministic run manifest: each
    fan-out task's rows_out is the detector's candidate-pair count,
    pinned by a count over that detector's own gate oracle."""
    run = algorithm_comparison_pipeline("near_dup_detection", DEDUP_ALGORITHMS).run(
        spark, sf_dir
    )
    if not run.ok:
        errs = {n: r.error for n, r in run.records.items() if r.status == "failed"}
        raise RuntimeError(f"comparison DAG failed: {errs}")
    return spark.createDataFrame(
        [
            (r["task"], r["status"], r["attempts"], r["rows_out"])
            for r in run.manifest_rows()
        ],
        schema=_MANIFEST_SCHEMA,
    ).orderBy("task")
