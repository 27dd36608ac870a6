"""Connected-components clustering: algorithm pins independent of the
DuckDB oracle (which covers the registered query end-to-end in
test_queries_vs_oracle.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from astro_data_pipeline_spark.textops.cluster import (
    connected_components,
    dedup_duplicate_clusters,
    duplicate_edges,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_components_chain_and_islands(spark):
    """A 4-chain (worst diameter per node count), a 2-clique, and a
    reversed-orientation edge all resolve to min-id components."""
    e = _edges(spark, [(1, 2), (3, 2), (3, 4), (11, 10), (20, 21), (22, 21)])
    got = {
        (r["node"], r["comp"]) for r in connected_components(e, max_iter=10).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_components_nonconvergence_guard(spark):
    """max_iter too small for the diameter raises instead of returning a
    partially-propagated (wrong) labeling."""
    chain = _edges(spark, [(i, i + 1) for i in range(1, 9)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=1)


def test_components_long_chain_converges_fast(spark):
    """A 30-hop path graph (a 30-version near-dup edit chain) must
    converge well within the default budget: pointer jumping makes
    rounds O(log diameter), so 6 rounds cover diameter 30 — plain
    one-hop propagation would need 31 and previously exhausted
    max_iter=20 on exactly this legitimate shape."""
    chain = _edges(spark, [(i, i + 1) for i in range(30)])
    got = {
        (r["node"], r["comp"])
        for r in connected_components(chain, max_iter=7).collect()
    }
    assert got == {(i, 0) for i in range(31)}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(7, 30, 18), (8, 50, 60), (9, 40, 39)])
def test_components_match_union_find_on_random_graphs(spark, seed, n_nodes, n_edges):
    """Seeded random graphs (sparse, dense, and near-critical) vs a
    pure-Python union-find oracle — pins the distributed algorithm on
    topologies the fixture never produces (long chains, rings, hubs)."""
    import random

    rng = random.Random(seed)
    pairs = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]

    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    nodes_with_edges = {n for e in pairs for n in e}
    want = {}
    for comp_nodes in ({n for n in nodes_with_edges if find(n) == r}
                       for r in {find(n) for n in nodes_with_edges}):
        m = min(comp_nodes)
        for n in comp_nodes:
            want[n] = m

    got = {
        r["node"]: r["comp"]
        for r in connected_components(_edges(spark, pairs), max_iter=30).collect()
    }
    assert got == want


def test_cluster_query_is_closed_and_canonical(spark, sf_dir):
    """Every cluster member's canonical id is a member of the same
    cluster, is its minimum, and cluster_size counts the members —
    i.e. the output is a valid transitive closure of the edge set."""
    out = dedup_duplicate_clusters(spark, sf_dir).collect()
    assert out, "testdata has near-dup pairs; clusters must be non-empty"
    by_comp: dict[int, list[int]] = {}
    for r in out:
        by_comp.setdefault(r["canonical_doc_id"], []).append(r["doc_id"])
    sizes = {r["canonical_doc_id"]: r["cluster_size"] for r in out}
    for comp, members in by_comp.items():
        assert comp == min(members)
        assert sizes[comp] == len(members) >= 2
    # closure: no edge may cross two different components
    labels = {r["doc_id"]: r["canonical_doc_id"] for r in out}
    for e in duplicate_edges(spark, sf_dir).collect():
        assert labels[e["src"]] == labels[e["dst"]]
