"""connected_components / dedup_clusters vs a pure-Python union-find."""

import numpy as np
import pytest

from large_scale_hypertextual_search_engine_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def _uf_components(edges):
    """Reference union-find: node -> min id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots = {}
    for n in list(parent):
        roots.setdefault(find(n), []).append(n)
    out = {}
    for members in roots.values():
        lo = min(members)
        for n in members:
            out[n] = lo
    return out


def test_connected_components_fuzz_vs_union_find(spark):
    rng = np.random.default_rng(3)
    for trial in range(4):
        n_nodes = int(rng.integers(20, 120))
        n_edges = int(rng.integers(10, 150))
        edges = [
            (int(a), int(b))
            for a, b in rng.integers(0, n_nodes, size=(n_edges, 2))
            if a != b
        ]
        if not edges:
            continue
        want = _uf_components(edges)
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["node"]: r["component"]
            for r in connected_components(df).collect()
        }
        assert got == want, f"trial {trial}"


def test_connected_components_long_path(spark):
    """A 12-hop path exercises multi-round propagation (diameter 12)."""
    edges = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {i: 0 for i in range(13)}


def test_connected_components_round_cap_raises(spark):
    edges = [(i, i + 1) for i in range(6)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_rounds=2)


def test_dedup_clusters_canonical_semantics(spark):
    # two clusters {1,2,3} and {10,11}; 7 isolated (absent from output)
    df = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    rows = {r["doc_id"]: r for r in dedup_clusters(df).collect()}
    assert set(rows) == {1, 2, 3, 10, 11}
    assert all(rows[d]["cluster_id"] == 1 for d in (1, 2, 3))
    assert all(rows[d]["cluster_id"] == 10 for d in (10, 11))
    keep = {d for d, r in rows.items() if r["is_canonical"]}
    assert keep == {1, 10}


def test_connected_components_string_ids(spark):
    df = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y")], "id_a string, id_b string"
    )
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
