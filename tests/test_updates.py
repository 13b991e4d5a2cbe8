"""Document upsert (operators/updates.py).

Upserted content must be retrievable immediately via the federated
segment list; every stale copy must be hidden; repeated upserts keep
the one-live-copy invariant across three segments.
"""

import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.federated import (
    search_federated,
)
from large_scale_hypertextual_search_engine_spark.operators.updates import (
    upsert_docs,
)
from large_scale_hypertextual_search_engine_spark.plans.lineage import (
    build_and_save_index,
    load_index,
)

KW = dict(mode="simple", stem=False, salt_buckets=2)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "docid string, content string")


@pytest.fixture()
def base_dir(spark, tmp_path):
    d = str(tmp_path / "base")
    build_and_save_index(
        _docs(
            spark,
            [
                ("a", "alpha beta gamma"),
                ("b", "beta delta"),
                ("c", "gamma gamma epsilon"),
            ],
        ),
        d,
        "upsert-base",
        **KW,
    )
    return d


def _hits(spark, dirs, terms):
    segs = [load_index(spark, d) for d in dirs]
    return {
        r["docid"]: r["score"]
        for r in search_federated(segs, terms, top_k=100, mode="or").collect()
    }


def test_update_hides_stale_and_serves_new(spark, base_dir, tmp_path):
    delta = str(tmp_path / "d1")
    info = upsert_docs(
        spark, [base_dir], delta,
        _docs(spark, [("b", "zeta zeta"), ("d", "alpha zeta")]),
        **KW,
    )
    assert info["segments"] == [base_dir, delta]
    assert info["tombstoned"] == {base_dir: 1}  # only b existed
    assert info["upserted"] == 2
    # old content of b ('beta delta') is gone; new content matches
    assert "b" not in _hits(spark, info["segments"], ["delta"])
    zeta = _hits(spark, info["segments"], ["zeta"])
    assert set(zeta) == {"b", "d"}
    # untouched docs still match
    assert set(_hits(spark, info["segments"], ["gamma"])) == {"a", "c"}


def test_repeated_upsert_one_live_copy(spark, base_dir, tmp_path):
    d1, d2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    s1 = upsert_docs(
        spark, [base_dir], d1, _docs(spark, [("a", "omega one")]), **KW
    )["segments"]
    s2 = upsert_docs(
        spark, s1, d2, _docs(spark, [("a", "omega two")]), **KW
    )["segments"]
    assert s2 == [base_dir, d1, d2]
    om = _hits(spark, s2, ["omega"])
    assert set(om) == {"a"}  # exactly one live copy
    assert set(_hits(spark, s2, ["two"])) == {"a"}
    assert _hits(spark, s2, ["one"]) == {}  # middle version hidden


def test_insert_only_is_plain_delta(spark, base_dir, tmp_path):
    delta = str(tmp_path / "d1")
    info = upsert_docs(
        spark, [base_dir], delta, _docs(spark, [("x", "alpha omega")]), **KW
    )
    assert info["tombstoned"] == {base_dir: 0}
    hits = _hits(spark, info["segments"], ["alpha"])
    assert set(hits) == {"a", "x"}
