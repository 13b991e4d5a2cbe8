"""BM25F fielded retrieval: parity with a Python mirror of the
Robertson-Zaragoza simple weighted-field formula, field-weight
semantics, and the doc_int-parity guard."""

import math

import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.bm25f import (
    search_bm25f,
)
from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
)

N_DOCS = 200
TITLE_LEN = 8
W = {"title": 2.0, "body": 1.0}
K1, B_ = 1.5, 0.75


def _toks(text):
    return [t for t in text.split(" ") if t]


@pytest.fixture(scope="module")
def fielded(spark):
    """(docs_rows, {field: index}) — title = first 8 tokens, body =
    rest, both indexed with the ordinary builder."""
    rows = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text")
        .limit(N_DOCS)
        .collect()
    )
    data = [
        (
            r["docid"],
            " ".join(_toks(r["text"])[:TITLE_LEN]),
            " ".join(_toks(r["text"])[TITLE_LEN:]),
        )
        for r in rows
    ]
    df = spark.createDataFrame(data, "docid string, title string, body string")
    idxs = {}
    for f in ("title", "body"):
        idxs[f] = build_index(
            df.select("docid", F.col(f).alias("content")),
            mode="simple", stem=False, salt_buckets=2,
        )
    return data, idxs


def _mirror(data, terms, mode):
    """Pure-Python BM25F over the same field split."""
    fields = {"title": {}, "body": {}}
    lens = {"title": {}, "body": {}}
    for docid, title, body in data:
        for f, text in (("title", title), ("body", body)):
            toks = _toks(text)
            lens[f][docid] = len(toks)
            for t in toks:
                fields[f].setdefault(t, {}).setdefault(docid, 0)
                fields[f][t][docid] += 1
    n = len(data)
    avgdl = {f: sum(lens[f].values()) / n for f in fields}
    scores = {}
    for docid, _, _ in data:
        tfts = {}
        for t in dict.fromkeys(terms):
            tft = 0.0
            for f in fields:
                tf = fields[f].get(t, {}).get(docid, 0)
                if tf:
                    bf = 1.0 - B_ + B_ * lens[f][docid] / avgdl[f]
                    tft += W[f] * tf / bf
            if tft > 0:
                tfts[t] = tft
        if not tfts:
            continue
        if mode == "and" and len(tfts) < len(set(terms)):
            continue
        s = 0.0
        parts = []
        for t, tft in tfts.items():
            df_t = len(
                set(fields["title"].get(t, {})) | set(fields["body"].get(t, {}))
            )
            idf = math.log((n - df_t + 0.5) / (df_t + 0.5) + 1.0)
            parts.append(idf * tft / (K1 + tft))
        for x in sorted(parts):
            s += x
        scores[docid] = s
    return scores


@pytest.mark.parametrize("mode", ["and", "or"])
def test_bm25f_matches_python_mirror(spark, fielded, mode):
    data, idxs = fielded
    want = _mirror(data, ["join", "spark"], mode)
    got = {
        r["docid"]: r["score"]
        for r in search_bm25f(
            idxs, W, ["join", "spark"], top_k=10**6, mode=mode,
            k1=K1, b=B_,
        ).collect()
    }
    assert set(got) == set(want), mode
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12), (d, mode)
    assert got


def test_bm25f_title_weight_matters(spark, fielded):
    """Raising the title weight must strictly increase the score of a
    doc whose hit is in the title, and leave a body-only doc's relative
    standing lower."""
    data, idxs = fielded
    lo = {
        r["docid"]: r["score"]
        for r in search_bm25f(
            idxs, {"title": 1.0, "body": 1.0}, ["join"], top_k=10**6,
            mode="or",
        ).collect()
    }
    hi = {
        r["docid"]: r["score"]
        for r in search_bm25f(
            idxs, {"title": 5.0, "body": 1.0}, ["join"], top_k=10**6,
            mode="or",
        ).collect()
    }
    title_docs = {d for d, t, _ in data if "join" in _toks(t)}
    body_only = {
        d for d, t, b in data if "join" in _toks(b) and "join" not in _toks(t)
    }
    assert title_docs and body_only
    for d in title_docs:
        assert hi[d] > lo[d], d
    # saturation: body-only docs can only lose score mass relatively
    for d in body_only:
        assert hi[d] == pytest.approx(lo[d], rel=1e-12), d


def test_bm25f_rejects_mismatched_doc_sets(spark, fielded):
    data, idxs = fielded
    small = build_index(
        idxs["title"]["docid_map"].sparkSession.createDataFrame(
            [(d, t) for d, t, _ in data[:50]], "docid string, content string"
        ),
        mode="simple", stem=False, salt_buckets=2,
    )
    with pytest.raises(ValueError, match="same document set"):
        search_bm25f(
            {"title": small, "body": idxs["body"]}, W, ["join"], top_k=5
        )


def test_bm25f_rejects_weight_field_mismatch(spark, fielded):
    _, idxs = fielded
    with pytest.raises(ValueError, match="weights"):
        search_bm25f(idxs, {"title": 1.0}, ["join"], top_k=5)
