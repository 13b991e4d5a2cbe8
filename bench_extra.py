"""Isolated operator benchmarks + plan capture for the optimization
rounds (guide §1.4: time computations with the noop sink, label jobs,
keep bench.py frozen — extra measurements live HERE).

Usage:
  python bench_extra.py measure [sf_dir]   # noop-isolated timings
  python bench_extra.py plans <out_dir> [sf_dir]
                                           # .explain("formatted") per query

`measure` prints one JSON line per operator (best of BENCH_REPS, default
2) timed against a freshly built index over $SPARK_GRAFT_SF_DIR (or the
given sf_dir), computation isolated with the noop sink where the
operator returns a frame. `plans` writes the formatted physical plan of
every query path touched by the optimization round — runnable in any
tree revision, so before/after plan diffs come from the same script.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def _session(app: str):
    from large_scale_hypertextual_search_engine_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name=app, cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _build_idx(spark, sf_dir: str, tmp: str):
    from large_scale_hypertextual_search_engine_spark.operators.index_build import (
        build_index,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            F.col("doc_id").cast("string").alias("docid"),
            F.col("text").alias("content"),
        )
        .cache()
    )
    docs.count()
    idx = build_index(docs, mode="compat", stem=True, salt_buckets=4)
    for name in (
        "postings", "doc_stats", "lexicon", "docid_map", "collection_stats"
    ):
        idx[name].write.mode("overwrite").parquet(f"{tmp}/bx_{name}")
    return docs, {
        name: spark.read.parquet(f"{tmp}/bx_{name}")
        for name in (
            "postings", "doc_stats", "lexicon", "docid_map",
            "collection_stats",
        )
    }


def _queries(spark, idx, sf_dir: str, docs=None):
    """(name, thunk-returning-DataFrame) pairs for every query path
    touched this round; shared by `measure` and `plans`."""
    from large_scale_hypertextual_search_engine_spark.operators.wand import (
        wand_search, wand_search_batch, wand_phrase_search,
    )
    from large_scale_hypertextual_search_engine_spark.operators.query import (
        search, search_batch,
    )
    from large_scale_hypertextual_search_engine_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from large_scale_hypertextual_search_engine_spark.operators.mlt import (
        related_docs,
    )
    from large_scale_hypertextual_search_engine_spark.operators.decontam import (
        contamination_report,
    )
    from large_scale_hypertextual_search_engine_spark.operators.selection import (
        select_by_token_budget,
    )
    from large_scale_hypertextual_search_engine_spark.operators.textstats import (
        quality_features,
    )
    from large_scale_hypertextual_search_engine_spark.operators.linkrank import (
        pagerank,
    )

    lex_terms = [
        r["term"]
        for r in idx["lexicon"].orderBy(F.desc("tf")).limit(24).collect()
    ]
    qrows = []
    qid = 0
    for t in lex_terms:
        qrows.append((qid, t))
        qid += 1
    for i in range(0, len(lex_terms) - 1, 2):
        qrows.append((qid, lex_terms[i]))
        qrows.append((qid, lex_terms[i + 1]))
        qid += 1
    qmap: dict[int, list[str]] = {}
    for q, t in qrows:
        qmap.setdefault(q, []).append(t)
    queries_df = spark.createDataFrame(qrows, "query_id long, term string")
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs_txt = (
        raw.select(
            F.col("doc_id").cast("string").alias("docid"),
            F.col("text").alias("content"),
        )
        .orderBy("docid")
        .limit(500)
    )
    docs_full = raw.select("doc_id", "text")
    bench_slice = docs_full.filter(F.col("doc_id") % 37 == 0)
    nd = raw.count()
    edges = (
        raw.filter(F.col("doc_id") % 5 != 0)
        .select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 7 + 1) % nd).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    scored_docs = quality_features(docs_full, "text").select(
        "doc_id", "n_tokens", "distinct_ratio"
    )
    from large_scale_hypertextual_search_engine_spark.operators.index_build import (
        build_index,
    )

    def _build_plan():
        # the BUILD lineage (analyzer kernel + salted encode + merge),
        # not the re-read parquet
        src = docs if docs is not None else (
            raw.select(
                F.col("doc_id").cast("string").alias("docid"),
                F.col("text").alias("content"),
            )
        )
        return build_index(src, mode="compat", stem=True, salt_buckets=4)[
            "postings"
        ]

    return [
        ("index_build_postings", _build_plan),
        ("bm25_single", lambda: search(idx, ["spark", "join"], top_k=10)),
        (
            "bm25_batch",
            lambda: search_batch(idx, queries_df, top_k=10, tf_mode="true"),
        ),
        ("bm25_wand", lambda: wand_search(idx, ["spark", "join"], top_k=10)),
        ("bm25_wand_batch", lambda: wand_search_batch(idx, qmap, top_k=10)),
        (
            "phrase_wand",
            lambda: wand_phrase_search(idx, ["the", "dup"], top_k=10),
        ),
        (
            "dedup_minhash",
            lambda: minhash_lsh_pairs(raw, "text", "doc_id", threshold=0.8),
        ),
        (
            "related_500src",
            lambda: related_docs(idx, docs_txt, top_k=5, max_terms=3),
        ),
        (
            "decontam",
            lambda: contamination_report(docs_full, bench_slice, n=8),
        ),
        (
            "select_budget",
            lambda: select_by_token_budget(
                scored_docs, budget=500_000, score_col="distinct_ratio",
                token_col="n_tokens", id_col="doc_id",
            ),
        ),
        ("pagerank1", lambda: pagerank(edges, n_iter=1)),
    ]


def measure(sf_dir: str) -> None:
    spark = _session("bench_extra")
    reps = int(os.environ.get("BENCH_REPS", "2"))
    docs, idx = _build_idx(spark, sf_dir, "/tmp/bench_extra")
    timings: dict[str, float] = {}

    # index build itself (build + postings write, the bench headline op)
    from large_scale_hypertextual_search_engine_spark.operators.index_build import (
        build_index,
    )

    def _full_build():
        b = build_index(docs, mode="compat", stem=True, salt_buckets=4)
        b["postings"].write.mode("overwrite").parquet(
            "/tmp/bench_extra/bx_rebuild"
        )

    for name, fn in [("index_build_compat", _full_build)]:
        best = None
        for _ in range(reps):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)

    for name, thunk in _queries(spark, idx, sf_dir, docs)[1:]:
        best = None
        for _ in range(reps):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            thunk().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"metric": "bench_extra", "sf_dir": sf_dir, "queries": timings}))
    spark.stop()


def plans(out_dir: str, sf_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    spark = _session("bench_extra_plans")
    _docs, idx = _build_idx(spark, sf_dir, "/tmp/bench_extra_plans")
    for name, thunk in _queries(spark, idx, sf_dir, _docs):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            thunk().explain("formatted")
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("wrote", name)
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "measure"
    if cmd == "measure":
        sf = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
        measure(sf)
    elif cmd == "plans":
        out = sys.argv[2]
        sf = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
        plans(out, sf)
    else:
        raise SystemExit(f"unknown command {cmd!r}")
