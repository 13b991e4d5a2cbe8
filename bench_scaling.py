"""North-rule scaling evidence: same job at N and 4N parallelism.

No real cluster exists in this sandbox, so (per the driver instruction)
we run the identical job at local[8] and local[32] on the same input
and report throughput at both plus scaling efficiency
  eff = throughput(4N) / (4 * throughput(N)).

The measured job is the CPU-dominant engine core — analyze + salted
two-phase postings build — over a deterministically generated synthetic
code corpus (sources.corpus.synthetic_code_corpus, seed=42) large
enough that fixed overheads don't swamp the measurement, plus a BM25
batch-query job over the built index. Results are written to
BENCH/BASELINE.md by the caller.
"""

from __future__ import annotations

import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

N_DOCS = int(os.environ.get("SCALING_DOCS", "60000"))
N_QUERIES = 64


def run_at(cores: int) -> dict:
    from large_scale_hypertextual_search_engine_spark.session import get_spark
    from large_scale_hypertextual_search_engine_spark.sources.corpus import (
        synthetic_code_corpus,
    )
    from large_scale_hypertextual_search_engine_spark.operators.index_build import (
        build_index,
    )
    from large_scale_hypertextual_search_engine_spark.operators.query import (
        search_batch,
    )

    spark = get_spark(app_name=f"scaling-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    docs = synthetic_code_corpus(
        spark, N_DOCS, seed=42, max_tokens=400, partitions=4 * cores
    ).select("docid", "content").cache()
    n = docs.count()

    t0 = time.time()
    idx = build_index(docs, mode="compat", stem=True, salt_buckets=8)
    idx["postings"].write.mode("overwrite").parquet(f"/tmp/scaling_{cores}_postings")
    build_s = time.time() - t0
    for name in ("doc_stats", "lexicon", "docid_map", "collection_stats"):
        idx[name].write.mode("overwrite").parquet(f"/tmp/scaling_{cores}_{name}")
    idx = {
        name: spark.read.parquet(f"/tmp/scaling_{cores}_{name}")
        for name in ("postings", "doc_stats", "lexicon", "docid_map", "collection_stats")
    }

    terms = [
        r["term"]
        for r in idx["lexicon"].orderBy(F.desc("tf")).limit(N_QUERIES).collect()
    ]
    qrows = [(i, t) for i, t in enumerate(terms)]
    qrows += [
        (N_QUERIES + i, terms[2 * i + k])
        for i in range(N_QUERIES // 2 - 1)
        for k in (0, 1)
    ]
    queries = spark.createDataFrame(qrows, "query_id long, term string")
    n_q = len({q for q, _ in qrows})
    t0 = time.time()
    search_batch(idx, queries, top_k=10, tf_mode="true").count()
    query_s = time.time() - t0
    spark.stop()
    return {
        "cores": cores,
        "n_docs": n,
        "index_build_sec": round(build_s, 2),
        "index_docs_per_sec": round(n / build_s, 1),
        "query_batch_sec": round(query_s, 2),
        "bm25_qps": round(n_q / query_s, 2),
    }


def main() -> None:
    r8 = run_at(8)
    r32 = run_at(32)
    eff_index = r32["index_docs_per_sec"] / (4 * r8["index_docs_per_sec"])
    eff_query = r32["bm25_qps"] / (4 * r8["bm25_qps"])
    out = {
        "n": r8,
        "4n": r32,
        "scaling_efficiency_index": round(eff_index, 3),
        "scaling_efficiency_query": round(eff_query, 3),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
