"""Training-corpus selection: token-budget prefix and stratified sampling.

Two data-mixture primitives every LLM training pipeline runs after
scoring/dedup (the "take the best N tokens" step of quality-filtered
corpora, cf. Gopher / The Pile data recipes):

* ``select_by_token_budget`` — the greedy prefix of the corpus ordered
  by (score DESC, id ASC) whose cumulative token count fits a budget.
  Semantics are exactly SQL's
  ``SUM(tokens) OVER (ORDER BY score DESC, id) <= budget`` — but a
  single global ORDER BY window is a one-task funnel, so this runs the
  classic distributed prefix-sum (Blelloch scan) instead:

    1. ``repartitionByRange`` on the sort key — the only wide exchange;
       rows land range-ordered across partitions and sorted within.
    2. tiny job: per-partition token sums -> driver cumsum gives each
       partition its exclusive global offset (P numbers, P = shuffle
       partitions — never data-scale).
    3. narrow Arrow pass: local running cumsum + offset = exact global
       cumulative sum; rows over budget are dropped in the kernel.
       Partitions whose offset already exceeds the budget are filtered
       out JVM-side BEFORE Arrow transfer, so when budget << corpus
       almost all partitions ship zero rows to Python.

  The ranged frame is persisted (MEMORY_AND_DISK) between the two
  passes so the range exchange runs once; pass 2 would otherwise
  re-shuffle AND re-sample range bounds. Callers owning a longer
  pipeline can unpersist via the returned frame's lineage.

* ``sample_stratified`` — per-group Bernoulli sampling at given rates,
  deterministic in the row id (md5-prefix threshold, no RNG state):
  the same row is kept or dropped on every run, on every executor, and
  by the DuckDB oracle — reproducible training mixtures. One broadcast
  join against the (group, rate) table; no shuffle of the data.

No reference-repo counterpart: the reference engine stops at indexing
and retrieval; this module is part of the LLM-training-pipeline
surface this repo adds on top.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType
from pyspark.storagelevel import StorageLevel

__all__ = ["select_by_token_budget", "sample_stratified", "pack_sequences"]


def select_by_token_budget(
    df: DataFrame,
    budget: int,
    score_col: str = "score",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    partitions: int | None = None,
) -> DataFrame:
    """Greedy best-score prefix under a token budget.

    Returns the input rows (original columns plus ``cum_tokens``) whose
    inclusive running token total — over docs ordered by
    (``score_col`` DESC, ``id_col`` ASC) — is <= ``budget``. Null
    token counts count as 0.
    """
    spark = df.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    key = [F.desc(score_col), F.asc(id_col)]
    ranged = (
        df.repartitionByRange(p, *key)
        .sortWithinPartitions(*key)
        .withColumn("__pid", F.spark_partition_id())
    )
    ranged.persist(StorageLevel.MEMORY_AND_DISK)

    sums = {
        r["__pid"]: r["t"]
        for r in ranged.groupBy("__pid")
        .agg(F.sum(F.coalesce(F.col(token_col), F.lit(0))).alias("t"))
        .collect()
    }
    offsets: dict[int, int] = {}
    run = 0
    for pid in sorted(sums):
        offsets[pid] = run
        run += int(sums[pid])

    # partitions that start past the budget can never contribute
    keep = [pid for pid, off in offsets.items() if off < budget]
    cols = [f.name for f in df.schema.fields]
    # fresh StructType: StructType.add mutates in place, and
    # DataFrame.schema is cached — never append to it directly
    out_schema = StructType(
        list(df.schema.fields) + [StructField("cum_tokens", LongType())]
    )

    def _scan(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run_local = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if run_local is None:
                run_local = offsets.get(int(pdf["__pid"].iloc[0]), 0)
            toks = pdf[token_col].fillna(0).to_numpy(np.int64)
            cum = toks.cumsum() + run_local
            run_local = int(cum[-1])
            out = pdf[cols].assign(cum_tokens=cum)
            yield out[out["cum_tokens"] <= budget]

    pruned = ranged.filter(F.col("__pid").isin(keep)) if keep else (
        ranged.limit(0)
    )
    return pruned.mapInPandas(_scan, schema=out_schema)


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    partitions: int | None = None,
) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing (Brown et al. 2020
    §2.3 / every causal-LM data loader): documents are concatenated in
    ``id_col`` order into one token stream, and the stream is cut into
    fixed ``seq_len`` windows; documents straddle window boundaries.

    Returns one row per (document, sequence it contributes to):
    ``(id_col, seq_id, tok_start, n_tok)`` — ``tok_start`` is the
    document's offset WITHIN sequence ``seq_id`` and ``n_tok`` how many
    of its tokens land there (a long doc spans several sequences; a
    window packs several short docs). Zero/null-token docs contribute
    nothing. Deterministic in the id order.

    Equivalent to the SQL single-window formulation
    ``SUM(tokens) OVER (ORDER BY id) - tokens AS stream_start`` +
    a per-doc series over the spanned windows — but a global ORDER BY
    window is a one-task funnel, so this reuses the distributed
    prefix-sum of :func:`select_by_token_budget`: one range exchange,
    a P-number driver cumsum, then a narrow Arrow pass that computes
    each doc's stream offset and emits its per-window spans via
    vectorized repeat (no per-row Python, no explode shuffle).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    spark = df.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    src = df.select(id_col, token_col).filter(
        F.coalesce(F.col(token_col), F.lit(0)) > 0
    )
    ranged = (
        src.repartitionByRange(p, F.asc(id_col))
        .sortWithinPartitions(F.asc(id_col))
        .withColumn("__pid", F.spark_partition_id())
    )
    ranged.persist(StorageLevel.MEMORY_AND_DISK)
    sums = {
        r["__pid"]: r["t"]
        for r in ranged.groupBy("__pid")
        .agg(F.sum(token_col).alias("t"))
        .collect()
    }
    offsets: dict[int, int] = {}
    run = 0
    for pid in sorted(sums):
        offsets[pid] = run
        run += int(sums[pid])

    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            id_field,
            StructField("seq_id", LongType()),
            StructField("tok_start", LongType()),
            StructField("n_tok", LongType()),
        ]
    )
    L = int(seq_len)

    def _spans(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run_local = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if run_local is None:
                run_local = offsets.get(int(pdf["__pid"].iloc[0]), 0)
            t = pdf[token_col].to_numpy(np.int64)
            end = t.cumsum() + run_local
            s = end - t  # exclusive stream start per doc
            run_local = int(end[-1])
            k0 = s // L
            k1 = (end - 1) // L
            nseq = (k1 - k0 + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(pdf), dtype=np.int64), nseq)
            # sequence index per emitted row: k0[doc] + rank within doc
            starts = np.concatenate(([0], np.cumsum(nseq)))[:-1]
            k = (
                np.arange(int(nseq.sum()), dtype=np.int64)
                - np.repeat(starts, nseq)
                + np.repeat(k0, nseq)
            )
            lo = np.maximum(np.repeat(s, nseq), k * L)
            hi = np.minimum(np.repeat(end, nseq), (k + 1) * L)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[idx],
                    "seq_id": k,
                    "tok_start": lo - k * L,
                    "n_tok": hi - lo,
                }
            )

    return ranged.mapInPandas(_spans, schema=out_schema)


def sample_stratified(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-group Bernoulli sample.

    A row of group g survives iff the first 8 hex digits of
    md5(id) — a uniform draw on [0, 16^8) — fall below
    ``floor(rates[g] * 16^8)``. Groups absent from ``rates`` use
    ``default_rate``. Pure codegen (md5 + string compare against a
    broadcast (group, threshold) table); re-running, re-partitioning,
    or re-ordering the input never changes the sample.
    """

    def _hex_threshold(rate: float) -> str:
        r = min(max(float(rate), 0.0), 1.0)
        return format(int(r * 16**8), "09x")

    spark = df.sparkSession
    thr = spark.createDataFrame(
        [(g, _hex_threshold(r)) for g, r in rates.items()],
        f"{group_col} string, __thr string",
    )
    draw = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    return (
        df.join(F.broadcast(thr), group_col, "left")
        .withColumn(
            "__thr", F.coalesce(F.col("__thr"), F.lit(_hex_threshold(default_rate)))
        )
        .filter(F.concat(F.lit("0"), draw) < F.col("__thr"))
        .drop("__thr")
    )
