"""Faceted search: per-facet value counts over a query's match set.

The reference returns a bare docid list per query (Query-engine.hpp:
275-374) — no aggregation over results at all. Faceting ("refine by
language / source / year") is the first thing a search UI adds on top;
this operator computes it engine-side so the UI never pulls the match
set.

Plan shape: ONE membership pass (the same candidate pipeline as
``query.search``, full match set — facet counts over a top-k cut would
be wrong), one join against the facet table on doc_int, then ALL facet
columns melt into (facet, value) rows via an ``explode(array(struct))``
— so N facet dimensions cost ONE aggregation shuffle, not N jobs. The
count aggregate combines map-side; a degenerate facet (every doc its
own value) degrades to the match-set size, never to a hot key.

At 100 TB the facet table is the corpus-metadata table: the join is
doc_int-keyed on both sides and AQE picks the strategy; the melted
frame carries 2 small strings per (doc, facet) — the match set rides
the wire once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.bm25 import B, K1

__all__ = ["search_facets", "histogram_facet", "range_facet", "stats_facet", "cardinality_facet", "percentiles_facet"]


def search_facets(
    index: dict[str, DataFrame],
    terms: list[str],
    facets: DataFrame,
    facet_cols: list[str],
    mode: str = "and",
    tf_mode: str = "true",
    top_n: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """-> (facet, value, n_docs, rank): for each facet column, the
    ``top_n`` values by match count (count desc, value asc), counted
    over the FULL match set of the query.

    ``facets``: a DataFrame keyed by ``doc_int`` or ``docid`` carrying
    the facet columns (any type; values are counted as strings, NULL
    becomes the literal bucket "(none)" so missing metadata is visible
    rather than silently dropped).
    """
    if not facet_cols:
        raise ValueError("facet_cols must be non-empty")
    from .query import match_docs

    if "doc_int" not in facets.columns:
        facets = facets.withColumn(
            "docid", F.col("docid").cast("string")
        ).join(index["docid_map"], "docid")
    # match_docs, NOT search: the full match set must never cross a
    # single-partition rank window just to be counted (the counts don't
    # use ranks) — membership aggregates under the natural distributed
    # groupBy(doc_int) exchange, plan-asserted in tests/test_plans.py
    hits = match_docs(
        index, terms, mode=mode, tf_mode=tf_mode, k1=k1, b=b
    ).select("doc_int")

    melted = (
        hits.join(facets.select("doc_int", *facet_cols), "doc_int")
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("facet"),
                            F.coalesce(
                                F.col(c).cast("string"), F.lit("(none)")
                            ).alias("value"),
                        )
                        for c in facet_cols
                    ]
                )
            ).alias("fv")
        )
        .select("fv.facet", "fv.value")
    )
    counts = melted.groupBy("facet", "value").agg(
        F.count("*").alias("n_docs")
    )
    w = Window.partitionBy("facet").orderBy(
        F.desc("n_docs"), F.asc("value")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("facet", "value", "n_docs", F.col("rank").cast("int").alias("rank"))
    )


def _match_values(
    index: dict[str, DataFrame],
    terms: list[str],
    values: DataFrame,
    value_col: str,
    mode: str,
    tf_mode: str,
    k1: float,
    b: float,
) -> DataFrame:
    """Match set joined to one numeric metadata column -> (doc_int,
    value). Shared by the histogram and range facets; docs with NULL
    metadata are dropped (the Elasticsearch default for numeric aggs —
    unlike the string facets' "(none)" bucket, a NULL has no place on
    a number line)."""
    from .query import match_docs

    if "doc_int" not in values.columns:
        values = values.withColumn(
            "docid", F.col("docid").cast("string")
        ).join(index["docid_map"], "docid")
    hits = match_docs(
        index, terms, mode=mode, tf_mode=tf_mode, k1=k1, b=b
    ).select("doc_int")
    return (
        hits.join(
            values.select(
                "doc_int", F.col(value_col).cast("double").alias("value")
            ),
            "doc_int",
        )
        .filter(F.col("value").isNotNull())
    )


def histogram_facet(
    index: dict[str, DataFrame],
    terms: list[str],
    values: DataFrame,
    value_col: str,
    interval: float,
    mode: str = "and",
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Elasticsearch ``histogram`` agg over the match set ->
    (bucket_start, n_docs), bucket_start = floor(value/interval)·
    interval, empty buckets omitted, ascending. ONE map-side-combining
    aggregation shuffle over the match set; the bucketing expression
    is codegen, a degenerate distribution degrades to one bucket row
    per partition pre-combine, never a hot-key sort."""
    if interval <= 0:
        raise ValueError("interval must be positive")
    g = _match_values(index, terms, values, value_col, mode, tf_mode, k1, b)
    return (
        g.withColumn(
            "bucket_start",
            F.floor(F.col("value") / F.lit(float(interval)))
            * F.lit(float(interval)),
        )
        .groupBy("bucket_start")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("bucket_start")
    )


def range_facet(
    index: dict[str, DataFrame],
    terms: list[str],
    values: DataFrame,
    value_col: str,
    edges: list[float],
    mode: str = "and",
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Elasticsearch ``range`` agg: explicit half-open buckets
    [e0,e1), [e1,e2), ... plus the open tails (-inf,e0) and
    [e_last,+inf) -> (range_lo, range_hi, n_docs) with NULL for the
    open ends; ALL ranges emitted (zero counts included — a range agg
    is a fixed report shape, unlike a histogram). The bucket lookup is
    one codegen CASE chain; the zero-fill joins the tiny static range
    frame against the aggregated counts, never the match set."""
    if sorted(edges) != list(edges) or len(set(edges)) != len(edges):
        raise ValueError("edges must be strictly ascending")
    if not edges:
        raise ValueError("edges must be non-empty")
    g = _match_values(index, terms, values, value_col, mode, tf_mode, k1, b)
    ex = [float(e) for e in edges]
    bounds = (
        [(None, ex[0])]
        + [(ex[i], ex[i + 1]) for i in range(len(ex) - 1)]
        + [(ex[-1], None)]
    )
    bucket = F.when(F.col("value") < ex[0], F.lit(0))
    for i in range(1, len(ex)):
        bucket = bucket.when(F.col("value") < ex[i], F.lit(i))
    bucket = bucket.otherwise(F.lit(len(ex)))
    counts = (
        g.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"))
    )
    spark = values.sparkSession
    ranges = spark.createDataFrame(
        [(i, lo, hi) for i, (lo, hi) in enumerate(bounds)],
        "bucket int, range_lo double, range_hi double",
    )
    return (
        F.broadcast(ranges)
        .join(counts, "bucket", "left")
        .select(
            "range_lo",
            "range_hi",
            F.coalesce(F.col("n_docs"), F.lit(0)).alias("n_docs"),
            "bucket",
        )
        .orderBy("bucket")
        .drop("bucket")
    )


def stats_facet(
    index: dict[str, DataFrame],
    terms: list[str],
    values: DataFrame,
    value_col: str,
    mode: str = "and",
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Elasticsearch ``stats``/``extended_stats`` agg: ONE row
    (n_docs, min, max, sum, avg, std) of a numeric metadata column
    over the match set (std = sample standard deviation, NULL when
    n < 2). NULL metadata drops like the other numeric aggs. The
    whole statistic is one map-side-combining global aggregate — six
    scalars cross the wire per partition, nothing else."""
    g = _match_values(index, terms, values, value_col, mode, tf_mode, k1, b)
    return g.agg(
        F.count("*").alias("n_docs"),
        F.min("value").alias("min"),
        F.max("value").alias("max"),
        F.sum("value").alias("sum"),
        F.avg("value").alias("avg"),
        F.stddev_samp("value").alias("std"),
    )


def cardinality_facet(
    index: dict[str, DataFrame],
    terms: list[str] | DataFrame,
    values: DataFrame,
    value_col: str,
    approx: bool = False,
    rsd: float = 0.05,
    mode: str = "and",
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Elasticsearch ``cardinality`` agg: ONE row (n_distinct) — how
    many distinct values of a metadata column the match set touches.
    ``approx=True`` switches to Spark's HyperLogLog++
    (``approx_count_distinct``, relative error ``rsd``) — at 100 TB
    the exact count's distinct-shuffle moves every unique value once,
    while the HLL sketch is a few KB per partition merged on the
    driver path; same plan shape as ES's own cardinality agg. NULLs
    are not values (dropped, both variants)."""
    g = _match_values(index, terms, values, value_col, mode, tf_mode, k1, b)
    agg = (
        F.approx_count_distinct("value", rsd)
        if approx
        else F.countDistinct("value")
    )
    return g.agg(agg.alias("n_distinct"))


def percentiles_facet(
    index: dict[str, DataFrame],
    terms: list[str] | DataFrame,
    values: DataFrame,
    value_col: str,
    percentiles: list[float] = (0.25, 0.5, 0.75, 0.95, 0.99),
    approx: bool = False,
    accuracy: int = 10000,
    mode: str = "and",
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Elasticsearch ``percentiles`` agg -> one row per requested
    percentile (p, value), linear-interpolated (SQL ``percentile``
    semantics). ``approx=True`` uses ``percentile_approx`` (t-digest
    style, ``accuracy`` knob) — the 100 TB default: the exact path
    sorts the match set's values inside one aggregation buffer, the
    sketch keeps a bounded summary per partition. NULLs drop."""
    ps = [float(p) for p in percentiles]
    if not ps or any(not (0.0 <= p <= 1.0) for p in ps):
        raise ValueError("percentiles must be in [0, 1]")
    g = _match_values(index, terms, values, value_col, mode, tf_mode, k1, b)
    arr = F.array(*[F.lit(p) for p in ps])
    agg = (
        F.percentile_approx("value", arr, F.lit(int(accuracy)))
        if approx
        else F.percentile("value", arr)
    )
    row = g.agg(agg.alias("vals"))
    pframe = values.sparkSession.createDataFrame(
        [(i, p) for i, p in enumerate(ps)], "i int, p double"
    )
    return (
        F.broadcast(pframe)
        .join(row)
        .select("p", F.element_at(F.col("vals"), F.col("i") + 1).alias("value"))
        .orderBy("p")
    )
