"""Corpus sources.

* ``synthetic_code_corpus`` — deterministic generator for the
  north-rule input shape (repo, path, commit, lang, content [+ docid,
  content_sha], FIXTURES.md §1) built ENTIRELY from Column expressions
  over ``spark.range``: no driver-side data, no Python in the loop, so
  the same call generates 100 docs or 10^9 docs with linear scaling.
  Pseudo-randomness is ``xxhash64(seed, id, stream)`` — reproducible
  cluster-wide, independent of partitioning.
* ``load_documents`` — adapt the driver-provided testdata ``documents``
  table to the engine's (docid, content) shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

LANGS = ["python", "java", "cpp", "go", "js", "md"]
EXT = {"python": "py", "java": "java", "cpp": "cc", "go": "go", "js": "js", "md": "md"}
# injected df~N skew terms + analyzer-edge unicode tokens (FIXTURES.md §1)
SKEW_TERMS = ["the", "return", "import", "def", "value"]
UNICODE_TERMS = ["Δ1", "Å", "µm", "⁰c"]


def _u(seed: int, *cols) -> F.Column:
    """uniform [0,1) from xxhash64 — the deterministic PRNG stream."""
    h = F.xxhash64(F.lit(seed), *cols)
    return (F.pmod(h, F.lit(1 << 40))) / F.lit(float(1 << 40))


def synthetic_code_corpus(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    vocab_size: int = 50_000,
    min_tokens: int = 50,
    max_tokens: int = 5_000,
    partitions: int | None = None,
) -> DataFrame:
    """Generate the (repo, path, commit, lang, content, docid,
    content_sha) corpus table. Zipf-ish vocabulary via inverse-CDF
    rank = V^u (s~1), hot repos for partition skew, injected stopword
    terms with df ~ N, and rare unicode analyzer edge cases."""
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = spark.range(0, n_docs, 1, partitions)
    i = F.col("id")
    repo = F.format_string("org%d/repo%d", F.pmod(i, F.lit(7)), F.pmod(i, F.lit(23)))
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]),
        (F.pmod(F.xxhash64(F.lit(seed), i, F.lit("lang")), F.lit(6)) + 1).cast("int"),
    )
    ext = F.element_at(
        F.create_map(*[F.lit(x) for kv in EXT.items() for x in kv]), lang
    )
    path = F.format_string(
        "src/%s/m%d.%s",
        F.element_at(
            F.array(F.lit("core"), F.lit("util"), F.lit("api"), F.lit("io")),
            (F.pmod(F.xxhash64(F.lit(seed), i, F.lit("dir")), F.lit(4)) + 1).cast("int"),
        ),
        F.pmod(F.xxhash64(F.lit(seed), i, F.lit("file")), F.lit(1000)),
        ext,
    )
    commit = F.lower(F.hex(F.xxhash64(F.lit(seed), repo, path, F.lit("commit"))))

    n_tok = (
        F.lit(min_tokens)
        + F.pmod(
            F.xxhash64(F.lit(seed), i, F.lit("len")), F.lit(max_tokens - min_tokens + 1)
        )
    ).cast("int")
    # token k-th of doc i: Zipf rank = V^u; every ~40th slot a skew term,
    # every ~997th a unicode edge token
    tok = lambda k: (
        F.when(
            F.pmod(F.xxhash64(F.lit(seed), i, k, F.lit("skew")), F.lit(40)) == 0,
            F.element_at(
                F.array(*[F.lit(x) for x in SKEW_TERMS]),
                (F.pmod(F.xxhash64(F.lit(seed), i, k, F.lit("sw")), F.lit(len(SKEW_TERMS))) + 1).cast("int"),
            ),
        )
        .when(
            F.pmod(F.xxhash64(F.lit(seed), i, k, F.lit("skew")), F.lit(997)) == 1,
            F.element_at(
                F.array(*[F.lit(x) for x in UNICODE_TERMS]),
                (F.pmod(F.xxhash64(F.lit(seed), i, k, F.lit("ut")), F.lit(len(UNICODE_TERMS))) + 1).cast("int"),
            ),
        )
        .otherwise(
            F.format_string(
                "v%d",
                F.floor(
                    F.pow(F.lit(float(vocab_size)), _u(seed, i, k, F.lit("zipf")))
                ),
            )
        )
    )
    content = F.array_join(F.transform(F.sequence(F.lit(1), n_tok), tok), " ")

    out = base.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    ).withColumn(
        "docid", F.concat_ws("", F.col("repo"), F.lit(":"), F.col("path"), F.lit("@"), F.col("commit"))
    ).withColumn("content_sha", F.sha2(F.col("content"), 256))
    return out


def verify_content_sha(docs: DataFrame, text_col: str = "content", sha_col: str = "content_sha") -> int:
    """Per-row integrity invariant (BASELINE.json input_hint): recompute
    sha256(content) and count mismatches. 0 == intact."""
    return docs.filter(F.sha2(F.col(text_col), 256) != F.col(sha_col)).count()


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver testdata documents table -> engine (docid, content) shape."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("docid"),
        F.col("text").alias("content"),
        "lang",
        "source",
    )
