"""Cleaner stage: extracted 8-col frame -> per-field token streams.

Spark rebuild of the reference cleaner CLI (cleaner3.cpp:465-738,
SURVEY.md §3.1 process 2): each document's title/abstract/sections are
analyzed per field with the reference-exact analyzer; sections are
split on ``" | "`` with the ``Name:``-prefix rule (P11/P12). Output
matches the ``cleaned.jsonl`` shape:

  docid, fields: array<struct<name, tokens: array<struct<term, pos,
  orig>>>>, meta: struct<authors, pub_date, source>

The whole stage is one narrow Arrow pass (a single pandas UDF per doc
row — fields are tokenized together to amortize batch overhead).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..analysis.tokenizer import split_sections, tokenize_compat

FIELDS_SCHEMA = ArrayType(
    StructType(
        [
            StructField("name", StringType()),
            StructField(
                "tokens",
                ArrayType(
                    StructType(
                        [
                            StructField("term", StringType()),
                            StructField("pos", IntegerType()),
                            StructField("orig", StringType()),
                        ]
                    )
                ),
            ),
        ]
    )
)


def clean_documents(
    extracted: DataFrame,
    *,
    stem: bool = True,
    stopwords: frozenset[str] | None = None,
    remove_numbers: bool = False,
    keep_original: bool = True,
    fields: tuple[str, ...] = ("title", "abstract", "sections"),
) -> DataFrame:
    """8-col extracted frame -> cleaned per-field token streams."""

    def _clean(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_fields = []
            for title, abstract, sections in zip(
                pdf["title"], pdf["abstract"], pdf["sections"]
            ):
                doc_fields: list[tuple[str, str]] = []
                for f in fields:
                    if f == "title":
                        doc_fields.append(("title", title or ""))
                    elif f == "abstract":
                        doc_fields.append(("abstract", abstract or ""))
                    elif f in ("sections", "body"):
                        doc_fields.extend(split_sections(sections or ""))
                out_fields.append(
                    [
                        (
                            name,
                            [
                                (t.term, t.pos, t.orig)
                                for t in tokenize_compat(
                                    text,
                                    stem=stem,
                                    stopwords=stopwords,
                                    remove_numbers=remove_numbers,
                                    keep_original=keep_original,
                                )
                            ],
                        )
                        for name, text in doc_fields
                    ]
                )
            pdf = pdf.copy()
            pdf["fields"] = out_fields
            yield pdf[["paper_id", "fields", "authors", "pub_date", "source"]]

    schema = StructType(
        [
            StructField("paper_id", StringType()),
            StructField("fields", FIELDS_SCHEMA),
            StructField("authors", StringType()),
            StructField("pub_date", StringType()),
            StructField("source", StringType()),
        ]
    )
    cleaned = extracted.mapInPandas(_clean, schema)
    return cleaned.select(
        F.col("paper_id").alias("docid"),
        "fields",
        F.struct("authors", "pub_date", "source").alias("meta"),
    )


def cleaned_to_tokens(cleaned: DataFrame) -> DataFrame:
    """cleaned frame -> (docid, term, positions, tf, doc_len) with the
    reference indexer's cross-field position merge (quirk Q12:
    positions restart per field; the per-doc bag keeps collisions)."""
    toks = cleaned.select(
        "docid",
        F.explode("fields").alias("f"),
    ).select("docid", F.explode("f.tokens").alias("t"))
    per_term = toks.groupBy("docid", F.col("t.term").alias("term")).agg(
        F.sort_array(F.collect_list("t.pos")).alias("positions"),
        F.count("*").alias("tf"),
    )
    doc_len = toks.groupBy("docid").agg(F.count("*").alias("doc_len"))
    return per_term.join(doc_len, "docid")


def cleaned_jsonl_sink(cleaned: DataFrame, path: str) -> None:
    """K2: cleaned.jsonl-shaped JSON lines output."""
    cleaned.select(F.to_json(F.struct("docid", "fields", "meta")).alias("value")) \
        .write.mode("overwrite").text(path)
