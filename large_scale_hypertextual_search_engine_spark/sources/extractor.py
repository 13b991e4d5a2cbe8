"""CORD-19/S2ORC-style JSON -> 8-column document frame, fully declarative.

Spark rebuild of the reference extractor (extractor.cpp:225-376): every
field derivation (P1-P10 in SURVEY.md §2.2) is a Catalyst expression —
higher-order array functions for author joining, abstract fallbacks and
the first-seen-order section grouping — so the whole stage is one
narrow, codegen'd projection over ``spark.read.json(multiLine=True)``.
Parity is asserted against the golden ``out.tsv`` / ``outpmc.tsv`` in
tests/test_extractor.py.

Output columns: paper_id, title, abstract, sections (" | "-joined
"Name: text"), authors, pub_date, doi_or_id, source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    MapType,
    StringType,
    StructField,
    StructType,
)

_AUTHOR = StructType(
    [
        StructField("first", StringType()),
        StructField("middle", ArrayType(StringType())),
        StructField("last", StringType()),
        StructField("name", StringType()),
        StructField("email", StringType()),
    ]
)

_TEXT_BLOCK = StructType(
    [StructField("text", StringType()), StructField("section", StringType())]
)

_BIB = StructType(
    [
        StructField("year", StringType()),
        StructField("other_ids", MapType(StringType(), ArrayType(StringType()))),
    ]
)

CORD19_SCHEMA = StructType(
    [
        StructField("paper_id", StringType()),
        StructField(
            "metadata",
            StructType(
                [
                    StructField("title", StringType()),
                    StructField("authors", ArrayType(_AUTHOR)),
                    StructField("doi", StringType()),
                    StructField(
                        "other_ids", MapType(StringType(), ArrayType(StringType()))
                    ),
                    StructField("publish_time", StringType()),
                    StructField("publish_date", StringType()),
                    StructField("year", StringType()),
                    StructField("paper_id", StringType()),
                ]
            ),
        ),
        StructField("title", StringType()),
        StructField("abstract", ArrayType(_TEXT_BLOCK)),
        StructField("body_text", ArrayType(_TEXT_BLOCK)),
        StructField("bib_entries", MapType(StringType(), _BIB)),
    ]
)


def _norm(c: Column) -> Column:
    """normalize_whitespace (extractor.cpp:24-36): delete \\r, collapse
    C-locale space runs to one space, trim."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(c, "\r", ""), "[ \t\n]+", " "
        )
    )


def _sanitize(c: Column) -> Column:
    """sanitize_for_field (extractor.cpp:38-42): tab/NL/CR -> space then
    normalize (so \\r becomes a space here, unlike _norm)."""
    return _norm(F.regexp_replace(c, "[\t\n\r]", " "))


def _nz(c: Column) -> Column:
    return F.nullif(c, F.lit(""))


def _author_name(a: Column) -> Column:
    parts = F.concat_ws(
        " ",
        _nz(F.coalesce(a["first"], F.lit(""))),
        _nz(F.array_join(F.coalesce(a["middle"], F.array()), " ")),
        _nz(F.coalesce(a["last"], F.lit(""))),
    )
    return F.coalesce(
        _nz(parts), _nz(F.coalesce(a["name"], F.lit(""))),
        _nz(F.coalesce(a["email"], F.lit(""))), F.lit("")
    )


def _abstract_expr() -> Column:
    direct = F.array_join(
        F.transform(
            F.coalesce(F.col("abstract"), F.array()), lambda el: F.coalesce(el["text"], F.lit(""))
        ),
        " ",
    )
    from_body = F.array_join(
        F.transform(
            F.filter(
                F.coalesce(F.col("body_text"), F.array()),
                lambda b: F.coalesce(b["section"], F.lit("")).isin(
                    "Abstract", "ABSTRACT", "abstract"
                )
                & b["text"].isNotNull(),
            ),
            lambda b: b["text"],
        ),
        " ",
    )
    return F.coalesce(_nz(_norm(direct)), _nz(_norm(from_body)), F.lit(""))


def _sections_expr() -> Column:
    """First-seen-order section grouping (extract_sections,
    extractor.cpp:145-173): group body_text by section name (raw name if
    trim non-empty else "Body"), skip empty-normalized texts, join each
    group's texts, emit normalize("Name: joined"). Falls back to one
    "Body: all text" section when grouping yields nothing."""
    blocks = F.filter(
        F.transform(
            F.coalesce(F.col("body_text"), F.array()),
            lambda b: F.struct(
                F.when(
                    F.trim(F.coalesce(b["section"], F.lit(""))) != "",
                    b["section"],
                )
                .otherwise(F.lit("Body"))
                .alias("name"),
                _norm(F.coalesce(b["text"], F.lit(""))).alias("text"),
            ),
        ),
        lambda s: s["text"] != "",
    )
    names = F.array_distinct(F.transform(blocks, lambda s: s["name"]))
    grouped = F.transform(
        names,
        lambda name: _norm(
            F.concat(
                name,
                F.lit(": "),
                F.array_join(
                    F.transform(
                        F.filter(blocks, lambda s: s["name"] == name),
                        lambda s: s["text"],
                    ),
                    " ",  # "\n\n" in the reference, collapsed by _norm anyway
                ),
            )
        ),
    )
    fallback = F.when(
        F.size(
            F.filter(
                F.coalesce(F.col("body_text"), F.array()),
                lambda b: b["text"].isNotNull(),
            )
        )
        > 0,
        F.array(
            F.concat(
                F.lit("Body: "),
                _norm(
                    F.array_join(
                        F.transform(
                            F.filter(
                                F.coalesce(F.col("body_text"), F.array()),
                                lambda b: b["text"].isNotNull(),
                            ),
                            lambda b: b["text"],
                        ),
                        " ",
                    )
                ),
            )
        ),
    ).otherwise(F.array())
    return F.when(F.size(grouped) > 0, grouped).otherwise(fallback)


def _first_bib(field: Column) -> Column:
    """First non-null value over bib_entries in document order (the
    reference iterates members in insertion order; from_json preserves
    JSON object order in map_entries)."""
    return F.get(F.filter(field, lambda x: x.isNotNull() & (x != "")), 0)


def _doi_expr() -> Column:
    meta_doi = _nz(F.coalesce(F.col("metadata.doi"), F.lit("")))
    other = _nz(
        F.coalesce(F.get(F.col("metadata.other_ids")["DOI"], 0), F.lit(""))
    )
    bib = _first_bib(
        F.transform(
            F.map_values(F.coalesce(F.col("bib_entries"), F.create_map())),
            lambda be: F.coalesce(F.get(be["other_ids"]["DOI"], 0), F.lit("")),
        )
    )
    return F.coalesce(meta_doi, other, bib, F.lit(""))


def _pub_date_expr() -> Column:
    bib_year = _first_bib(
        F.transform(
            F.map_values(F.coalesce(F.col("bib_entries"), F.create_map())),
            lambda be: F.coalesce(be["year"], F.lit("")),
        )
    )
    return F.coalesce(
        _nz(F.coalesce(F.col("metadata.publish_time"), F.lit(""))),
        _nz(F.coalesce(F.col("metadata.publish_date"), F.lit(""))),
        _nz(F.coalesce(F.col("metadata.year"), F.lit(""))),
        bib_year,
        F.lit(""),
    )


def extract(raw: DataFrame, file_stem: Column | None = None) -> DataFrame:
    """Parsed CORD-19 JSON frame -> 8-column extracted frame."""
    paper_id = F.coalesce(
        _nz(F.coalesce(F.col("paper_id"), F.lit(""))),
        _nz(F.coalesce(F.col("metadata.paper_id"), F.lit(""))),
        file_stem if file_stem is not None else F.lit(""),
        F.lit(""),
    )
    authors = F.array_join(
        F.filter(
            F.transform(
                F.coalesce(F.col("metadata.authors"), F.array()), _author_name
            ),
            lambda n: n != "",
        ),
        "; ",
    )
    sections_joined = F.array_join(
        F.transform(_sections_expr(), _sanitize), " | "
    )
    title = _sanitize(
        F.coalesce(
            _nz(F.coalesce(F.col("metadata.title"), F.lit(""))),
            _nz(F.coalesce(F.col("title"), F.lit(""))),
            F.lit(""),
        )
    )
    doi = _doi_expr()
    return raw.select(
        _sanitize(paper_id).alias("paper_id"),
        title.alias("title"),
        _sanitize(_abstract_expr()).alias("abstract"),
        sections_joined.alias("sections"),
        _sanitize(authors).alias("authors"),
        _sanitize(_pub_date_expr()).alias("pub_date"),
        _sanitize(F.coalesce(_nz(doi), paper_id)).alias("doi_or_id"),
        F.when(paper_id.startswith("PMC"), F.lit("pmc"))
        .otherwise(F.lit("pdf"))
        .alias("source"),
    )


def extract_dir(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of per-doc JSON files and extract (S1+S2+P1-P10).

    multiLine JSON -> one row per file; the filename stem is the
    paper_id fallback (extractor.cpp:283-286)."""
    raw = (
        spark.read.schema(CORD19_SCHEMA)
        .option("multiLine", "true")
        .option("pathGlobFilter", "*.json")
        .json(path)
        .withColumn("__file", F.input_file_name())
    )
    stem = F.regexp_extract(F.col("__file"), r"([^/]+?)(\.xml)?\.json$", 1)
    return extract(raw, file_stem=_nz(stem))
