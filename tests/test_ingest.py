"""Reference intermediate-file ingest (S3/S4/S5): golden TSV and
cleaned.jsonl enter the Spark pipeline mid-stream and reproduce the
golden index."""

import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.sources.cleaner import (
    cleaned_to_tokens,
)
from large_scale_hypertextual_search_engine_spark.sources.ingest import (
    CLEANED_SCHEMA,
    read_cleaned_jsonl,
    read_extracted_tsv,
    read_jsonl_permissive,
    split_corrupt,
)
from golden_utils import REF, load_golden_index, read_tsv_rows


@pytest.mark.parametrize("name", ["out.tsv", "outpmc.tsv"])
def test_tsv_ingest_matches_reference_parse(spark, name):
    """Spark TSV scan == the reference's pad-missing-cols parse, row by
    row — including the malformed 6-col row of out.tsv (quirk Q11)."""
    oracle = read_tsv_rows(REF / name)
    got = [
        [r[i] for i in range(8)]
        for r in read_extracted_tsv(spark, str(REF / name))
        .orderBy("paper_id")
        .collect()
    ]
    assert sorted(got) == sorted(oracle)
    assert len(got) == 6


def test_jsonl_permissive_counts_corrupt(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"docid": "a", "fields": [], "meta": null}\n'
        "THIS IS NOT JSON\n"
        '{"docid": "b", "fields": [], "meta": null}\n'
        '{"docid": "c", "fields": [}\n'
    )
    clean, corrupt = split_corrupt(
        read_jsonl_permissive(spark, str(p), CLEANED_SCHEMA)
    )
    assert sorted(r["docid"] for r in clean.collect()) == ["a", "b"]
    assert corrupt.count() == 2


def test_reference_cleaned_jsonl_reproduces_golden_index(spark):
    """S5 end-to-end: the REFERENCE's own cleaner3pmc.jsonl, read back
    through Spark, must rebuild per-term {df, tf, docid->positions}
    identical to the golden pmc index — the mid-stream restart the
    reference gets from its file-per-stage design."""
    from large_scale_hypertextual_search_engine_spark.functions.varbyte import (
        decode_postings,
    )
    from large_scale_hypertextual_search_engine_spark.operators.ids import (
        assign_dense_ids,
    )
    from large_scale_hypertextual_search_engine_spark.operators.index_build import (
        build_postings,
    )

    cleaned, corrupt = read_cleaned_jsonl(spark, str(REF / "cleaner3pmc.jsonl"))
    assert corrupt.count() == 0
    tokens = cleaned_to_tokens(cleaned)
    ids = assign_dense_ids(tokens.select("docid").distinct(), "docid", "doc_int")
    tokens = tokens.join(ids, "docid")
    n_docs = ids.count()
    built = build_postings(
        tokens.select("term", "doc_int", "positions", "doc_len"), n_docs,
        salt_buckets=2,
    ).collect()
    int_to_doc = {r["doc_int"]: r["docid"] for r in ids.collect()}

    lex, _docmap, golden = load_golden_index(REF / "index_dir4pmc")
    got = {}
    for r in built:
        docids, tfs, flat = decode_postings(bytes(r["postings"]))
        per = {}
        k = 0
        for d, tf in zip(docids, tfs):
            per[int_to_doc[int(d)]] = [int(x) for x in flat[k : k + tf]]
            k += tf
        got[r["term"]] = (r["df"], r["tf"], per)
    assert set(got) == set(lex)
    for term, e in lex.items():
        df, tf, per = got[term]
        assert df == e["df"] and tf == e["tf"], term
        assert per == golden[term], term


def test_tsv_sink_roundtrip(spark, tmp_path):
    """K1: write_extracted_tsv emits reference-verbatim rows (no csv
    quoting) — reading golden TSV and re-writing round-trips exactly."""
    from large_scale_hypertextual_search_engine_spark.sources.ingest import (
        write_extracted_tsv,
    )

    src = read_extracted_tsv(spark, str(REF / "outpmc.tsv"))
    out = str(tmp_path / "o.tsv")
    write_extracted_tsv(src, out)
    back = read_extracted_tsv(spark, out)
    a = sorted(tuple(r) for r in src.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b and len(a) == 6
    # verbatim lines match the golden file's well-formed rows
    golden = sorted(
        l for l in (REF / "outpmc.tsv").read_text(encoding="utf-8").splitlines() if l
    )
    written = sorted(r["value"] for r in spark.read.text(out).collect())
    assert written == golden


def test_build_and_save_index_from_tokens_resume_and_search(spark, tmp_path):
    """The S5 mid-stream CLI path: cleaned.jsonl -> resumable saved
    index -> load_index -> BM25 search, with stage-skip on re-run."""
    from large_scale_hypertextual_search_engine_spark.operators.query import search
    from large_scale_hypertextual_search_engine_spark.plans.lineage import (
        build_and_save_index_from_tokens, load_index, stage_meta,
    )

    cleaned, corrupt = read_cleaned_jsonl(spark, str(REF / "cleaner3.jsonl"))
    assert corrupt.count() == 0
    tokens = cleaned_to_tokens(cleaned)
    out = str(tmp_path / "idx")
    build_and_save_index_from_tokens(tokens, out, "fp1", salt_buckets=2)
    meta1 = stage_meta(f"{out}/postings")
    assert meta1["committed"] and meta1["fingerprint"] == "fp1"

    idx = load_index(spark, out)
    hits = search(idx, ["immun"], top_k=5, mode="and", tf_mode="true").collect()
    assert hits and all(r["score"] > 0 for r in hits)

    # identical fingerprint -> every stage resumes (wall times ~0)
    build_and_save_index_from_tokens(tokens, out, "fp1", salt_buckets=2)
    meta2 = stage_meta(f"{out}/postings")
    assert meta2["wall_ms"] == meta1["wall_ms"]
