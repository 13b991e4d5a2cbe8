"""Reference-format export: byte-level round trip against the golden
pmc index (the r2 'decode direction is proven; close the loop' item).

The rebuild mints internal docids in ARRIVAL order (indexer4.cpp mints
docid_to_int as docs stream in; verified identical to the golden
docid_map.txt), so every per-term blob our encoder emits must be
byte-equal to the reference's postings.bin slice for that term — and
the exported lexicon offsets must slice our postings.bin back to those
exact bytes."""

import json
from pathlib import Path

from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_postings,
    term_bucket_col,
)
from large_scale_hypertextual_search_engine_spark.sources.cleaner import (
    cleaned_to_tokens,
)
from large_scale_hypertextual_search_engine_spark.sources.export import (
    export_reference_index,
)
from large_scale_hypertextual_search_engine_spark.sources.ingest import (
    read_cleaned_jsonl,
)

REF = Path("/root/reference")


def _parse_lexicon(path: Path) -> dict:
    lex = {}
    for line in path.read_text(encoding="utf-8").splitlines():
        p = line.split("\t")
        lex[p[1]] = {
            "word_id": int(p[0]),
            "df": int(p[2]),
            "tf": int(p[3]),
            "offset": int(p[4]),
            "bytes": int(p[5]),
            "skip_meta": json.loads(p[6]),
        }
    return lex


def _blobs(index_dir: Path) -> dict[str, bytes]:
    lex = _parse_lexicon(index_dir / "lexicon.txt")
    blob = (index_dir / "postings.bin").read_bytes()
    return {
        t: blob[e["offset"] : e["offset"] + e["bytes"]] for t, e in lex.items()
    }


def _golden_rebuild_index(spark):
    cleaned, corrupt = read_cleaned_jsonl(spark, str(REF / "cleaner3pmc.jsonl"))
    assert corrupt.count() == 0
    tokens = cleaned_to_tokens(cleaned)
    order = [
        json.loads(l)["docid"]
        for l in (REF / "cleaner3pmc.jsonl").read_text().splitlines()
        if l.strip()
    ]
    ids = spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(order)], "docid string, doc_int long"
    )
    toks = tokens.join(ids, "docid")
    postings = build_postings(
        toks.select("term", "doc_int", "positions", "doc_len"), len(order)
    ).withColumn("bucket_id", term_bucket_col(10))
    return {"postings": postings, "docid_map": ids}, order


def test_export_postings_bin_blob_bytes_match_reference(spark, tmp_path):
    index, order = _golden_rebuild_index(spark)
    out = tmp_path / "exp"
    stats = export_reference_index(index, str(out))

    ref = _blobs(REF / "index_dir4pmc")
    got = _blobs(out)
    assert set(got) == set(ref)
    assert stats["n_terms"] == len(ref) == 2569  # BASELINE.md lexicon count
    for term, rb in ref.items():
        assert got[term] == rb, term

    # lexicon df/tf columns and skip_meta agree with the reference's
    ref_lex = _parse_lexicon(REF / "index_dir4pmc" / "lexicon.txt")
    our_lex = _parse_lexicon(out / "lexicon.txt")
    for term, e in ref_lex.items():
        o = our_lex[term]
        assert (o["df"], o["tf"]) == (e["df"], e["tf"]), term
        assert o["skip_meta"] == e["skip_meta"], term

    # terms_list is term -> wordID, consistent with lexicon.txt
    tl = dict(
        l.rsplit("\t", 1)
        for l in (out / "terms_list.txt").read_text().splitlines()
    )
    assert all(int(tl[t]) == our_lex[t]["word_id"] for t in our_lex)

    # docid_map content matches the golden assignment
    dm = dict(
        l.rsplit("\t", 1)
        for l in (out / "docid_map.txt").read_text().splitlines()
    )
    ref_dm = dict(
        l.rsplit("\t", 1)
        for l in (REF / "index_dir4pmc" / "docid_map.txt").read_text().splitlines()
    )
    assert dm == ref_dm


def test_export_sharded_by_bucket_is_consistent(spark, tmp_path):
    """100 TB layout: one internally-consistent triplet per crc32
    barrel; union of shard blobs == the reference's blobs."""
    index, _ = _golden_rebuild_index(spark)
    out = tmp_path / "sharded"
    stats = export_reference_index(index, str(out), shard_by_bucket=True)
    assert stats["shards"] >= 2

    ref = _blobs(REF / "index_dir4pmc")
    got = {}
    for sub in out.glob("bucket=*"):
        part = _blobs(sub)
        assert not (set(part) & set(got))  # disjoint term sets
        got.update(part)
    assert got == ref


def test_export_forward_index_semantics_match_reference(spark, tmp_path):
    """forward_index.jsonl: wordIDs differ (ours are term-ascending, the
    reference's are merge-heap order) so compare through each side's
    terms_list: per docid, {term: (freq, positions)} must be equal."""
    from large_scale_hypertextual_search_engine_spark.operators.index_build import (
        forward_index_frame,
    )
    from large_scale_hypertextual_search_engine_spark.operators.ids import (
        assign_dense_ids,
    )

    index, order = _golden_rebuild_index(spark)
    cleaned, _c = read_cleaned_jsonl(spark, str(REF / "cleaner3pmc.jsonl"))
    tokens = cleaned_to_tokens(cleaned).join(index["docid_map"], "docid")
    lexicon = assign_dense_ids(
        index["postings"].select("term"), "term", "term_id"
    )
    index["forward_index_ids"] = forward_index_frame(
        tokens, lexicon, id_cols=("docid", "doc_int")
    )
    out = tmp_path / "fwd"
    export_reference_index(index, str(out))

    def load_fwd(jsonl: Path, terms_list: Path):
        id2t = {}
        for l in terms_list.read_text(encoding="utf-8").splitlines():
            t, wid = l.rsplit("\t", 1)
            id2t[int(wid)] = t
        docs = {}
        for l in jsonl.read_text(encoding="utf-8").splitlines():
            d = json.loads(l)
            docs[d["docid"]] = {
                id2t[p["wordid"]]: (p["freq"], p["positions"])
                for p in d["postings"]
            }
        return docs

    ref = load_fwd(
        REF / "index_dir4pmc" / "forward_index.jsonl",
        REF / "index_dir4pmc" / "terms_list.txt",
    )
    got = load_fwd(out / "forward_index.jsonl", out / "terms_list.txt")
    assert set(got) == set(ref) == set(order)
    for docid in ref:
        assert got[docid] == ref[docid], docid


def test_export_sharded_wordids_are_global(spark, tmp_path):
    """Shard-mode lexicons must carry GLOBAL wordIDs (equal to the
    whole-index export's term-ascending ids), not a per-shard restart —
    otherwise cross-references against the top-level
    forward_index.jsonl (always global term_ids) break."""
    index, _ = _golden_rebuild_index(spark)
    whole = tmp_path / "whole"
    sharded = tmp_path / "sharded"
    export_reference_index(index, str(whole))
    export_reference_index(index, str(sharded), shard_by_bucket=True)

    whole_lex = _parse_lexicon(whole / "lexicon.txt")
    shard_lex = {}
    for sub in sharded.glob("bucket=*"):
        part = _parse_lexicon(sub / "lexicon.txt")
        assert not (set(part) & set(shard_lex))
        shard_lex.update(part)
    assert set(shard_lex) == set(whole_lex)
    for term, e in whole_lex.items():
        assert shard_lex[term]["word_id"] == e["word_id"], term
        # terms_list in each shard agrees with its lexicon
    for sub in sharded.glob("bucket=*"):
        part = _parse_lexicon(sub / "lexicon.txt")
        tl = dict(
            l.rsplit("\t", 1)
            for l in (sub / "terms_list.txt").read_text().splitlines()
        )
        assert all(int(tl[t]) == part[t]["word_id"] for t in part)


def test_export_forward_index_doc_int_only_frame(spark, tmp_path):
    """build_index's default forward_index_frame carries only doc_int
    (no original docid); export must fall back to doc_int for the
    emitted docid instead of crashing (round-3 ADVICE item)."""
    from large_scale_hypertextual_search_engine_spark.operators.index_build import (
        forward_index_frame,
    )
    from large_scale_hypertextual_search_engine_spark.operators.ids import (
        assign_dense_ids,
    )

    index, order = _golden_rebuild_index(spark)
    cleaned, _c = read_cleaned_jsonl(spark, str(REF / "cleaner3pmc.jsonl"))
    tokens = cleaned_to_tokens(cleaned).join(index["docid_map"], "docid")
    lexicon = assign_dense_ids(
        index["postings"].select("term"), "term", "term_id"
    )
    # default id_cols=("doc_int",): no docid column in the frame
    index["forward_index_ids"] = forward_index_frame(tokens, lexicon)
    assert "docid" not in index["forward_index_ids"].columns
    out = tmp_path / "fwd_int"
    export_reference_index(index, str(out))

    lines = (out / "forward_index.jsonl").read_text().splitlines()
    assert len(lines) == len(order)
    docids = [json.loads(l)["docid"] for l in lines]
    # doc_int is minted 1..n in arrival order; export sorts by it
    assert docids == [str(i + 1) for i in range(len(order))]
