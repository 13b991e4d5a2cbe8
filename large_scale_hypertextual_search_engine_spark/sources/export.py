"""Reference-format on-disk artifact export (K5/K6/K7 closing the loop).

Writes the exact file set a consumer of the reference engine reads
(indexer4.cpp:304-360 lexicon/terms_list/postings.bin layouts,
:537-544 docid_map, :381-442 forward_index.jsonl):

    lexicon.txt        wordID\\tterm\\tdf\\ttf\\toffset\\tbytes\\tskip_meta
    terms_list.txt     term\\twordID
    docid_map.txt      original_docid\\tinternal_id
    postings.bin       concatenated per-term delta+varbyte blobs
    forward_index.jsonl  {"docid":..., "postings":[{"wordid","freq","positions"}]}

The per-term blob bytes are our ``postings`` column verbatim — the
same encoding the golden-blob tests prove byte-identical to the
reference codec — so this module only sequences blobs and records
offsets. Emission order is term-ascending (our term_id order); the
reference's own order is its block-merge heap order, so whole-file
offsets differ while every term's blob contents are byte-equal
(asserted in tests/test_export.py against index_dir4pmc).

Scale note: these artifacts ARE single-file by the reference's design,
so the writers stream ``toLocalIterator`` term-by-term (bounded driver
memory, one partition in flight). For a 100 TB index you would export
per-bucket shards (one postings.bin per barrel directory, offsets
local to the shard) — ``export_reference_index(..., shard_by_bucket=
True)`` does exactly that, writing ``bucket=N/`` subdirectories each
internally consistent.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, functions as F


def _sanitize(term: str) -> str:
    # reference: indexer4.cpp:347-348 maps \t \n \r to ' ' in lexicon.txt
    return term.replace("\t", " ").replace("\n", " ").replace("\r", " ")


def _write_postings_and_lexicon(
    postings: DataFrame, outdir: Path, skip_interval: int,
    use_global_ids: bool = False,
) -> int:
    """Stream term-sorted (term, df, tf, postings) into postings.bin,
    recording lexicon.txt/terms_list.txt rows as offsets accumulate.
    Returns the number of terms written.

    wordID column: by default a 1-based sequence in term order, which
    equals the index's global ``term_id`` for a whole-index export
    (assign_dense_ids mints term_id = dense 1..n ordered by term). With
    ``use_global_ids`` (shard mode) the frame must carry ``term_id`` and
    that global id is written instead — a per-shard restart would break
    cross-references against the top-level forward_index.jsonl, which
    always uses global term_ids."""
    cols = ["term", "df", "tf", "postings"] + (
        ["term_id"] if use_global_ids else []
    )
    rows = postings.select(*cols).orderBy("term").toLocalIterator()
    n = 0
    offset = 0
    with (
        open(outdir / "postings.bin", "wb") as pout,
        open(outdir / "lexicon.txt", "w", encoding="utf-8") as lexofs,
        open(outdir / "terms_list.txt", "w", encoding="utf-8") as tl,
    ):
        for r in rows:
            n += 1
            wid = int(r["term_id"]) if use_global_ids else n
            blob = bytes(r["postings"])
            pout.write(blob)
            skip_meta = '{"df":%d,"skip_interval":%d}' % (r["df"], skip_interval)
            term = _sanitize(r["term"])
            lexofs.write(
                f"{wid}\t{term}\t{r['df']}\t{r['tf']}\t{offset}\t{len(blob)}\t{skip_meta}\n"
            )
            tl.write(f"{term}\t{wid}\n")
            offset += len(blob)
    return n


def _write_docid_map(docid_map: DataFrame, outdir: Path) -> None:
    with open(outdir / "docid_map.txt", "w", encoding="utf-8") as dm:
        for r in (
            docid_map.select("docid", "doc_int").orderBy("doc_int").toLocalIterator()
        ):
            dm.write(f"{r['docid']}\t{r['doc_int']}\n")


def _write_forward_index(fwd: DataFrame, outdir: Path) -> None:
    """forward_index.jsonl in the reference's exact JSON shape
    (indexer4.cpp:424-439): wordid/freq/positions per posting, original
    docid kept. Missing-term postings (null term_id) are skipped, as the
    reference skips them. Frames from the lineage builders carry both
    ``docid`` and ``doc_int``; ``build_index``'s default
    ``forward_index_frame`` carries only ``doc_int`` — fall back to it
    for the emitted docid (it IS the internal docid the reference
    writes when no original id survives the remap)."""
    order_col = "doc_int" if "doc_int" in fwd.columns else "docid"
    id_col = "docid" if "docid" in fwd.columns else "doc_int"
    it = fwd.orderBy(order_col).toLocalIterator()
    with open(outdir / "forward_index.jsonl", "w", encoding="utf-8") as ofs:
        for r in it:
            parts = []
            for p in r["postings"]:
                if p["term_id"] is None:
                    continue
                pos = ",".join(str(int(x)) for x in p["positions"])
                parts.append(
                    '{"wordid":%d,"freq":%d,"positions":[%s]}'
                    % (int(p["term_id"]), int(p["freq"]), pos)
                )
            docid = json.dumps(str(r[id_col]))
            ofs.write('{"docid":%s,"postings":[%s]}\n' % (docid, ",".join(parts)))


def export_reference_index(
    index: dict[str, DataFrame],
    outdir: str,
    skip_interval: int = 128,
    shard_by_bucket: bool = False,
) -> dict:
    """Export a built/loaded index dict to the reference's file formats.

    ``index`` is the dict from ``build_index`` / ``build_and_save_index``
    / ``load_index``; ``forward_index_ids`` is exported when present.
    With ``shard_by_bucket`` the postings/lexicon/terms_list triplet is
    written per crc32 barrel (``bucket=N/``), offsets local to each
    shard — the layout that still works when one postings.bin cannot
    live on one machine. docid_map and forward_index stay top-level.
    """
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    stats: dict = {"n_terms": 0, "shards": 0}

    if shard_by_bucket:
        postings = index["postings"]
        # per-shard lexicons must still carry GLOBAL wordIDs (the
        # top-level forward_index.jsonl references global term_ids) —
        # join the index's term_id onto the blobs once, before slicing
        if "term_id" not in postings.columns:
            if "lexicon" in index and "term_id" in index["lexicon"].columns:
                postings = postings.join(
                    index["lexicon"].select("term", "term_id"), "term"
                )
            else:
                # no lexicon in the dict: mint the same dense
                # term-ascending ids the whole-index export implies
                from ..operators.ids import assign_dense_ids

                postings = assign_dense_ids(postings, "term", "term_id")
        buckets = sorted(
            r["bucket_id"]
            for r in postings.select("bucket_id").distinct().collect()
        )
        for b in buckets:
            sub = out / f"bucket={b}"
            sub.mkdir(exist_ok=True)
            stats["n_terms"] += _write_postings_and_lexicon(
                postings.filter(F.col("bucket_id") == b), sub, skip_interval,
                use_global_ids=True,
            )
            stats["shards"] += 1
    else:
        stats["n_terms"] = _write_postings_and_lexicon(
            index["postings"], out, skip_interval
        )
        stats["shards"] = 1

    _write_docid_map(index["docid_map"], out)
    if "forward_index_ids" in index:
        _write_forward_index(index["forward_index_ids"], out)
    stats["postings_bytes"] = sum(
        f.stat().st_size for f in out.rglob("postings.bin")
    )
    return stats
