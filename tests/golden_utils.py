"""Readers for the reference's golden artifacts (read-only fixtures)."""

from __future__ import annotations

import json
from pathlib import Path

REF = Path("/root/reference")


def read_tsv_rows(path: Path) -> list[list[str]]:
    """8-col TSV parse with the reference's pad-missing-cols semantics
    (cleaner3.cpp:513-532)."""
    rows = []
    for line in path.read_text(encoding="utf-8").splitlines():
        cols = []
        start = 0
        for _ in range(7):
            pos = line.find("\t", start)
            if pos == -1:
                cols.append(line[start:])
                start = len(line)
            else:
                cols.append(line[start:pos])
                start = pos + 1
        if start <= len(line):
            cols.append(line[start:])
        while len(cols) < 8:
            cols.append("")
        rows.append(cols)
    return rows


def doc_fields(cols: list[str]) -> tuple[str, list[tuple[str, str]]]:
    from large_scale_hypertextual_search_engine_spark.analysis.tokenizer import (
        split_sections,
    )

    docid, title, abstract, sections = cols[0], cols[1], cols[2], cols[3]
    return docid, [("title", title), ("abstract", abstract)] + split_sections(sections)


def read_cleaned_jsonl(path: Path) -> list[dict]:
    return [json.loads(l) for l in path.read_text(encoding="utf-8").splitlines() if l]


def doc_term_positions(doc: dict) -> tuple[dict[str, list[int]], int]:
    """Merge a cleaned doc's per-field token streams into per-term sorted
    position bags (cross-field merge incl. collisions — quirk Q12).
    Returns (term -> positions, doc_len = total token count)."""
    acc: dict[str, list[int]] = {}
    n = 0
    for field in doc["fields"]:
        for tok in field["tokens"]:
            acc.setdefault(tok["term"], []).append(tok["pos"])
            n += 1
    return {t: sorted(ps) for t, ps in acc.items()}, n


def load_golden_index(index_dir: Path):
    """-> (lexicon rows, docid_map, per-term postings decoded via our codec)."""
    from large_scale_hypertextual_search_engine_spark.functions.varbyte import (
        decode_postings,
    )

    lex = {}
    for line in (index_dir / "lexicon.txt").read_text(encoding="utf-8").splitlines():
        p = line.split("\t")
        lex[p[1]] = {
            "word_id": int(p[0]),
            "df": int(p[2]),
            "tf": int(p[3]),
            "offset": int(p[4]),
            "bytes": int(p[5]),
        }
    docmap = {}
    for line in (index_dir / "docid_map.txt").read_text(encoding="utf-8").splitlines():
        orig, internal = line.rsplit("\t", 1)
        docmap[int(internal)] = orig
    blob = (index_dir / "postings.bin").read_bytes()
    postings = {}
    for term, e in lex.items():
        docids, tfs, flat = decode_postings(blob[e["offset"] : e["offset"] + e["bytes"]])
        out = {}
        k = 0
        for d, tf in zip(docids, tfs):
            out[docmap[int(d)]] = [int(x) for x in flat[k : k + tf]]
            k += tf
        postings[term] = out
    return lex, docmap, postings
