"""Extractor parity against golden out.tsv / outpmc.tsv (6 docs each).

Two golden pdf rows are structurally malformed (7 and 6 tab-separated
cells — quirk Q11; they predate the committed extractor.cpp). Strict
field parity is asserted for every well-formed 8-col golden row; for the
malformed ones we assert OUR extractor still emits a well-formed row.
"""

import pytest

from large_scale_hypertextual_search_engine_spark.sources.extractor import extract_dir
from golden_utils import REF


@pytest.mark.parametrize(
    "subdir,golden,min_wellformed",
    [("pdf", "out.tsv", 4), ("pmc", "outpmc.tsv", 4)],
    ids=["pdf", "pmc"],
)
def test_extract_matches_golden(spark, subdir, golden, min_wellformed):
    got = {
        r["paper_id"]: r
        for r in extract_dir(spark, str(REF / subdir)).collect()
    }
    assert len(got) == 6  # all docs extracted, every row well-formed
    n_checked = 0
    for line in (REF / golden).read_text(encoding="utf-8").splitlines():
        cols = line.split("\t")
        if len(cols) != 8:
            continue  # malformed golden row (Q11)
        paper_id = cols[0]
        assert paper_id in got, paper_id
        r = got[paper_id]
        assert r["title"] == cols[1], paper_id
        assert r["abstract"] == cols[2], paper_id
        assert r["sections"] == cols[3], paper_id
        assert r["authors"] == cols[4], paper_id
        assert r["pub_date"] == cols[5], paper_id
        assert r["doi_or_id"] == cols[6], paper_id
        assert r["source"] == cols[7], paper_id
        n_checked += 1
    assert n_checked >= min_wellformed
