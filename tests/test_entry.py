"""Driver-contract check: every queries() entry vs its DuckDB oracle.

Mirrors the driver's CORRECTNESS gate: row count + column names +
order-insensitive value comparison (values normalized: floats rounded,
dates stringified). Runs at sf0.001 for speed; the driver runs sf0.01.
"""

import datetime
import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (datetime.date, datetime.datetime)):
        return str(v)[:10]
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _rowset(rows, cols):
    return sorted(
        tuple(_norm(r[c]) for c in cols) for r in rows
    )


ORACLE_QUERIES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    srows = [r.asDict() for r in sdf.collect()]
    scols = sdf.columns

    con = _duck()
    cur = con.execute(entry_mod.oracle_sql()[name])
    ocols = [d[0] for d in cur.description]
    orows = [dict(zip(ocols, r)) for r in cur.fetchall()]

    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    key = sorted(scols)
    sset = _rowset(srows, key)
    oset = _rowset(orows, key)
    if sset != oset:
        diffs = [
            (a, b) for a, b in zip(sset, oset) if a != b
        ][:5]
        pytest.fail(f"{name}: value mismatch, first diffs: {diffs}")


ALL_KEYS = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ALL_KEYS)
def test_every_registry_key_exercised(spark, name):
    """r4 VERDICT #7: the driver's correctness run may subset the
    registry, so EVERY queries() key must be visibly exercised in-tree,
    parameterized (a skipped driver row can never hide a regression).
    Oracle-backed keys execute fully in test_query_matches_oracle, so
    here they only need a well-formed plan; rows-only keys (no oracle)
    execute to completion here."""
    q = entry_mod.queries()[name]
    df = q(spark, SF_DIR)
    assert df.columns, name
    if name not in entry_mod.oracle_sql():
        assert df.count() > 0, f"{name}: rows-only query returned 0 rows"


def test_rows_only_set_is_expected():
    """Exactly these registry entries lack a DuckDB oracle (each for a
    stated reason: property-backed kernel / stemmer mode); growing this
    set silently is a correctness-coverage regression."""
    rows_only = sorted(set(ALL_KEYS) - set(entry_mod.oracle_sql()))
    assert rows_only == [
        "ann_pq",  # approximate by contract: recall + ADC-identity pytests
        "ft_compat_analyzer",
        "text_fingerprint",
    ], rows_only


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_stored_oracle_paths_are_per_sf(spark):
    """Round-3 ADVICE: the stored-artifact oracle paths must be derived
    from sf_dir so interleaved runs at two SFs cannot cross-contaminate.
    Snapshot the oracle SQL after the sf0.001 run, run the same entry at
    sf0.01 (overwriting ITS OWN path only), then verify the sf0.001
    snapshot still matches the sf0.001 artifacts."""
    name = "dedup_minhash_banded"
    q = entry_mod.queries()[name]

    sdf1 = q(spark, "/root/testdata/sf0.001")
    srows1 = _rowset([r.asDict() for r in sdf1.collect()], sorted(sdf1.columns))
    sql1 = entry_mod.oracle_sql()[name]

    sdf2 = q(spark, "/root/testdata/sf0.01")
    sql2 = entry_mod.oracle_sql()[name]
    assert sql1 != sql2  # different SF -> different artifact path

    # the sf0.001 oracle still reproduces the sf0.001 result afterwards
    con = _duck()
    cur = con.execute(sql1)
    ocols = [d[0] for d in cur.description]
    orows = _rowset(
        [dict(zip(ocols, r)) for r in cur.fetchall()], sorted(ocols)
    )
    assert orows == srows1
