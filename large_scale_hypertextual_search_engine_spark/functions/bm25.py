"""BM25 scoring as native Column expressions (no UDF — stays in codegen).

Formula (reference: Query-engine.hpp:98-99,145-155, SURVEY.md Appendix D):
    idf  = ln((N - df + 0.5) / (df + 0.5) + 1)
    tf_c = ((k1+1) * tf) / (k1 * (1 - b + b * dl/avgdl) + tf)
    score = idf * tf_c ;  k1 = 1.5, b = 0.75

Reference-compat mode forces tf = 1 (the reference's docids-only decode
discards tf — quirk Q3) and uses floor(avgdl) when a doc length is
missing (uint32 truncation — quirk Q8).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

K1 = 1.5
B = 0.75


def idf_expr(df: Column, n_docs: Column | float) -> Column:
    return F.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def tf_component(tf: Column | float, dl: Column, avg_dl: Column | float,
                 k1: float = K1, b: float = B) -> Column:
    return ((k1 + 1.0) * tf) / (k1 * (1.0 - b + b * (dl / avg_dl)) + tf)


def bm25_score(
    tf: Column | float,
    df: Column,
    dl: Column,
    n_docs: Column | float,
    avg_dl: Column | float,
    k1: float = K1,
    b: float = B,
) -> Column:
    return idf_expr(df, n_docs) * tf_component(tf, dl, avg_dl, k1, b)


def bm25_score_py(
    tf: float, df: int, dl: float, n_docs: int, avg_dl: float,
    k1: float = K1, b: float = B,
) -> float:
    """Pure-Python mirror used by the test oracle."""
    import math

    idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    tfc = ((k1 + 1.0) * tf) / (k1 * (1.0 - b + b * (dl / avg_dl)) + tf)
    return idf * tfc
