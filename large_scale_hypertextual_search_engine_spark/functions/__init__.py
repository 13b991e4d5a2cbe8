"""Scalar/codec function library: varbyte, BM25 expressions, hashing."""

from .varbyte import (
    vb_encode,
    vb_decode,
    encode_postings,
    decode_postings,
    decode_docids,
)
from .bm25 import bm25_score, idf_expr

__all__ = [
    "vb_encode",
    "vb_decode",
    "encode_postings",
    "decode_postings",
    "decode_docids",
    "bm25_score",
    "idf_expr",
]
