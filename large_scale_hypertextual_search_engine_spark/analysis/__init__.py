"""Reference-compat text analysis: tokenizer + stemmer + pandas-UDF analyzer."""

from .stemmer import stem, stem_many
from .tokenizer import tokenize_compat, tokenize_simple, DEFAULT_STOPWORDS
from .analyzer import (
    analyze_udf,
    analyze_agg_udf,
    tokenize_documents,
)

__all__ = [
    "stem",
    "stem_many",
    "tokenize_compat",
    "tokenize_simple",
    "DEFAULT_STOPWORDS",
    "analyze_udf",
    "analyze_agg_udf",
    "tokenize_documents",
]
