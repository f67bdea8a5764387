"""Pure functions shared by the Spark pipeline, the pytest oracle, and
the data generator.  One source of truth makes byte-identity between the
distributed engine and the reference oracle trivial (the reference uses
the same trick: brute-force oracle in query_disk_index.rs:262-276 scores
with the same dot-product kernel as the index)."""

from .textproc import extract_text, normalize_text, tokenize
from .hashing import xxhash64_str, term_hash
from .codecs import (
    varbyte_encode,
    varbyte_decode,
    delta_encode,
    delta_decode,
)
from .bm25 import bm25_idf, bm25_tf_norm, bm25_score, FIXED_POINT_SCALE, to_fixed

__all__ = [
    "extract_text",
    "normalize_text",
    "tokenize",
    "xxhash64_str",
    "term_hash",
    "varbyte_encode",
    "varbyte_decode",
    "delta_encode",
    "delta_decode",
    "bm25_idf",
    "bm25_tf_norm",
    "bm25_score",
    "FIXED_POINT_SCALE",
    "to_fixed",
]
