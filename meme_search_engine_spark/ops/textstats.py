"""Text analysis: language ID, quality scoring, token counting,
document fingerprinting — per-document corpus hygiene ops (the
reference's quality-model pipeline role, /root/reference/meme-rater/*,
as cheap deterministic heuristics).

Everything is JVM expressions except the rolling hash (numpy in an
Arrow batch)."""

from __future__ import annotations

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..index.build import tokens_col

# tiny per-language stopword lists for the n-gram/stopword-ratio
# heuristic (public knowledge; extend per deployment)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "que"],
}


def _ratio(toks_col, words: list[str]):
    hits = F.size(
        F.filter(toks_col, lambda t: t.isin([F.lit(w) for w in words]))
    )
    return hits / F.greatest(F.size(toks_col), F.lit(1))


def with_token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """token count + distinct ratio + mean token length."""
    d = docs.withColumn("_toks", tokens_col(F.col(text_col)))
    return (
        d.withColumn("n_tokens", F.size("_toks"))
        .withColumn(
            "distinct_ratio",
            F.size(F.array_distinct("_toks"))
            / F.greatest(F.size("_toks"), F.lit(1)),
        )
        .withColumn(
            "mean_token_len",
            F.aggregate(
                "_toks", F.lit(0), lambda acc, t: acc + F.length(t)
            )
            / F.greatest(F.size("_toks"), F.lit(1)),
        )
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features: length, distinct ratio, stopword ratio,
    punctuation ratio of the raw text."""
    d = with_token_stats(docs, text_col)
    punct = F.length(
        F.regexp_replace(F.col(text_col), "[a-zA-Z0-9\\s]", "")
    ) / F.greatest(F.length(text_col), F.lit(1))
    return d.select(
        "doc_id",
        "n_tokens",
        F.round("distinct_ratio", 4).alias("distinct_ratio"),
        F.round(_ratio(F.col("_toks"), STOPWORDS["en"]), 4).alias("stopword_ratio"),
        F.round(punct, 4).alias("punct_ratio"),
        F.round("mean_token_len", 4).alias("mean_token_len"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hit
    ratios; 'und' (undetermined) when no list scores > 0."""
    d = docs.withColumn("_toks", tokens_col(F.col(text_col)))
    scores = [
        F.round(_ratio(F.col("_toks"), words), 6).alias(f"score_{lang}")
        for lang, words in STOPWORDS.items()
    ]
    d = d.select("doc_id", *scores)
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for l in langs:  # first language (in fixed order) achieving the max
        pred = pred.when(F.col(f"score_{l}") == best, F.lit(l))
    return d.select(
        "doc_id", *[f"score_{l}" for l in langs], pred.alias("pred_lang")
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Two per-doc fingerprints:
    - content_md5: md5 of the raw text (exact-dup key);
    - rolling_hash: 63-bit polynomial rolling hash over the token
      sequence (order-sensitive, whitespace-insensitive) — numpy
      Horner's rule per Arrow batch."""
    d = docs.select(
        "doc_id",
        F.md5(F.col(text_col).cast("binary")).alias("content_md5"),
        tokens_col(F.col(text_col)).alias("_toks"),
    )
    MOD = (1 << 61) - 1
    BASE = 1_000_003

    def kernel(batches):
        from ..common.hashing import xxh64_bytes

        for pdf in batches:
            out = []
            for toks in pdf["_toks"]:
                # arbitrary-precision ints: h*BASE (~2^81) would wrap a
                # uint64 before the mod
                h = 0
                for t in toks:
                    h = (h * BASE + xxh64_bytes(t.encode(), 0) % MOD) % MOD
                out.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content_md5": pdf["content_md5"],
                    "rolling_hash": pd.array(out, dtype="int64"),
                }
            )

    return d.mapInPandas(
        kernel, "doc_id long, content_md5 string, rolling_hash long"
    )
