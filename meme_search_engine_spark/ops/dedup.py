"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

All exact variants are DataFrame built-ins end-to-end; the hash-heavy
ones keep hashing JVM-side (``xxhash64``) and do only the bit-twiddling
in vectorized numpy.  Reference analogue: the 2^20-entry ring of
binarized-embedding + URL hashes (/root/reference/src/dump_processor.rs:
332-335,376-391) — ours are global and exact rather than windowed,
which Spark makes affordable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..index.build import tokens_col


# ------------------------------------------------------------------- exact

def exact_duplicate_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash: one row per distinct content with
    its multiplicity and the canonical survivor (min doc_id)."""
    return (
        docs.groupBy(F.md5(F.col(text_col).cast("binary")).alias("fingerprint"))
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_doc_id"))
    )


def drop_exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep the min-doc_id row per distinct text (deterministic)."""
    w = Window.partitionBy(F.md5(F.col(text_col).cast("binary"))).orderBy("doc_id")
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------- shingles

def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """docs(doc_id, text) -> distinct (doc_id, shingle) of n-gram token
    shingles, built entirely JVM-side (tokenize -> transform(sequence)).
    Docs shorter than n tokens produce no shingles."""
    toks = tokens_col(F.col("text"))
    sh = F.expr(
        f"transform(sequence(0, size(_toks) - {n}), "
        f"i -> concat_ws(' ', slice(_toks, i + 1, {n})))"
    )
    return (
        docs.withColumn("_toks", toks)
        .filter(F.size("_toks") >= n)
        .select("doc_id", F.explode(sh).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (doc_a < doc_b, j >= threshold).

    Plan: shingle explode -> self-equi-join on shingle (the classic
    candidate generation; a shuffle on shingle) -> pair intersection
    counts -> sizes join -> |A∩B| / (|A|+|B|-|A∩B|)."""
    sh = shingles(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("size"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("size").alias("size_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "jaccard")
    )


# ----------------------------------------------------------------- minhash

def minhash_signatures(docs: DataFrame, n_hashes: int = 16, n: int = 3) -> DataFrame:
    """MinHash signature per doc: mh_i = min over shingles of
    xxhash64(shingle, i).  All JVM-side (n_hashes min-aggregates)."""
    sh = shingles(docs, n)
    aggs = [
        F.min(F.xxhash64("shingle", F.lit(i))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_candidates(
    docs: DataFrame, n_hashes: int = 16, bands: int = 4, n: int = 3
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature become a
    candidate pair (doc_a < doc_b).  Candidate recall vs true Jaccard
    pairs is property-tested in tests/test_ops_dedup.py."""
    assert n_hashes % bands == 0
    rows = n_hashes // bands
    sig = minhash_signatures(docs, n_hashes, n)
    band_cols = [
        F.xxhash64(*[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias(
            f"band{b}"
        )
        for b in range(bands)
    ]
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_id"), band_cols[b].alias("bh"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band_id", "bb.bh")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


# ----------------------------------------------------------------- simhash

def simhash(docs: DataFrame) -> DataFrame:
    """64-bit SimHash per doc from tf-weighted term-hash bits
    (reference's sign-bit embedding binarization,
    dump_processor.rs:109-115, applied to term space).

    term hashing stays JVM-side; the bit unpack + weighted sign sum is
    one numpy matrix op per Arrow batch (grouped by doc)."""
    tf = (
        docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("th", F.xxhash64("term"))
        .select("doc_id", "th", "tf")
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        doc_id = int(pdf["doc_id"].iloc[0])
        h = pdf["th"].to_numpy(np.int64).astype(np.uint64)
        w = pdf["tf"].to_numpy(np.int64).astype(np.float64)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.float64
        )
        score = ((2.0 * bits - 1.0) * w[:, None]).sum(axis=0)
        sig = np.uint64(0)
        for i in np.flatnonzero(score > 0):
            sig |= np.uint64(1) << np.uint64(i)
        return pd.DataFrame(
            {"doc_id": [doc_id], "simhash": [np.int64(sig.astype(np.int64))]}
        )

    return tf.groupBy("doc_id").applyInPandas(kernel, "doc_id long, simhash long")


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup candidates by SimHash hamming distance, banded on 16-bit
    chunks (any identical chunk -> candidate; exact hamming filter after)."""
    sig = simhash(docs)
    chunks = [
        (F.shiftrightunsigned(F.col("simhash"), 16 * i) % F.lit(65536)).alias(
            f"c{i}"
        )
        for i in range(4)
    ]
    banded = sig.select("doc_id", "simhash", *chunks)
    exploded = banded.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("cid"), F.col(f"c{i}").alias("cv"))
                    for i in range(4)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "simhash", "ch.cid", "ch.cv")
    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return pairs.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    ).filter(F.col("hamming") <= max_hamming).select("doc_a", "doc_b", "hamming")


# -------------------------------------------------------- embedding cosine

def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.95
) -> DataFrame:
    """Embedding-cosine near-dup pairs — the reference's query-time
    gram-matrix suppression (query_disk_index.rs:486-527) as a batch op.
    O(n^2) exact; the scale path is ops.similarity.ivf bucketing first."""
    dot = F.aggregate(
        F.zip_with("a.embedding", "b.embedding", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda side: F.sqrt(  # noqa: E731
        F.aggregate(
            F.zip_with(f"{side}.embedding", f"{side}.embedding", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    a = embeddings.alias("a")
    b = embeddings.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn("cosine", dot / (norm("a") * norm("b")))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            "cosine",
        )
    )
