"""Posting-segment construction: the distributed inverted index.

Two-stage, skew-proof by construction (SURVEY.md §3.4 "our lifecycle";
reference analogue: centroid-sharded index build,
/root/reference/src/dump_processor.rs:428-461 + per-shard graph build
src/generate_index_shard.rs — re-expressed as DataFrame transforms):

Stage 1 — salted partial posting lists.  Every (doc,term,tf) row gets a
``salt`` = unsigned(doc_id) >> salt_shift, i.e. a CONTIGUOUS doc-id
range bucket.  ``groupBy(term_hash, salt).applyInPandas`` builds
128-doc blocks (delta+varbyte doc ids, varbyte tfs + doc lens,
block-max tf_norm).  The head-term hot key (a term in 30% of all docs —
or 10^11 postings at full scale) is thereby split across ~N/2^shift
bounded groups: max group size is min(df, 2^shift) REGARDLESS of skew.

Stage 2 — merge without decoding.  Because salts are doc-range-disjoint
and ordered, the global posting list of a term is just its blocks
ordered by (salt, block_seq): the "merge" is a window renumbering plus
a per-term df sum over compressed block rows — bytes are never
re-encoded, so the merge shuffles ~1/10th of the stage-1 volume.

Block layout is a pure function of (corpus, salt_shift) — independent
of input partitioning (tested at 4 vs 17 input partitions).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..common.bm25 import B, K1
from ..common.codecs import (
    decode_postings_block,
    encode_postings_block,
)

BLOCK_SIZE = 128


@dataclass(frozen=True)
class IndexConfig:
    salt_shift: int = 17          # docs per salt range = 2^17
    n_buckets: int = 64           # term-hash partition buckets (pruning unit)
    n_parts: int = 8              # checkpoint granularity (build partitions)
    block_size: int = BLOCK_SIZE
    k1: float = K1
    b: float = B


PARTIALS_SCHEMA = (
    "part_id int, term_hash long, salt long, block_seq int, n_docs int, "
    "min_doc_id long, max_doc_id long, doc_ids binary, tfs binary, "
    "dls binary, block_max_tfnorm double"
)

SEGMENTS_COLUMNS = [
    "term_hash", "bucket", "block_id", "n_blocks", "df", "n_docs",
    "min_doc_id", "max_doc_id", "doc_ids", "tfs", "dls", "block_max_tfnorm",
]


def salt_col(doc_id_col, cfg: IndexConfig):
    """Contiguous doc-range bucket (unsigned shift — hashed ids may be
    negative)."""
    return F.shiftrightunsigned(doc_id_col, cfg.salt_shift)


def part_col(doc_id_col, cfg: IndexConfig):
    """Checkpoint build-partition of a doc (pure function of doc_id, so
    a resumed build re-selects exactly the missing input slice)."""
    return F.pmod(salt_col(doc_id_col, cfg), F.lit(cfg.n_parts)).cast("int")


def _make_block_builder(avgdl: float, cfg: IndexConfig):
    """Grouped-map kernel: one (term_hash, salt) group -> block rows.
    All numpy; no per-row Python."""
    k1, b, bs = cfg.k1, cfg.b, cfg.block_size

    def build_blocks(pdf: pd.DataFrame) -> pd.DataFrame:
        term_hash = int(pdf["term_hash"].iloc[0])
        salt = int(pdf["salt"].iloc[0])
        part_id = int(pdf["part_id"].iloc[0])
        doc_ids = pdf["doc_id"].to_numpy(np.int64)
        order = np.argsort(doc_ids.astype(np.uint64), kind="stable")
        doc_ids = doc_ids[order]
        tfs = pdf["tf"].to_numpy(np.int64)[order]
        dls = pdf["doc_len"].to_numpy(np.int64)[order]
        tf_norm = tfs / (tfs + k1 * (1.0 - b + b * dls / avgdl))
        out = []
        for i in range(0, len(doc_ids), bs):
            d, t, l = doc_ids[i : i + bs], tfs[i : i + bs], dls[i : i + bs]
            db, tb, lb = encode_postings_block(d, t, l)
            out.append(
                (
                    part_id, term_hash, salt, i // bs, len(d),
                    int(d[0]), int(d[-1]), db, tb, lb,
                    float(tf_norm[i : i + bs].max()),
                )
            )
        return pd.DataFrame(
            out,
            columns=[
                "part_id", "term_hash", "salt", "block_seq", "n_docs",
                "min_doc_id", "max_doc_id", "doc_ids", "tfs", "dls",
                "block_max_tfnorm",
            ],
        )

    return build_blocks


def build_partials(tf: DataFrame, avgdl: float, cfg: IndexConfig) -> DataFrame:
    """tf(term_hash, doc_id, doc_len, tf) -> partial block rows.

    The ONE big shuffle of the build: hash-partition by
    (term_hash, salt).  Skew-bounded per the module docstring."""
    salted = tf.withColumn("salt", salt_col(F.col("doc_id"), cfg)).withColumn(
        "part_id", part_col(F.col("doc_id"), cfg)
    )
    return salted.groupBy("term_hash", "salt").applyInPandas(
        _make_block_builder(avgdl, cfg), PARTIALS_SCHEMA
    )


def finalize_segments(partials: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Partial blocks -> final segments: global per-term block numbering
    and df, WITHOUT decoding (concat-merge of range-disjoint blocks).

    One shuffle on term_hash over compressed block rows (both window
    functions share the same partitioning -> single exchange)."""
    w = Window.partitionBy("term_hash")
    w_ord = w.orderBy("salt", "block_seq")
    return (
        partials.withColumn("block_id", F.row_number().over(w_ord) - 1)
        .withColumn("df", F.sum("n_docs").over(w))
        .withColumn("n_blocks", F.count("*").over(w))
        .withColumn(
            "bucket", F.pmod(F.col("term_hash"), F.lit(cfg.n_buckets)).cast("int")
        )
        .select(*SEGMENTS_COLUMNS)
    )


def term_stats_from_segments(segments: DataFrame) -> DataFrame:
    """Per-term planning stats (query-side idf + WAND global bounds)."""
    return segments.groupBy("term_hash").agg(
        F.first("df").alias("df"),
        F.first("n_blocks").alias("n_blocks"),
        F.max("block_max_tfnorm").alias("max_block_max"),
        F.sum(
            F.length("doc_ids") + F.length("tfs") + F.length("dls")
        ).alias("bytes"),
    )


def decode_segments_to_postings(segments: DataFrame) -> DataFrame:
    """Segments -> exploded (term_hash, doc_id, tf, doc_len) — the
    decode path used by tests/goldens and the exhaustive scorer-over-
    index.  mapInPandas, numpy-vectorized decode."""

    def decode(batches):
        for pdf in batches:
            outs = []
            for r in pdf.itertuples(index=False):
                d, t, l = decode_postings_block(r.doc_ids, r.tfs, r.dls)
                outs.append(
                    pd.DataFrame(
                        {
                            "term_hash": np.full(len(d), r.term_hash, np.int64),
                            "df": np.full(len(d), r.df, np.int64),
                            "doc_id": d,
                            "tf": t,
                            "doc_len": l,
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return segments.mapInPandas(
        decode, "term_hash long, df long, doc_id long, tf long, doc_len long"
    )
