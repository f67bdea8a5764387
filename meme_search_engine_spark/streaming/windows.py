"""Structured Streaming operators.

The reference is batch + incremental refresh with streaming *shapes*
(SURVEY.md §2.9): a resumable offset-tracking source
(/root/reference/src/reddit_dump.rs:269-301), a count-bounded dedup
window (src/dump_processor.rs:332-391), and an online reindex loop with
atomic swap (src/main.rs:1005-1035).  Spark-first equivalents:

- event-time tumbling windows with watermarks (late data excluded, the
  high-water-mark pattern);
- ``dropDuplicatesWithinWatermark`` for the dedup ring buffer —
  time-bounded instead of count-bounded, and exact within the window;
- ``foreachBatch`` incremental tf/stats maintenance — the micro-batch
  version of the reference's ingest→rebuild→swap loop, with the
  checkpointLocation playing the role of the seqnum/timestamp readback.

Streaming/batch equivalence is pytest-verified: the streamed result of
each op equals the batch DataFrame result on the same input.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..index.build import term_doc_tf, docs_from_pages


def tumbling_counts_batch(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Batch semantics twin of the streaming window agg."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )


def tumbling_counts_stream(
    stream: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts over an event stream."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )


def dedup_within_watermark_stream(
    stream: DataFrame, key_cols: list[str], watermark: str = "2 hours"
) -> DataFrame:
    """The reference's 2^20-entry dedup ring (count-bounded sliding
    window) as a time-bounded exact streaming dedup."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def incremental_tf_update(
    spark: SparkSession,
    pages_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
):
    """Micro-batch incremental index maintenance: each batch of new
    pages appends its (term_hash, doc_id, doc_len, tf) rows to the tf
    state table — the ingest half of the reference's online reindex
    loop (main.rs:1005-1035); a periodic finalize compacts tf deltas
    into posting segments (builder.build_index over the union).

    Returns the StreamingQuery (caller stops it / processAllAvailable).
    """

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tf = term_doc_tf(docs_from_pages(batch_df))
        tf.write.mode("append").parquet(state_dir)

    return (
        pages_stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
