from .windows import (
    tumbling_counts_stream,
    tumbling_counts_batch,
    dedup_within_watermark_stream,
    incremental_tf_update,
)

__all__ = [
    "tumbling_counts_stream",
    "tumbling_counts_batch",
    "dedup_within_watermark_stream",
    "incremental_tf_update",
]
