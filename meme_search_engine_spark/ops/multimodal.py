"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The reference decodes real media (thumbnailers /root/reference/src/
main.rs:472-562, video frame extraction src/video_reader.rs:9-79, CLIP
preprocessing clip_server.py:91-123).  This container has no media
libraries, so the DECODE KERNELS ARE STUBS — clearly marked, raising
NotImplementedError unless the deterministic fake backend is selected —
while everything Spark-side (schema, Arrow batch shape, 1->N frame
expansion, partitioning) is real and tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic fake 'decode': dimensions + mean luma derived from
    the payload bytes.  Stands in for PIL/ffmpeg (NOT a real decoder)."""
    h = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    return 16 + h % 1024, 16 + (h >> 10) % 1024, (h >> 20) % 256 / 255.0


def decode_image_features(media: DataFrame, backend: str = "stub") -> DataFrame:
    """image binary -> (media_id, width, height, mean_luma).

    backend='stub' raises NotImplementedError (no image libs in this
    environment); backend='fake' uses the deterministic fake decoder so
    the Spark plumbing (schema, Arrow batches, partitioning) is testable.
    A real deployment plugs PIL/libvips into the same kernel signature.
    """

    def kernel(batches):
        for pdf in batches:
            if backend == "stub":
                raise NotImplementedError(
                    "image decode requires PIL/libvips — not available in "
                    "this container; use backend='fake' for plumbing tests"
                )
            rows = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.array([r[0] for r in rows], dtype="int32"),
                    "height": pd.array([r[1] for r in rows], dtype="int32"),
                    "mean_luma": [r[2] for r in rows],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        kernel, "media_id long, width int, height int, mean_luma double"
    )


def resize_for_embed(media: DataFrame, target: int = 384, backend: str = "stub") -> DataFrame:
    """The reference's resize-for-embedding transform (common.rs:31-59):
    binary -> fixed-size float tensor, flattened.  Stubbed decode; the
    fake backend emits a deterministic target*small tensor so batch
    shapes and schema are exercised."""

    def kernel(batches):
        for pdf in batches:
            if backend == "stub":
                raise NotImplementedError(
                    "image resize requires PIL — use backend='fake'"
                )
            out = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, luma = _fake_decode(p)
                rng_base = np.uint64(mid)
                px = (
                    (np.arange(16, dtype=np.uint64) * np.uint64(2654435761) + rng_base)
                    % np.uint64(256)
                ).astype(np.float32) / np.float32(255.0) * np.float32(luma)
                out.append((int(mid), [float(x) for x in px]))
            yield pd.DataFrame(out, columns=["media_id", "tensor"])

    return media.filter(F.col("kind") == "image").mapInPandas(
        kernel, "media_id long, tensor array<float>"
    )


def sample_video_frames(
    media: DataFrame, every_n: int = 10, backend: str = "stub"
) -> DataFrame:
    """1->N frame sampling (video_reader.rs:9-79 UDTF shape): each video
    row expands to ceil(n_frames / every_n) frame rows."""

    def kernel(batches):
        for pdf in batches:
            if backend == "stub":
                raise NotImplementedError(
                    "video decode requires ffmpeg — use backend='fake'"
                )
            rows = []
            for mid, meta in zip(pdf["media_id"], pdf["meta"]):
                n = int(meta["n_frames"] or 0)
                for f in range(0, n, every_n):
                    rows.append((int(mid), f, float(f) / max(n, 1)))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "position"]
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        kernel, "media_id long, frame_idx int, position double"
    )
