"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, decoded by REAL kernels where the format allows.

The reference decodes real media (thumbnailers /root/reference/src/
main.rs:472-562, video frame extraction src/video_reader.rs:9-79, CLIP
preprocessing clip_server.py:91-123).  Backends, in honesty order:

- ``native`` (default): genuine byte-level decoders with zero external
  dependencies — PPM/PGM/BMP images and the RAWV raw-RGB video
  container (common/imaging.py) — plus PIL by OPTIONAL import for
  jpeg/png when a deployment has it.  Formats needing an absent
  library raise NotImplementedError with the reason.
- ``fake``: deterministic pseudo-decode for plumbing tests that want
  arbitrary payload bytes.
- ``stub``: always raises (kept for tests that assert the container
  has no jpeg path).

Everything Spark-side (schema, Arrow batch shape, 1->N frame
expansion, partitioning) is identical across backends.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from ..common import imaging

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


def _stub_raise(what: str):
    raise NotImplementedError(
        f"{what} requires PIL/ffmpeg — not available in this container; "
        "use backend='native' with PPM/PGM/BMP/RAWV payloads, or "
        "backend='fake' for plumbing tests"
    )


def decode_image_features(
    media: DataFrame, backend: str = "native"
) -> DataFrame:
    """image binary -> (media_id, width, height, mean_luma).

    backend='native' really decodes PPM/PGM/BMP (and jpeg/png when PIL
    is importable); 'fake' is the deterministic pseudo-decoder;
    'stub' always raises."""

    def kernel(batches):
        for pdf in batches:
            if backend == "stub":
                _stub_raise("jpeg/png image decode")
            rows = []
            for p in pdf["payload"]:
                if backend == "fake":
                    rows.append(_fake_decode(p))
                else:
                    img = imaging.decode_image(bytes(p))
                    rows.append(
                        (img.shape[1], img.shape[0], imaging.mean_luma(img))
                    )
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


def resize_for_embed(
    media: DataFrame, target: int = 384, backend: str = "native"
) -> DataFrame:
    """The reference's resize-for-embedding transform
    (clip_server.py:91-123): binary -> fixed (target, target, 3)
    float tensor in [0,1], flattened row-major — real bilinear resize
    on the native backend."""

    def kernel(batches):
        for pdf in batches:
            if backend == "stub":
                _stub_raise("image resize")
            out = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if backend == "fake":
                    w, h, luma = _fake_decode(p)
                    rng_base = np.uint64(mid)
                    px = (
                        (
                            np.arange(16, dtype=np.uint64)
                            * np.uint64(2654435761)
                            + rng_base
                        )
                        % np.uint64(256)
                    ).astype(np.float32) / np.float32(255.0) * np.float32(luma)
                    out.append((int(mid), [float(x) for x in px]))
                else:
                    img = imaging.decode_image(bytes(p))
                    small = imaging.resize_bilinear(img, target, target)
                    out.append(
                        (
                            int(mid),
                            (small.astype(np.float32) / np.float32(255.0))
                            .ravel()
                            .tolist(),
                        )
                    )
            yield pd.DataFrame(out, columns=["media_id", "tensor"])

    return media.filter(F.col("kind") == "image").mapInPandas(
        kernel, "media_id long, tensor array<float>"
    )


def thumbnails(
    media: DataFrame, max_side: int = 128, backend: str = "native"
) -> DataFrame:
    """image binary -> (media_id, thumb: binary PPM, width, height) —
    the reference thumbnailer (main.rs:472-562): aspect-preserving
    downscale, real encoded bytes out."""

    def kernel(batches):
        for pdf in batches:
            if backend == "stub":
                _stub_raise("thumbnailing")
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if backend == "fake":
                    w, h, _ = _fake_decode(p)
                    tw = min(w, max_side)
                    th = min(h, max_side)
                    rows.append((int(mid), b"P6 fake", tw, th))
                    continue
                img = imaging.decode_image(bytes(p))
                h, w = img.shape[:2]
                scale = min(max_side / max(w, h), 1.0)
                tw, th = max(int(w * scale), 1), max(int(h * scale), 1)
                thumb = imaging.resize_bilinear(img, tw, th)
                rows.append((int(mid), imaging.encode_ppm(thumb), tw, th))
            yield pd.DataFrame(
                rows, columns=["media_id", "thumb", "width", "height"]
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        kernel, "media_id long, thumb binary, width int, height int"
    )


def sample_video_frames(
    media: DataFrame, every_n: int = 10, backend: str = "native"
) -> DataFrame:
    """1->N frame sampling (video_reader.rs:9-79 UDTF shape): each video
    row expands to ceil(n_frames / every_n) frame rows.  The native
    backend random-access-decodes ONLY the sampled frames from RAWV
    payloads (seek semantics, like the reference's reader) and emits
    each frame's real mean luma."""

    def kernel(batches):
        for pdf in batches:
            if backend == "stub":
                _stub_raise("video decode")
            rows = []
            for mid, p, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                if backend == "fake":
                    n = int(meta["n_frames"] or 0)
                    for fidx in range(0, n, every_n):
                        rows.append((int(mid), fidx, float(fidx) / max(n, 1), None))
                    continue
                data = bytes(p)
                n = imaging.rawv_n_frames(data)
                for fidx in range(0, n, every_n):
                    frame = imaging.decode_rawv_frame(data, fidx)
                    rows.append(
                        (
                            int(mid),
                            fidx,
                            float(fidx) / max(n, 1),
                            imaging.mean_luma(frame),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "position", "mean_luma"],
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        kernel,
        "media_id long, frame_idx int, position double, mean_luma double",
    )
