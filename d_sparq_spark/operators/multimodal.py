"""Multimodal (image/audio/video) column plumbing (SURVEY §2.C).

Policy per the build mandate: media decode libraries are NOT in this
environment, so the decode step is stubbed — but everything Spark-side is
real and tested: the schema (opaque `binary` content + typed metadata
struct), the partitioning contract, the Arrow batch shape through
mapInPandas, and the UDF signatures. Swapping `_decode_stub` for
PIL/ffmpeg is a one-function change.

Schema convention:
    content   BINARY                      -- opaque media bytes
    media     STRUCT<kind STRING, byte_len BIGINT, digest STRING>

At 100 TB: binary columns ride Parquet as-is (no row-group bloat beyond
their size); decode/resize/frame-sample runs via mapInPandas with
spark.sql.execution.arrow.maxRecordsPerBatch tuned down (big blobs →
small Arrow batches), and the shuffle NEVER carries decoded tensors —
only extracted features.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_AVAILABLE = False  # flips when a real decoder is wired in


def attach_media(df: DataFrame, bytes_col: F.Column, kind: str) -> DataFrame:
    """Wrap raw bytes into the (content, media) convention — pure column
    ops, no UDF: byte length and sha256 digest are computed JVM-side."""
    return df.withColumn("content", bytes_col).withColumn(
        "media",
        F.struct(
            F.lit(kind).alias("kind"),
            F.length(F.col("content")).cast("long").alias("byte_len"),
            F.sha2(F.col("content"), 256).alias("digest"),
        ),
    )


def _decode_stub(blob: bytes) -> dict:
    """Deterministic fake decode: derives pseudo width/height/duration from
    the content bytes. Replace with PIL.Image.open / av.open in production.
    Raising NotImplementedError here would poison whole pipelines, so the
    stub returns marked-fake values instead; DECODE_AVAILABLE tells callers
    which mode they're in."""
    h = sum(blob[:64]) if blob else 0
    return {"width": 16 + h % 64, "height": 16 + (h // 64) % 64, "fake": True}


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (content, media) rows: the real
    Arrow path a production decode would use. Output schema is fixed and
    engine-checked; the decode itself is the documented stub. Arrow batch
    sizing is the session's arrow.maxRecordsPerBatch — a per-call hint
    parameter existed here but was never wired, which is worse than none
    (review r4); tune the conf when blobs are large."""
    out_schema = (
        "digest string, kind string, byte_len long, width long, height long, is_fake boolean"
    )
    decode = _decode_stub
    # NB the local binding does NOT make the closure self-contained —
    # cloudpickle serializes module-level functions by reference either
    # way; executor importability comes from session.ship_package (the
    # registry wrapper calls it before any UDF runs)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode(b) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "digest": [m["digest"] for m in pdf["media"]],
                    "kind": [m["kind"] for m in pdf["media"]],
                    "byte_len": [m["byte_len"] for m in pdf["media"]],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "is_fake": [f["fake"] for f in feats],
                }
            )

    return df.select("content", "media").mapInPandas(batches, out_schema)


def resize_stub(df: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize plumbing: mapInPandas pass that would hold the decoded image;
    the stub re-digests content + records the target geometry. Output
    schema is what a PIL-backed implementation returns."""
    schema = "digest string, width long, height long, resized_bytes long"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "digest": [m["digest"] for m in pdf["media"]],
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    # fake: 3 bytes/pixel; a real impl returns len(out_bytes)
                    "resized_bytes": [width * height * 3] * len(pdf),
                }
            )

    return df.select("media").mapInPandas(batches, schema)


def frame_sample_stub(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    (explode-shaped mapInPandas — the batch contract a PyAV decoder needs).
    Frame count is derived deterministically from content length."""
    schema = "digest string, frame_idx long"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            digests, idxs = [], []
            for m in pdf["media"]:
                if m is None or m["byte_len"] is None:  # NULL content row
                    continue
                n_frames = max(1, int(m["byte_len"]) % 300)
                for i in range(0, n_frames, every_n):
                    digests.append(m["digest"])
                    idxs.append(i)
            yield pd.DataFrame({"digest": digests, "frame_idx": idxs})

    return df.select("media").mapInPandas(batches, schema)
