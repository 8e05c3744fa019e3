"""Multimodal column handling: image/audio/video as opaque BINARY columns
with typed metadata structs.

The container has no image/audio codecs, so the decode kernels are
deliberate stubs (clearly marked) behind real Spark plumbing: schemas,
Arrow-batched ``mapInPandas`` operators with bounded batch sizes, and
partition-size guidance.  Swapping the stub body for PIL/ffmpeg is a
one-function change; everything around it (the part that has to be right
at 100 TB) is real and tested.

Scale design: media blobs are the *widest* columns in a pipeline — the
operators below never shuffle blob bytes.  Feature extraction projects
blobs to small vectors map-side; only metadata and features move.
`spark.sql.files.maxPartitionBytes` should be sized so a partition of
blobs fits executor memory (e.g. 128 MB partitions for ≤10 MB blobs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# typed metadata for an opaque media blob
MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)


def attach_binary_column(df: DataFrame, source_col: str, out_col: str = "blob") -> DataFrame:
    """Materialize a BINARY column (here: UTF-8 bytes of a string column —
    stands in for file bytes) plus its byte length."""
    return df.withColumn(out_col, F.col(source_col).cast("binary")).withColumn(
        f"{out_col}_len", F.octet_length(F.col(out_col)).cast("bigint")
    )


def _decode_image_stub(blob: bytes) -> dict:
    """STUB — deterministic fake decoder.

    A real implementation would `PIL.Image.open(io.BytesIO(blob))`; the
    container has no codecs, so we derive deterministic fake dimensions
    from the byte length (keeps tests meaningful end-to-end).
    """
    n = len(blob)
    return {"mime": "image/fake", "width": n % 640 + 1, "height": n % 480 + 1, "duration_ms": None, "codec": None}


def decode_media(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """mapInPandas media decode: blob → MEDIA_META struct columns.

    Arrow-batched; batch size bounded by spark.sql.execution.arrow
    .maxRecordsPerBatch.  The stub kernel is CPU-trivial; a real decoder
    slots into `_decode_image_stub` unchanged.
    """
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != blob_col]
        + [T.StructField("meta", MEDIA_META, True)]
    )
    other_cols = [f.name for f in df.schema.fields if f.name != blob_col]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_image_stub(b) if b is not None else None for b in pdf[blob_col]]
            out = pdf[other_cols].copy()
            out["meta"] = metas
            yield out

    return df.mapInPandas(op, out_schema)


def extract_features(df: DataFrame, blob_col: str = "blob", dim: int = 8) -> DataFrame:
    """STUB feature extractor: blob → deterministic embedding
    (byte-histogram moments).  Real impl: a vision/audio model via a
    Pandas UDF batching onto GPU (emitting float32; the stub keeps DOUBLE
    so its arithmetic stays exactly oracle-reproducible).  Projects wide
    blobs to narrow vectors map-side — the only thing that should ever
    shuffle."""
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != blob_col]
        + [T.StructField("features", T.ArrayType(T.DoubleType()), True)]
    )
    other_cols = [f.name for f in df.schema.fields if f.name != blob_col]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[blob_col]:
                if b is None:
                    feats.append(None)
                    continue
                acc = [0.0] * dim
                for i, byte in enumerate(b):
                    acc[i % dim] += byte / 255.0
                feats.append([round(x, 4) for x in acc])
            out = pdf[other_cols].copy()
            out["features"] = feats
            yield out

    return df.mapInPandas(op, out_schema)


def frame_sample(df: DataFrame, blob_col: str = "blob", every_n_bytes: int = 1000) -> DataFrame:
    """STUB frame sampler: explode a video blob into per-"frame" rows
    (here: one row per every_n_bytes chunk).  Real impl: ffmpeg keyframe
    extraction.  Demonstrates the explode-of-binary pattern where row
    count grows but each output row is narrow."""
    return (
        df.withColumn("n_frames", F.greatest(F.floor(F.octet_length(F.col(blob_col)) / every_n_bytes), F.lit(1)))
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)))
        .drop("n_frames")
        .withColumn("frame_off", (F.col("frame_idx") * every_n_bytes).cast("bigint"))
    )


def resize_image(df: DataFrame, target_w: int, target_h: int, blob_col: str = "blob") -> DataFrame:
    """STUB image resize: blob → resized blob + updated dimension metadata.

    Real impl: PIL thumbnail/resize inside the same mapInPandas kernel.
    The stub keeps the byte-count contract a resize implies — output
    bytes shrink by the pixel ratio (capped at 1: never upscale) — with
    fake dims derived as in ``_decode_image_stub``, so the plumbing
    (binary in → binary out, bounded Arrow batches, metadata struct
    alongside) is real and the arithmetic is oracle-reproducible.
    Blobs stay map-side; only (id, dims, lengths) should ever shuffle.
    """
    import math

    out_schema = T.StructType(
        [f for f in df.schema.fields]
        + [
            T.StructField("resized", T.BinaryType(), True),
            T.StructField("new_w", T.IntegerType(), True),
            T.StructField("new_h", T.IntegerType(), True),
            T.StructField("new_len", T.LongType(), True),
        ]
    )
    cols = [f.name for f in df.schema.fields]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized, ws, hs, lens = [], [], [], []
            for b in pdf[blob_col]:
                if b is None:
                    resized.append(None), ws.append(None), hs.append(None), lens.append(None)
                    continue
                n = len(b)
                w, h = n % 640 + 1, n % 480 + 1
                ratio = min(1.0, (target_w * target_h) / (w * h))
                m = math.ceil(n * ratio)
                resized.append(bytes(b[:m]))
                ws.append(min(w, target_w))
                hs.append(min(h, target_h))
                lens.append(m)
            out = pdf[cols].copy()
            out["resized"], out["new_w"], out["new_h"], out["new_len"] = resized, ws, hs, lens
            yield out

    return df.mapInPandas(op, out_schema)
