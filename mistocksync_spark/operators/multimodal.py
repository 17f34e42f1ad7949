"""Multimodal column plumbing (north-star extension).

Images/audio/video are carried as opaque ``binary`` payload columns with a
typed metadata struct.  The Spark-side plumbing — schema, Arrow-batched
``mapInPandas`` signature, partition sizing — is real and tested; the
actual codec work is stubbed: the container has no image/audio libraries,
so ``decode_stub`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, which produces seeded fake features (stable
across runs) to exercise the pipeline end-to-end.

At 100 TB: payloads dominate row size, so the media table should be stored
with the payload column last (parquet column pruning keeps metadata-only
queries cheap) and partitioned by ``modality``; ``mapInPandas`` keeps
batches bounded via spark.sql.execution.arrow.maxRecordsPerBatch rather
than loading a whole partition of blobs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("mime_type", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("source_doc_id", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("payload_bytes", LongType(), True),
        StructField("payload_sha", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_sec", DoubleType(), True),
        StructField("feature_0", DoubleType(), True),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents corpus: payload = utf-8 bytes
    of the text (a deterministic opaque blob), modality round-robins."""
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.col("doc_id").alias("source_doc_id"),
    )


def extract_features(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    The real decode (PIL/ffmpeg/torchaudio) is environment-gated; with
    ``deterministic_fake`` the 'decoded' dimensions/features are seeded from
    the payload sha256 so the pipeline is fully testable without codecs.
    """

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg, not present in "
                    "this environment — pass deterministic_fake=True"
                )
            if len(pdf) == 0:
                continue
            # the digest is per-row by nature; every derived feature is
            # column-wise on the batch (no iterrows)
            payloads = [p if p is not None else b"" for p in pdf["payload"].tolist()]
            shas = [hashlib.sha256(p).hexdigest() for p in payloads]
            seed = np.array([int(s[:8], 16) for s in shas], dtype="int64")
            modality = pdf["modality"].to_numpy()
            is_img = modality == "image"
            is_av = (modality == "audio") | (modality == "video")
            width = pd.array(64 + seed % 1024, dtype="Int64")
            height = pd.array(64 + (seed // 1024) % 1024, dtype="Int64")
            width[~is_img] = pd.NA
            height[~is_img] = pd.NA
            # nullable Float64 so non-audio/video rows become SQL NULL, not NaN
            duration = pd.array(np.round((seed % 36000) / 10.0, 1), dtype="Float64")
            duration[~is_av] = pd.NA
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "modality": modality,
                    "payload_bytes": np.array([len(p) for p in payloads], dtype="int64"),
                    "payload_sha": shas,
                    "width": width,
                    "height": height,
                    "duration_sec": duration,
                    "feature_0": (seed % 100000) / 100000.0,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def write_media_partitioned(media: DataFrame, path: str) -> str:
    """Persist the media table partitioned by ``modality`` with the payload
    column last — metadata-only queries prune both partitions (directory
    level) and the payload column (parquet column chunk level), so
    "count images by mime type" style queries never touch the blobs."""
    cols = [c for c in media.columns if c != "payload"] + ["payload"]
    media.select(*cols).write.mode("overwrite").partitionBy("modality").parquet(path)
    return path


def frame_sample_manifest(
    media: DataFrame,
    stride_sec: float = 2.0,
    max_frames: int = 16,
) -> DataFrame:
    """Frame/clip sampling schedule for video/audio rows: one row per
    sample timestamp — every ``stride_sec`` from t=0, capped at
    ``max_frames`` evenly-strided samples per item — the manifest a decode
    fleet consumes (each row is one independent unit of work, so the
    decode stage parallelizes by row, not by file).

    Duration comes from the typed metadata (here the deterministic-fake
    ``duration_sec`` of ``extract_features``; a production table stores
    probed metadata).  Pure ``sequence``/``explode`` expressions —
    image rows (no duration) emit a single t=0 sample.
    """
    dur = F.coalesce(F.col("duration_sec"), F.lit(0.0))
    n_raw = F.greatest((dur / F.lit(stride_sec)).cast("long"), F.lit(1))
    n = F.least(n_raw, F.lit(max_frames))
    # exact stride while uncapped; only when the cap bites does the
    # stride stretch to keep the n samples evenly spread over the item
    eff = (
        F.when(n_raw > F.lit(max_frames), dur / n.cast("double"))
        .when(n > 1, F.lit(stride_sec))
        .otherwise(F.lit(0.0))
    )
    idx = F.explode(F.sequence(F.lit(0), (n - 1).cast("int")))
    return (
        media.select(
            "media_id",
            "modality",
            F.col("duration_sec"),
            eff.alias("__eff"),
            n.alias("n_samples"),
        )
        .select(
            "media_id",
            "modality",
            "n_samples",
            idx.alias("sample_idx"),
            F.col("__eff"),
        )
        .select(
            "media_id",
            "modality",
            "n_samples",
            "sample_idx",
            # floor(x*1000+0.5)/1000, not round(x, 3): the stretched
            # stride is dur/16 whose multiples land on exact 3-dp half
            # cases (k/160 rationals), where round(double) diverges
            # cross-engine (see functions/numeric.py); the floor form is
            # pure IEEE and bit-identical everywhere.
            (
                F.floor(F.col("sample_idx") * F.col("__eff") * F.lit(1000.0) + F.lit(0.5))
                / F.lit(1000.0)
            ).alias("sample_t_sec"),
        )
    )
