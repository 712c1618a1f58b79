"""Multimodal (image/audio/video) column plumbing.

Media ride through the engine as opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction / resize / frame-sampling run
as Arrow-batched ``mapInPandas`` stages. The actual codecs are NOT available
in this environment — the decode kernel is stubbed with a deterministic fake
(clearly marked) behind the same Spark-side plumbing (schema, batching,
partitioning) the real one would use, so swapping in PIL/ffmpeg later only
replaces ``_decode_fake``.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),      # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def attach_media(df: DataFrame, binary_col: str, media_type: str, fmt: str) -> DataFrame:
    """Stamp the typed metadata struct onto an opaque binary column."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def _decode_fake(payload: bytes) -> dict:
    """DETERMINISTIC FAKE decode — real image/audio codecs are not installed
    in this container. Derives pseudo width/height/intensity from the
    content hash so the full pipeline (schema, batching, joins downstream)
    is exercised end-to-end with stable outputs."""
    digest = hashlib.md5(payload).hexdigest()
    return {
        "n_bytes": len(payload),
        "content_hash": digest,
        "width": 64 + int(digest[:4], 16) % 1024,
        "height": 64 + int(digest[4:8], 16) % 1024,
        "mean_intensity": (int(digest[8:12], 16) % 10_000) / 10_000.0,
    }


def _decode_real(payload: bytes) -> dict:  # pragma: no cover
    raise NotImplementedError(
        "real media decode requires PIL/ffmpeg — not available in this "
        "environment; use use_fake_decoder=True (deterministic fake) or "
        "swap this function in a full deployment"
    )


def extract_media_features(
    df: DataFrame,
    binary_col: str = "payload",
    use_fake_decoder: bool = True,
    auto_repartition: bool = False,
) -> DataFrame:
    """Decode + feature-extract media blobs via Arrow-batched mapInPandas.

    The UDF sees pandas DataFrames of ~10k rows (Arrow batch), keeping
    per-row Python overhead amortized; output schema is the input plus the
    ``FEATURES_SCHEMA`` fields.

    Decode is CPU-bound Python, so parallelism = partition count. Real
    corpora arrive in many splits, so the stage parallelizes naturally; for
    a narrow input with HEAVY per-row decode, set ``auto_repartition`` to
    widen to default parallelism first. It is off by default because
    spinning up N Python workers costs ~15s locally — far more than light
    decode work on a small partition.
    """
    import pandas as pd

    decode = _decode_fake if use_fake_decoder else _decode_real
    if auto_repartition:
        target = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    out_schema = T.StructType(list(df.schema.fields) + list(FEATURES_SCHEMA.fields))

    def batches(it):
        for pdf in it:
            feats = pd.DataFrame(
                [decode(bytes(x)) for x in pdf[binary_col]], index=pdf.index
            )
            yield pd.concat([pdf, feats], axis=1)

    return df.mapInPandas(batches, out_schema)
