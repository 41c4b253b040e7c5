"""Multimodal (image/audio/video) column plumbing.

Spec extension: treat media as opaque ``binary`` payload columns with
typed metadata, and run decode / feature-extraction / frame-sampling as
Arrow-batched pandas transforms over ``mapInPandas``. The image/audio
codec libraries are NOT in this container, so the codec step is stubbed
(``NotImplementedError`` behind ``require_codecs=True``) — but every
Spark-side piece is real and tested: the schema, the binary payloads,
the partitioning, the UDF signatures and the batch shapes.

What IS fully real without codecs:
  - ``synth_media`` — deterministic binary payload generation (md5-chain
    bytes) so the pipeline has honest ``binary`` data to move;
  - ``byte_histogram_features`` — a 16-bin byte histogram per payload,
    normalized; a genuine distributed feature extractor over binary
    columns (shape-identical to an image embedder: binary in,
    array<float> out);
  - ``media_stats`` — payload sizes/metadata rollups.

Scale posture: payloads stay in executors end to end (no collect);
``mapInPandas`` streams Arrow batches, so peak memory is one batch of
payloads, not one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_s", T.DoubleType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def synth_media(spark: SparkSession, n: int = 256) -> DataFrame:
    """Deterministic fake media table: payload = repeated md5 bytes keyed
    by media_id (binary, 256-4096 bytes), metadata derived from the id."""
    base = spark.range(n).select(F.col("id").alias("media_id"))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("media_id") % 3 + 1).cast("int"),
    )
    reps = (F.col("media_id") % 16 + 1).cast("int")  # 16-256 md5 blocks
    payload = F.unhex(F.repeat(F.md5(F.col("media_id").cast("string")), reps))
    meta = F.struct(
        (F.col("media_id") % 640 + 32).cast("int").alias("width"),
        (F.col("media_id") % 480 + 32).cast("int").alias("height"),
        ((F.col("media_id") % 300).cast("double") / 10.0).alias("duration_s"),
    )
    return base.select("media_id", kind.alias("kind"), payload.alias("payload"), meta.alias("meta"))


def byte_histogram_features(media: DataFrame) -> DataFrame:
    """binary → array<float> feature extraction via mapInPandas.

    16-bin byte histogram, L1-normalized — the honest stand-in for an
    image/audio embedder: same signature, same batch shape, same cost
    profile (CPU over opaque bytes), no codec dependency.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), False),
        ]
    )

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype("float64")
                total = hist.sum()
                feats.append((hist / total if total else hist).astype("float32"))
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.select("media_id", "payload").mapInPandas(extract, out_schema)


def decode_media(media: DataFrame, require_codecs: bool = True) -> DataFrame:
    """Decode stub: the real implementation would Pillow/ffmpeg-decode each
    payload inside ``mapInPandas``. Codec libs are absent in this
    container — calling with ``require_codecs=True`` (the default)
    raises; ``require_codecs=False`` routes to the deterministic
    byte-histogram fake so pipelines can run end to end."""
    if require_codecs:
        raise NotImplementedError(
            "media decode requires image/audio codec libraries (Pillow/ffmpeg) "
            "not present in this environment; pass require_codecs=False for the "
            "deterministic fake-feature path"
        )
    return byte_histogram_features(media)


def frame_sample(media: DataFrame, every_s: float = 1.0, require_codecs: bool = True) -> DataFrame:
    """Video frame-sampling stub (plumbing only): emits one row per
    sampled timepoint from metadata — the decode of each frame is the
    codec-gated step."""
    if require_codecs:
        raise NotImplementedError(
            "frame decoding requires ffmpeg bindings not present in this environment"
        )
    ticks = F.sequence(
        F.lit(0),
        F.greatest(F.floor(F.col("meta.duration_s") / every_s).cast("int"), F.lit(0)),
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(ticks).alias("tick"))
        .select("media_id", (F.col("tick") * every_s).alias("t_s"))
    )


def resize_images(
    media: DataFrame, width: int = 64, height: int = 64, require_codecs: bool = True
) -> DataFrame:
    """Image resize stub (plumbing real, codec gated): the production
    body decodes each payload, resamples to (width, height) and
    re-encodes inside the same ``mapInPandas`` shape as
    ``byte_histogram_features``. Without codecs, the deterministic fake
    keeps the Arrow batch contract honest: payload truncates/repeats to
    the target pixel budget (3 bytes/pixel) and meta gets the new
    dimensions — so downstream schema, partitioning and batch-shape
    behavior are fully testable."""
    if require_codecs:
        raise NotImplementedError(
            "image resize requires Pillow, not present in this environment; "
            "pass require_codecs=False for the deterministic fake path"
        )
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )
    budget = width * height * 3

    def fake_resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                reps = -(-budget // max(len(payload), 1))  # ceil
                out.append((bytes(payload) * reps)[:budget])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(fake_resize, out_schema)
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata/payload rollups per kind — pure relational, no UDF."""
    return (
        media.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.max(F.length("payload")).alias("max_bytes"),
            F.min("meta.width").alias("min_width"),
            F.max("meta.duration_s").alias("max_duration_s"),
        )
    )
