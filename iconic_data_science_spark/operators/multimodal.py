"""Multimodal (image/audio/video) column plumbing.

Spec extension: treat media as opaque ``binary`` payload columns with
typed metadata, and run decode / feature-extraction / frame-sampling as
Arrow-batched pandas transforms over ``mapInPandas``.

Decode is REAL for uncompressed container formats — BMP (24-bit
bottom-up rows, 4-byte padded) and WAV (PCM16) parse in pure
numpy/struct, no codec library needed: ``decode_media`` returns exact
integer pixel/sample statistics per payload. Only compressed-codec
formats (JPEG/PNG/MP3/MP4-class) stay gated behind
``require_codecs=True`` → ``NotImplementedError``; payloads are
format-sniffed by magic bytes.

Also fully real without codecs:
  - ``synth_media`` — deterministic opaque binary payloads (md5-chain
    bytes) for plumbing tests;
  - ``synth_media_real`` — deterministic REAL BMP/WAV payloads built
    distributed (struct-packed in mapInPandas), video kept opaque as
    the stand-in for a compressed container;
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

import struct
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


def synth_media_real(spark: SparkSession, n: int = 256) -> DataFrame:
    """Deterministic media table with REAL payloads: images are 24-bit
    BMPs and audio is PCM16 WAV (both arithmetic-pattern content keyed
    by media_id); video stays an opaque md5-chain payload — the honest
    stand-in for a compressed container this environment cannot decode.
    Built distributed (struct-packed inside mapInPandas), same
    MEDIA_SCHEMA as ``synth_media``."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                k = ("image", "audio", "video")[mid % 3]
                if k == "image":
                    w, h = mid % 16 + 4, mid % 12 + 4
                    idx = np.arange(h * w * 3, dtype=np.int64).reshape(h, w, 3)
                    px = ((mid * 31 + (idx // 3) * 7 + (idx % 3) * 13) % 256).astype(np.uint8)
                    payload = encode_bmp(w, h, px)
                    meta = {"width": w, "height": h, "duration_s": None}
                elif k == "audio":
                    ns = mid % 500 + 100
                    i = np.arange(ns, dtype=np.int64)
                    samples = ((mid * 13 + i * 17) % 4096) - 2048
                    payload = encode_wav(8000, samples)
                    meta = {"width": None, "height": None, "duration_s": ns / 8000.0}
                else:
                    block = hashlib.md5(str(mid).encode()).digest()
                    payload = block * (mid % 16 + 1)
                    meta = {"width": None, "height": None, "duration_s": float(mid % 300) / 10.0}
                rows.append({"media_id": mid, "kind": k, "payload": payload, "meta": meta})
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return (
        spark.range(n)
        .select(F.col("id").alias("media_id"))
        .mapInPandas(gen, MEDIA_SCHEMA)
    )


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


# --------------------------------------------------------------------------
# real uncompressed-format codecs (pure numpy/struct — no external libs)


def encode_bmp(width: int, height: int, pixels: "np.ndarray") -> bytes:
    """24-bit uncompressed BMP: BITMAPFILEHEADER + BITMAPINFOHEADER +
    bottom-up BGR rows padded to 4 bytes. ``pixels`` is (height, width, 3)
    uint8 in RGB top-down order (the conventional in-memory layout)."""
    row_bytes = (width * 3 + 3) & ~3
    img_size = row_bytes * height
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = bytearray()
    pad = b"\x00" * (row_bytes - width * 3)
    for y in range(height - 1, -1, -1):  # bottom-up
        rows += pixels[y, :, ::-1].tobytes() + pad  # RGB → BGR
    return header + info + bytes(rows)


def decode_bmp(buf: bytes) -> "np.ndarray":
    """Parse a 24-bit uncompressed BMP into (height, width, 3) uint8 RGB
    top-down — the inverse of ``encode_bmp``."""
    import numpy as np

    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", buf, 10)
    hdr_size, width, height, _planes, bpp, compression = struct.unpack_from("<IiiHHI", buf, 14)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} compression={compression}")
    row_bytes = (width * 3 + 3) & ~3
    out = np.empty((abs(height), width, 3), dtype=np.uint8)
    top_down = height < 0
    h = abs(height)
    for i in range(h):
        row = np.frombuffer(buf, dtype=np.uint8, count=width * 3, offset=offset + i * row_bytes)
        y = i if top_down else h - 1 - i
        out[y] = row.reshape(width, 3)[:, ::-1]  # BGR → RGB
    return out


def encode_wav(sample_rate: int, samples: "np.ndarray", channels: int = 1) -> bytes:
    """PCM16 mono/interleaved WAV (RIFF/WAVE, fmt + data chunks)."""
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(buf: bytes) -> tuple[int, int, "np.ndarray"]:
    """Parse a PCM16 WAV → (sample_rate, channels, samples int16 array).
    Walks RIFF chunks (fmt may be followed by LIST/fact before data)."""
    import numpy as np

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, sample_rate, channels, bits = 12, None, None, None
    while pos + 8 <= len(buf):
        cid, size = struct.unpack_from("<4sI", buf, pos)
        pos += 8
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", buf, pos)
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV variant: fmt={audio_fmt} bits={bits}")
        elif cid == b"data":
            if sample_rate is None:
                raise ValueError("WAV data chunk before fmt chunk")
            samples = np.frombuffer(buf, dtype="<i2", count=size // 2, offset=pos)
            return sample_rate, channels, samples
        pos += size + (size & 1)  # chunks are word-aligned
    raise ValueError("WAV payload has no data chunk")


def sniff_format(buf: bytes) -> str:
    """Magic-byte format sniff: 'bmp' / 'wav' (decodable here) or the
    compressed-codec families ('jpeg', 'png', 'mp3', 'mp4') that need
    real codec libraries; anything else is 'unknown'."""
    if buf[:2] == b"BM":
        return "bmp"
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return "wav"
    if buf[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if buf[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if buf[:3] == b"ID3" or buf[:2] in (b"\xff\xfb", b"\xff\xf3"):
        return "mp3"
    if len(buf) >= 12 and buf[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("n_pixels", T.LongType(), True),
        T.StructField("sum_abs", T.LongType(), True),  # Σ pixel bytes / Σ|sample|
        T.StructField("peak", T.IntegerType(), True),  # max byte / max |sample|
    ]
)


def decode_media(media: DataFrame, require_codecs: bool = True) -> DataFrame:
    """Real decode for uncompressed formats: BMP payloads parse to exact
    pixel statistics and WAV payloads to exact sample statistics (pure
    numpy — integer outputs, fully deterministic). Compressed formats
    (JPEG/PNG/MP3/MP4) and unknown payloads raise ``NotImplementedError``
    under ``require_codecs=True`` (the honest codec gate — those need
    Pillow/ffmpeg, absent here); with ``require_codecs=False`` they
    yield a row with format sniffed and null stats, so mixed-corpus
    pipelines still run end to end."""

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload)
                fmt = sniff_format(buf)
                row = {"media_id": mid, "format": fmt}
                if fmt == "bmp":
                    px = decode_bmp(buf)
                    row.update(
                        width=px.shape[1],
                        height=px.shape[0],
                        n_channels=3,
                        n_pixels=px.shape[0] * px.shape[1],
                        sum_abs=int(px.astype("int64").sum()),
                        peak=int(px.max()),
                    )
                elif fmt == "wav":
                    sr, ch, samples = decode_wav(buf)
                    a = np.abs(samples.astype("int64"))
                    row.update(
                        n_channels=ch,
                        sample_rate=sr,
                        n_samples=len(samples),
                        sum_abs=int(a.sum()),
                        peak=int(a.max()) if len(a) else 0,
                    )
                elif require_codecs:
                    raise NotImplementedError(
                        f"decoding {fmt!r} payloads requires codec libraries "
                        "(Pillow/ffmpeg) not present in this environment; pass "
                        "require_codecs=False to pass them through with null stats"
                    )
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_SCHEMA.fields])

    return media.select("media_id", "payload").mapInPandas(decode, DECODE_SCHEMA)


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
    """Image resize — REAL for BMP payloads: decode → nearest-neighbor
    resample to (width, height) in numpy → re-encode as BMP, all inside
    one ``mapInPandas`` pass (binary in, binary out — the image-pipeline
    shape). Compressed formats (JPEG/PNG) still need Pillow: they raise
    under ``require_codecs=True`` and are dropped under False."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload)
                fmt = sniff_format(buf)
                if fmt != "bmp":
                    if require_codecs:
                        raise NotImplementedError(
                            f"resizing {fmt!r} payloads requires Pillow, not present "
                            "in this environment; BMP payloads resize natively"
                        )
                    continue
                px = decode_bmp(buf)
                ys = (np.arange(height) * px.shape[0] // height).clip(0, px.shape[0] - 1)
                xs = (np.arange(width) * px.shape[1] // width).clip(0, px.shape[1] - 1)
                out = px[ys][:, xs]
                rows.append(
                    {
                        "media_id": mid,
                        "payload": encode_bmp(width, height, out),
                        "width": width,
                        "height": height,
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "payload", "width", "height"])

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(resize, out_schema)
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
