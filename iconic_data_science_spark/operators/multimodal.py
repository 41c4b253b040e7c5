"""Multimodal (image/audio/video) column plumbing.

Spec extension: treat media as opaque ``binary`` payload columns with
typed metadata, and run decode / feature-extraction / frame-sampling as
Arrow-batched pandas transforms over ``mapInPandas``.

Decode is REAL for BMP (24-bit bottom-up rows, 4-byte padded), WAV
(PCM16), AVI (RIFF 'vids' BI_RGB frames) — pure numpy/struct — and for
the compressed image formats PNG (8-bit truecolor/RGBA, all five
scanline filters; DEFLATE ships in stdlib zlib), GIF87a/89a (full
variable-width LZW implemented here) and baseline JPEG (DCT + canonical
Huffman from the T.81 spec, operators/jpeg.py — encode and decode): no
external library is needed for any of them. The codec gate now covers
only the audio/video compressed families (MP3/MP4-class).
``decode_media`` returns exact integer pixel/sample statistics per
payload and ``frame_sample`` decodes real frames at sampled
timepoints. Only external-codec formats (JPEG/MP3/MP4-class) stay
gated behind ``require_codecs=True`` → ``NotImplementedError``;
payloads are format-sniffed by magic bytes.

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


# Synthetic fixtures are a few hundred rows; fan them over a handful of
# partitions instead of local[32]'s default so a fixture query spins up
# ~8 Python workers, not 32-64 (the parity-harness tail was worker
# startup, not work).
_SYNTH_PARTITIONS = 8


def _real_media_row(mid: int, lossless: bool = False) -> dict:
    """One deterministic REAL payload keyed by media_id (shared by
    synth_media_real and synth_media_mixed). ``lossless=True``
    restricts images to the bit-exact codecs (BMP/PNG) so every decode
    statistic is a pure integer function of media_id — the
    arithmetic-replay oracle contract (GIF palletizes >256-color
    patterns and JPEG quantizes, so their decoded pixels are codec
    outputs, not generator arithmetic)."""
    import numpy as np

    k = ("image", "audio", "video")[mid % 3]
    if k == "image":
        w, h = mid % 16 + 4, mid % 12 + 4
        idx = np.arange(h * w * 3, dtype=np.int64).reshape(h, w, 3)
        px = ((mid * 31 + (idx // 3) * 7 + (idx % 3) * 13) % 256).astype(np.uint8)
        # rotate the four real image codecs (two lossless ones under
        # the oracle contract)
        codec = (mid // 3) % (2 if lossless else 4)
        if codec == 0:
            payload = encode_bmp(w, h, px)
        elif codec == 1:
            payload = encode_png(px)
        elif codec == 2:
            payload = encode_gif(px)
        else:
            from .jpeg import encode_jpeg

            payload = encode_jpeg(px)
        meta = {"width": w, "height": h, "duration_s": None}
    elif k == "audio":
        ns = mid % 500 + 100
        i = np.arange(ns, dtype=np.int64)
        samples = ((mid * 13 + i * 17) % 4096) - 2048
        payload = encode_wav(8000, samples)
        meta = {"width": None, "height": None, "duration_s": ns / 8000.0}
    else:
        # real uncompressed AVI: nf frames of an arithmetic
        # pixel pattern at 5 fps
        nf, w, h = mid % 4 + 2, mid % 12 + 4, mid % 8 + 4
        idx = np.arange(nf * h * w * 3, dtype=np.int64).reshape(nf, h, w, 3)
        px = ((mid * 31 + (idx // 3) * 7 + (idx % 3) * 13 + (idx // (h * w * 3)) * 97) % 256).astype(np.uint8)
        payload = encode_avi(w, h, 5, px)
        meta = {"width": w, "height": h, "duration_s": nf / 5.0}
    return {"media_id": mid, "kind": k, "payload": payload, "meta": meta}


def _container_media_row(mid: int) -> dict:
    """One deterministic CONTAINER payload (MP4 skeleton / MP3 frames)
    whose sample codecs stay gated."""
    if mid % 5 == 3:
        return {
            "media_id": mid,
            "kind": "video",
            "payload": encode_mp4_skeleton(float(mid % 90 + 1), 1000, mid % 3 + 1),
            "meta": {"width": None, "height": None, "duration_s": float(mid % 90 + 1)},
        }
    return {
        "media_id": mid,
        "kind": "audio",
        "payload": encode_mp3_frames(mid % 40 + 5),
        "meta": {"width": None, "height": None,
                 "duration_s": (mid % 40 + 5) * 1152 / 44100},
    }


def synth_media_real(spark: SparkSession, n: int = 256) -> DataFrame:
    """Deterministic media table with REAL payloads: images rotate
    the three real codecs (24-bit BMP, 8-bit-RGB PNG via stdlib zlib,
    GIF87a via the LZW implementation here), audio is PCM16 WAV, video
    is uncompressed RIFF AVI (BI_RGB '00db' frames) — all
    arithmetic-pattern content keyed by media_id, parseable here
    without external codec libraries. Built distributed
    (struct-packed inside mapInPandas), same MEDIA_SCHEMA as
    ``synth_media`` (whose opaque payloads remain the codec-gate
    fixtures)."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = [_real_media_row(int(mid)) for mid in pdf["media_id"]]
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return (
        spark.range(0, n, 1, _SYNTH_PARTITIONS)
        .select(F.col("id").alias("media_id"))
        .mapInPandas(gen, MEDIA_SCHEMA)
    )


def synth_media_lossless(spark: SparkSession, n: int = 256) -> DataFrame:
    """:func:`synth_media_real` restricted to the bit-exact codecs
    (BMP/PNG images, PCM16 WAV, uncompressed AVI): every pixel/sample
    the decoder recovers equals the generator arithmetic, so decode
    statistics are SQL-replayable from media_id alone (the
    ``mm_lossless_decode_stats`` hash-oracle contract)."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = [_real_media_row(int(mid), lossless=True) for mid in pdf["media_id"]]
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return (
        spark.range(0, n, 1, _SYNTH_PARTITIONS)
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


def byte_histogram_bins(media: DataFrame) -> DataFrame:
    """binary → exploded integer histogram rows via mapInPandas.

    (media_id, bin, cnt): the 16-bin high-nibble byte histogram as RAW
    BIGINT counts, one row per (payload, bin) — every bin present,
    zeros included. The exploded-integer twin of
    :func:`byte_histogram_features` (whose L1-normalized
    ``array<float>`` output is the embedder-shaped surface): integers
    survive any canonicalizer and hash-match an ANSI-SQL oracle —
    ``synth_media`` payloads are repeated md5 blocks, so a SQL engine
    can replay the histogram by counting hex digits at odd positions of
    ``md5(CAST(media_id AS VARCHAR))`` times the repeat count.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("bin", T.LongType(), False),
            T.StructField("cnt", T.LongType(), False),
        ]
    )

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            mids, bins, cnts = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=FEATURE_DIM)
                mids.extend([int(mid)] * FEATURE_DIM)
                bins.extend(range(FEATURE_DIM))
                cnts.extend(int(c) for c in hist)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "bin": pd.Series(bins, dtype="int64"),
                    "cnt": pd.Series(cnts, dtype="int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(extract, out_schema)


def _neardup_base_pixels(g: int, w: int = 128, h: int = 96) -> "np.ndarray":
    """Deterministic group-g base image for the pHash near-dup corpus:
    a seeded-LCG ±1 sign for each low-frequency DCT cell, rendered as
    the sum of those cosine bases. Every pHash bit then sits FAR from
    the median threshold (the coefficients are bimodal ±A, the median
    is the gap between modes), so the hash is stable under JPEG
    quantization and nearest-neighbor resampling while two different
    groups differ in ~half their sign bits — measured: within-group
    hamming ≤ 4, cross-group ≥ 22 over 16 groups × 4 variants."""
    import numpy as np

    state = (g * 2654435761 + 1) % (1 << 31)
    signs = {}
    for u in range(8):
        for v in range(8):
            if u == 0 and v == 0:
                continue
            state = (state * 1103515245 + 12345) % (1 << 31)
            signs[(u, v)] = 1.0 if (state >> 16) & 1 else -1.0
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w))
    for (u, v), s in signs.items():
        img += s * np.cos(np.pi * v * (xx + 0.5) / w) * np.cos(np.pi * u * (yy + 0.5) / h)
    px = np.clip(np.rint(127.5 + 14.0 * img), 0, 255).astype(np.uint8)
    return np.stack([px, px, px], axis=-1)


NEARDUP_VARIANTS = 4


def synth_image_neardup(spark: SparkSession, n_groups: int = 16) -> DataFrame:
    """Deterministic near-duplicate image corpus for the pHash gate:
    ``n_groups`` base images (see :func:`_neardup_base_pixels`), each
    shipped as 4 variants — BMP original, PNG re-encode (bit-exact →
    hamming 0), JPEG re-encode (quantized), and a 3/4 nearest-resize
    BMP. ``media_id = group * 4 + variant``, so the ground-truth
    near-dup pairs are pure id arithmetic: exactly the within-group
    pairs — which is what lets the end-to-end decode → DCT → band-join
    pipeline be HASH-oracled by a plain SQL replay over range()."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from .jpeg import encode_jpeg

        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                g, v = divmod(mid, NEARDUP_VARIANTS)
                px = _neardup_base_pixels(g)
                if v == 0:
                    payload = encode_bmp(px.shape[1], px.shape[0], px)
                elif v == 1:
                    payload = encode_png(px)
                elif v == 2:
                    payload = encode_jpeg(px)
                else:
                    H, W = (px.shape[0] * 3) // 4, (px.shape[1] * 3) // 4
                    ys = (np.arange(H) * px.shape[0] // H).clip(0, px.shape[0] - 1)
                    xs = (np.arange(W) * px.shape[1] // W).clip(0, px.shape[1] - 1)
                    small = px[ys][:, xs]
                    payload = encode_bmp(W, H, small)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": "image",
                        "payload": payload,
                        "meta": {"width": None, "height": None, "duration_s": None},
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return (
        spark.range(0, n_groups * NEARDUP_VARIANTS, 1, _SYNTH_PARTITIONS)
        .select(F.col("id").alias("media_id"))
        .mapInPandas(gen, MEDIA_SCHEMA)
    )


def phash64(media: DataFrame) -> DataFrame:
    """(media_id, phash) — 64-bit perceptual hash over REAL decoded
    pixels (the classic pHash recipe, public domain: grayscale →
    32×32 nearest resample → 2-D orthonormal DCT-II → top-left 8×8
    low-frequency block → median threshold; DC bit forced 0). Decodes
    BMP/PNG/GIF/JPEG through the codecs in this package — one
    Arrow-batched mapInPandas pass, numpy matrix products, no external
    image libraries. Non-image payloads are skipped.

    The content-level twin of the text fingerprint family: byte-level
    dedup misses a re-encoded or resized image; the pHash survives
    both (pinned by the resize/JPEG round-trip test)."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("phash", T.LongType(), False),
        ]
    )
    # 32-point orthonormal DCT-II matrix (same construction as the 8x8
    # one in operators/jpeg.py)
    n = 32
    k = np.arange(n)
    D = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    D[0] /= np.sqrt(2.0)

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from .jpeg import decode_jpeg

        decoders = {"bmp": decode_bmp, "png": decode_png, "gif": decode_gif, "jpeg": decode_jpeg}
        for pdf in batches:
            mids, hashes = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload)
                fmt = sniff_format(buf)
                dec = decoders.get(fmt)
                if dec is None:
                    continue
                px = dec(buf)[:, :, :3].astype(np.float64)
                gray = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
                h, w = gray.shape
                yi = (np.arange(n) * h) // n
                xi = (np.arange(n) * w) // n
                small = gray[np.ix_(yi, xi)]
                block = (D @ small @ D.T)[:8, :8].flatten()
                med = np.median(block[1:])
                bits = (block > med)
                bits[0] = False  # DC carries brightness, not structure
                val = 0
                for i in range(64):
                    if bits[i]:
                        val |= 1 << i
                # fold to signed 64-bit for the LongType column
                if val >= 1 << 63:
                    val -= 1 << 64
                mids.append(int(mid))
                hashes.append(val)
            yield pd.DataFrame(
                {"media_id": pd.Series(mids, dtype="int64"),
                 "phash": pd.Series(hashes, dtype="int64")}
            )

    return media.select("media_id", "payload").mapInPandas(extract, out_schema)


def phash_neardup_pairs(
    phashes: DataFrame, max_hamming: int = 10, n_bands: int = 4
) -> DataFrame:
    """(id1, id2, hamming) — near-duplicate image pairs by banded
    perceptual-hash join: the 64-bit pHash splits into ``n_bands``
    16-bit bands, candidates share at least one exact band (the
    pigeonhole rule — recall GUARANTEED for hamming < n_bands, best-
    effort beyond, the ``dedup_simhash_pairs`` trade), and candidates
    verify by exact popcount of the XOR. Relational end to end: the
    only shuffle is the band-value self-join — never an all-pairs
    comparison, which is what makes image dedup run on a crawl-scale
    corpus."""
    width = 64 // n_bands
    bands = phashes.select(
        "media_id",
        "phash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.expr(
                        f"shiftright(phash, {b * width}) & {(1 << width) - 1}"
                    ).alias("val"),
                )
                for b in range(n_bands)
            ])
        ).alias("bv"),
    ).select("media_id", "phash", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    b1 = bands.select(
        F.col("media_id").alias("id1"), F.col("phash").alias("p1"), "band", "val"
    )
    b2 = bands.select(
        F.col("media_id").alias("id2"), F.col("phash").alias("p2"), "band", "val"
    )
    cand = (
        b1.join(b2, ["band", "val"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "p1", "p2")
        .distinct()
    )
    hamming = F.bit_count(F.col("p1").bitwiseXOR(F.col("p2")))
    return (
        cand.select("id1", "id2", hamming.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


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


def encode_avi(width: int, height: int, fps: int, frames: "np.ndarray") -> bytes:
    """Uncompressed AVI (RIFF 'AVI ' / 'vids' stream, BI_RGB '00db'
    frames): ``frames`` is (n, height, width, 3) uint8 RGB top-down;
    each frame is stored as bottom-up BGR rows padded to 4 bytes — the
    same raster as ``encode_bmp``. Pure struct/numpy, no codec libs."""
    n = len(frames)
    row_bytes = (width * 3 + 3) & ~3
    frame_size = row_bytes * height

    def chunk(cid: bytes, data: bytes) -> bytes:
        return struct.pack("<4sI", cid, len(data)) + data + (b"\x00" * (len(data) & 1))

    def lst(subtype: bytes, payload: bytes) -> bytes:
        return struct.pack("<4sI4s", b"LIST", 4 + len(payload), subtype) + payload

    avih = struct.pack(
        "<10I4I",
        1_000_000 // fps, frame_size * fps, 0, 0, n, 0, 1, frame_size,
        width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0, 0,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, frame_size, 2835, 2835, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    pad = b"\x00" * (row_bytes - width * 3)
    movi_frames = bytearray()
    for f in frames:
        raster = bytearray()
        for y in range(height - 1, -1, -1):  # bottom-up
            raster += f[y, :, ::-1].tobytes() + pad  # RGB → BGR
        movi_frames += chunk(b"00db", bytes(raster))
    movi = lst(b"movi", bytes(movi_frames))
    body = b"AVI " + hdrl + movi
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_avi(buf: bytes) -> tuple[float, "np.ndarray"]:
    """Parse an uncompressed AVI → (fps, frames (n, h, w, 3) uint8 RGB
    top-down) — the inverse of ``encode_avi``. Walks RIFF LIST chunks;
    only the BI_RGB 24-bit 'vids' layout is supported."""
    import numpy as np

    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    info: dict = {}
    frame_spans: list[tuple[int, int]] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid, size = struct.unpack_from("<4sI", buf, pos)
            pos += 8
            if cid == b"LIST":
                walk(pos + 4, pos + size)
            elif cid == b"strh":
                fcc, _handler, *_rest = struct.unpack_from("<4s4s", buf, pos)
                if fcc == b"vids":
                    scale, rate = struct.unpack_from("<II", buf, pos + 20)
                    info["fps"] = rate / scale
            elif cid == b"strf":
                _sz, w, h, _planes, bpp, compression = struct.unpack_from("<IiiHHI", buf, pos)
                if bpp != 24 or compression != 0:
                    raise ValueError(f"unsupported AVI variant: bpp={bpp} compression={compression}")
                info["w"], info["h"] = w, h
            elif cid in (b"00db", b"00dc"):
                frame_spans.append((pos, size))
            pos += size + (size & 1)

    walk(12, len(buf))
    if "w" not in info or "fps" not in info:
        raise ValueError("AVI payload missing stream headers")
    w, h = info["w"], info["h"]
    row_bytes = (w * 3 + 3) & ~3
    frames = np.empty((len(frame_spans), h, w, 3), dtype=np.uint8)
    for fi, (off, _size) in enumerate(frame_spans):
        for i in range(h):
            row = np.frombuffer(buf, dtype=np.uint8, count=w * 3, offset=off + i * row_bytes)
            frames[fi, h - 1 - i] = row.reshape(w, 3)[:, ::-1]  # BGR → RGB
    return info["fps"], frames


def encode_png(pixels: "np.ndarray") -> bytes:
    """Real PNG encoder (pure stdlib zlib + struct): 8-bit truecolor
    (RGB, color type 2) or truecolor+alpha (RGBA, color type 6),
    non-interlaced, filter 0 scanlines. ``pixels`` is (h, w, 3|4) uint8
    top-down. PNG is a *compressed* format — but its codec is DEFLATE,
    which ships in the Python standard library, so no external codec
    dependency is needed."""
    import zlib

    h, w, ch = pixels.shape
    color_type = 2 if ch == 3 else 6

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def decode_png(buf: bytes) -> "np.ndarray":
    """Real PNG decoder (stdlib zlib + numpy): 8-bit truecolor/RGBA,
    non-interlaced; all five scanline filters (None/Sub/Up/Average/
    Paeth) unfiltered per the spec. Filter-0 and Up rows vectorize;
    Sub/Average/Paeth run the spec's byte recurrence (Python loop —
    exact, and our own encoder emits filter 0 only). Returns
    (h, w, channels) uint8 top-down."""
    import zlib

    import numpy as np

    if buf[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(buf):
        (ln,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color_type, _comp, _filt, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8 or color_type not in (2, 6) or interlace != 0:
                raise ValueError(
                    f"unsupported PNG variant: depth={depth} color={color_type} interlace={interlace}"
                )
            ch = 3 if color_type == 2 else 4
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG payload has no IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data has unexpected length")
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(raw, np.uint8, stride, y * (stride + 1) + 1)
        prev = out[y - 1] if y else np.zeros(stride, np.uint8)
        if ft == 0:
            out[y] = row
        elif ft == 2:  # Up
            out[y] = (row.astype(np.uint16) + prev).astype(np.uint8)
        elif ft in (1, 3, 4):  # Sub / Average / Paeth: byte recurrence
            cur = out[y]
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                up = int(prev[x])
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) >> 1
                else:
                    ul = int(prev[x - ch]) if x >= ch else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                cur[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
    return out.reshape(h, w, ch)


def sniff_format(buf: bytes) -> str:
    """Magic-byte format sniff: 'bmp' / 'wav' / 'avi' / 'png' / 'gif'
    / 'jpeg' (all decodable here — PNG via stdlib zlib, GIF via the LZW
    above, JPEG via operators/jpeg.py) or the codec-gated families
    ('mp3', 'mp4'); anything else is 'unknown'."""
    if buf[:2] == b"BM":
        return "bmp"
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return "wav"
    if buf[:4] == b"RIFF" and buf[8:12] == b"AVI ":
        return "avi"
    if buf[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
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
    """Real decode: BMP/PNG/GIF/JPEG payloads parse to exact pixel
    statistics (JPEG via the from-spec baseline codec in
    ``operators/jpeg.py``), WAV to exact sample statistics, AVI to exact
    frame statistics (pure numpy + stdlib zlib — integer outputs, fully
    deterministic).  Only MP3/MP4 sample decode and unknown payloads
    raise ``NotImplementedError`` under ``require_codecs=True`` (the
    honest codec gate — those need ffmpeg-class decoders, absent here);
    with ``require_codecs=False`` they yield a row with format sniffed
    and null stats, so mixed-corpus pipelines still run end to end."""

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
                elif fmt in ("png", "gif", "jpeg"):
                    from .jpeg import decode_jpeg

                    px = {"png": decode_png, "gif": decode_gif, "jpeg": decode_jpeg}[fmt](buf)
                    row.update(
                        width=px.shape[1],
                        height=px.shape[0],
                        n_channels=px.shape[2],
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
                elif fmt == "avi":
                    fps, frames = decode_avi(buf)
                    fr = frames.astype("int64")
                    row.update(
                        width=frames.shape[2],
                        height=frames.shape[1],
                        n_channels=3,
                        n_samples=len(frames),  # frame count
                        n_pixels=frames.shape[0] * frames.shape[1] * frames.shape[2],
                        sum_abs=int(fr.sum()),
                        peak=int(fr.max()) if len(frames) else 0,
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


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("t_s", T.DoubleType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("n_pixels", T.LongType(), False),
        T.StructField("sum_abs", T.LongType(), False),
        T.StructField("peak", T.IntegerType(), False),
    ]
)


def frame_sample(media: DataFrame, every_s: float = 1.0, require_codecs: bool = True) -> DataFrame:
    """Video frame sampling — REAL for uncompressed AVI payloads: walk
    the RIFF container, take the frame nearest each ``every_s`` tick,
    and emit exact integer pixel statistics per sampled frame, all
    inside one ``mapInPandas`` pass. Compressed video (MP4-class) needs
    ffmpeg: those payloads raise under ``require_codecs=True`` (UDF-side,
    surfacing at execution like ``decode_media``) and are skipped under
    ``False``."""

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload)
                fmt = sniff_format(buf)
                if fmt == "avi":
                    fps, frames = decode_avi(buf)
                    n = len(frames)
                    duration = n / fps if fps else 0.0
                    k = 0
                    while n and (k == 0 or k * every_s < duration):
                        t = k * every_s
                        fi = min(int(t * fps), n - 1)
                        fr = frames[fi].astype("int64")
                        rows.append(
                            {
                                "media_id": mid,
                                "t_s": t,
                                "frame_idx": fi,
                                "n_pixels": fr.shape[0] * fr.shape[1],
                                "sum_abs": int(fr.sum()),
                                "peak": int(fr.max()),
                            }
                        )
                        k += 1
                elif require_codecs:
                    raise NotImplementedError(
                        f"sampling {fmt!r} video requires ffmpeg bindings not present "
                        "in this environment; uncompressed AVI samples natively"
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(sample, FRAME_SCHEMA)
    )


def resize_images(
    media: DataFrame, width: int = 64, height: int = 64, require_codecs: bool = True
) -> DataFrame:
    """Image resize — REAL for BMP/PNG/GIF/JPEG payloads: decode →
    nearest-neighbor resample to (width, height) in numpy → re-encode
    in the same format (JPEG through the from-spec codec in
    ``operators/jpeg.py``), all inside one ``mapInPandas`` pass (binary
    in, binary out — the image-pipeline shape).  Non-image / unknown
    formats hit the gate: ``NotImplementedError`` under
    ``require_codecs=True``, dropped under ``False``."""
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
                if fmt not in ("bmp", "png", "gif", "jpeg"):
                    if require_codecs:
                        raise NotImplementedError(
                            f"resizing {fmt!r} payloads requires Pillow, not present "
                            "in this environment; BMP/PNG/GIF/JPEG resize natively"
                        )
                    continue
                from .jpeg import decode_jpeg as _djpeg

                px = {"bmp": decode_bmp, "png": decode_png, "gif": decode_gif,
                      "jpeg": _djpeg}[fmt](buf)
                ys = (np.arange(height) * px.shape[0] // height).clip(0, px.shape[0] - 1)
                xs = (np.arange(width) * px.shape[1] // width).clip(0, px.shape[1] - 1)
                out = px[ys][:, xs]
                if fmt == "bmp":
                    payload_out = encode_bmp(width, height, out)
                elif fmt == "png":
                    payload_out = encode_png(out)
                elif fmt == "gif":
                    payload_out = encode_gif(out)
                else:
                    from .jpeg import encode_jpeg as _ejpeg

                    payload_out = _ejpeg(out)
                rows.append(
                    {
                        "media_id": mid,
                        "payload": payload_out,
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
            F.sum(F.length("payload")).cast("long").alias("total_bytes"),
            F.max(F.length("payload")).cast("long").alias("max_bytes"),
            F.min("meta.width").alias("min_width"),
            F.max("meta.duration_s").alias("max_duration_s"),
        )
    )


def encode_gif(pixels: "np.ndarray") -> bytes:
    """Real GIF87a encoder with genuine LZW compression (pure Python —
    GIF's codec is LZW, simple enough to implement exactly): builds a
    palette from the image's unique colors (≤256 required), packs
    variable-width LZW codes LSB-first into ≤255-byte sub-blocks.
    ``pixels`` is (h, w, 3) uint8 RGB top-down."""
    import numpy as np

    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    n_colors = len(palette)
    if n_colors > 256:
        raise ValueError(f"GIF needs <=256 unique colors, got {n_colors}")
    # palette size must be a power of two >= 2
    pal_bits = max(1, (n_colors - 1).bit_length())
    pal_size = 1 << pal_bits
    pal = np.zeros((pal_size, 3), np.uint8)
    pal[:n_colors] = palette
    min_code = max(2, pal_bits)
    clear, end = 1 << min_code, (1 << min_code) + 1

    out = bytearray()
    out += b"GIF87a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((pal_bits - 1) << 4) | (pal_bits - 1), 0, 0)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor, no local table
    out += bytes([min_code])

    bits = bytearray()
    acc = 0
    nbits = 0
    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << min_code)}
    next_code = end + 1
    # The code width is the DECODER's: its table runs one assignment
    # behind the encoder's, so the encoder tracks the table size the
    # decoder will have at each stream position (dec_len) and derives
    # the width from that — byte-exact mirror of decode_gif's rule.
    width = min_code + 1
    dec_len = end + 1
    first_data = True

    def emit(code: int, is_data: bool) -> None:
        nonlocal acc, nbits, width, dec_len, first_data
        while dec_len >= (1 << width) and width < 12:
            width += 1
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if is_data:
            if first_data:
                first_data = False
            else:
                dec_len += 1  # the decoder appends after this code

    indices = inverse.tolist()
    emit(clear, False)
    wseq = bytes([indices[0]])
    for k in indices[1:]:
        wk = wseq + bytes([k])
        if wk in table:
            wseq = wk
            continue
        emit(table[wseq], True)
        table[wk] = next_code
        next_code += 1
        if next_code >= 4095:  # early clear: sidestep deferred-clear ambiguity
            emit(clear, False)
            table = {bytes([i]): i for i in range(1 << min_code)}
            next_code = end + 1
            width = min_code + 1
            dec_len = end + 1
            first_data = True
        wseq = bytes([k])
    emit(table[wseq], True)
    emit(end, False)
    if nbits:
        bits.append(acc & 0xFF)
    for i in range(0, len(bits), 255):
        block = bits[i : i + 255]
        out += bytes([len(block)]) + bytes(block)
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(buf: bytes) -> "np.ndarray":
    """Real GIF decoder (GIF87a/89a, global palette, single image, no
    interlace): full variable-width LZW decode incl. clear codes and
    the KwKwK case. Skips 89a extension blocks. Returns (h, w, 3)
    uint8 RGB top-down."""
    import numpy as np

    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    if not flags & 0x80:
        raise ValueError("GIF without a global color table is unsupported")
    pal_size = 2 << (flags & 0x07)
    pal = np.frombuffer(buf, np.uint8, pal_size * 3, pos).reshape(pal_size, 3)
    pos += pal_size * 3
    while pos < len(buf) and buf[pos] == 0x21:  # 89a extensions: skip
        pos += 2
        while buf[pos]:
            pos += buf[pos] + 1
        pos += 1
    if buf[pos] != 0x2C:
        raise ValueError("expected GIF image descriptor")
    _x, _y, w, h, iflags = struct.unpack_from("<HHHHB", buf, pos + 1)
    pos += 10
    if iflags & 0xC0:
        raise ValueError("local color tables / interlace unsupported")
    min_code = buf[pos]
    pos += 1
    data = bytearray()
    while buf[pos]:
        ln = buf[pos]
        data += buf[pos + 1 : pos + 1 + ln]
        pos += ln + 1

    clear, end = 1 << min_code, (1 << min_code) + 1
    acc = 0
    nbits = 0
    dpos = 0
    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
    prev: int | None = None
    out = bytearray()
    while True:
        # width rule, symmetric with the encoder: len(table) is the
        # next code to assign, and an incoming code may equal it (KwKwK)
        while len(table) >= (1 << width) and width < 12:
            width += 1
        while nbits < width:
            if dpos >= len(data):
                raise ValueError("GIF LZW stream ended without end code")
            acc |= data[dpos] << nbits
            dpos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            out += table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = table[prev] + table[prev][:1]  # KwKwK
            else:
                raise ValueError("corrupt GIF LZW code")
            out += entry
            table.append(table[prev] + entry[:1])
        prev = code
    idx = np.frombuffer(bytes(out), np.uint8, h * w)
    return pal[idx].reshape(h, w, 3)


def encode_mp4_skeleton(duration_s: float, timescale: int = 1000, n_tracks: int = 1) -> bytes:
    """Minimal valid ISO-BMFF (MP4) container: ftyp + moov(mvhd +
    per-track trak(tkhd)) + empty mdat. Carries real container
    metadata (timescale, duration, track count) with no codec payload —
    the fixture for the probe path (public spec: ISO/IEC 14496-12)."""

    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + tag + payload

    dur = int(round(duration_s * timescale))
    mvhd = box(
        b"mvhd",
        struct.pack(">BxxxIIII", 0, 0, 0, timescale, dur) + b"\x00" * 80,
    )
    traks = b""
    for i in range(n_tracks):
        tkhd = box(b"tkhd", struct.pack(">BxxxIIII", 0, 0, 0, i + 1, 0) + b"\x00" * 60)
        traks += box(b"trak", tkhd)
    return (
        box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
        + box(b"moov", mvhd + traks)
        + box(b"mdat", b"")
    )


def encode_mp3_frames(
    n_frames: int, bitrate_kbps: int = 128, sample_rate: int = 44100
) -> bytes:
    """MPEG-1 Layer III frame sequence with valid headers and silent
    payloads (public spec: ISO/IEC 11172-3). Frame size =
    144·bitrate/sample_rate; header = sync + version/layer bits +
    bitrate/samplerate indices. Real enough for any frame-header
    parser; there is no audio to decode by construction."""
    bitrate_idx = {32: 1, 40: 2, 48: 3, 56: 4, 64: 5, 80: 6, 96: 7, 112: 8,
                   128: 9, 160: 10, 192: 11, 224: 12, 256: 13, 320: 14}[bitrate_kbps]
    sr_idx = {44100: 0, 48000: 1, 32000: 2}[sample_rate]
    frame_len = (144 * bitrate_kbps * 1000) // sample_rate
    hdr = bytes([
        0xFF,
        0xFB,  # MPEG-1, Layer III, no CRC
        (bitrate_idx << 4) | (sr_idx << 2),
        0x00,
    ])
    frame = hdr + b"\x00" * (frame_len - 4)
    return frame * n_frames


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), False),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("n_tracks", T.IntegerType(), True),
        T.StructField("bitrate_kbps", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
    ]
)

_MP3_BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_RATES = [44100, 48000, 32000]


def probe_mp4(buf: bytes) -> dict:
    """Walk top-level ISO-BMFF boxes; read mvhd timescale/duration and
    count trak boxes. No codec work — pure container parsing."""
    pos = 0
    duration = None
    n_tracks = 0
    while pos + 8 <= len(buf):
        size, tag = struct.unpack_from(">I4s", buf, pos)
        if size < 8:
            break
        if tag == b"moov":
            inner = pos + 8
            end = pos + size
            while inner + 8 <= end:
                isize, itag = struct.unpack_from(">I4s", buf, inner)
                if isize < 8:
                    break
                if itag == b"mvhd":
                    ver = buf[inner + 8]
                    if ver == 0:
                        _c, _m, ts, dur = struct.unpack_from(">IIII", buf, inner + 12)
                    else:  # version 1: 64-bit times
                        _c, _m, ts, dur = struct.unpack_from(">QQIQ", buf, inner + 12)
                    duration = dur / ts if ts else None
                elif itag == b"trak":
                    n_tracks += 1
                inner += isize
        pos += size
    return {"duration_s": duration, "n_tracks": n_tracks}


def probe_mp3(buf: bytes) -> dict:
    """Parse MP3 frame headers: skip an ID3v2 tag, read the first
    frame's bitrate/sample-rate indices, then count frames by walking
    computed frame lengths. Duration = frames · 1152 / sample_rate."""
    pos = 0
    if buf[:3] == b"ID3":
        sz = ((buf[6] & 0x7F) << 21) | ((buf[7] & 0x7F) << 14) | ((buf[8] & 0x7F) << 7) | (buf[9] & 0x7F)
        pos = 10 + sz
    first = None
    n_frames = 0
    while pos + 4 <= len(buf):
        if buf[pos] == 0xFF and (buf[pos + 1] & 0xE0) == 0xE0:
            b2, b3 = buf[pos + 1], buf[pos + 2]
            if (b2 & 0x18) != 0x18 or (b2 & 0x06) != 0x02:
                break  # only MPEG-1 Layer III here
            br = _MP3_BITRATES[b3 >> 4]
            sr = _MP3_RATES[(b3 >> 2) & 0x3] if ((b3 >> 2) & 0x3) < 3 else None
            if not br or not sr:
                break
            if first is None:
                first = (br, sr)
            pad = (b3 >> 1) & 1
            pos += (144 * br * 1000) // sr + pad
            n_frames += 1
        else:
            break
    if first is None:
        return {}
    return {
        "bitrate_kbps": first[0],
        "sample_rate": first[1],
        "n_frames": n_frames,
        "duration_s": n_frames * 1152 / first[1],
    }


def probe_media(media: DataFrame) -> DataFrame:
    """(media_id, format, duration_s, n_tracks, bitrate_kbps,
    sample_rate, n_frames) — the ffprobe-style metadata pass: REAL
    container parsing for MP4 (box walk) and MP3 (frame headers), plus
    the already-decodable formats' basic facts (WAV sample math, AVI
    frame count). Never decodes samples, so it runs on formats whose
    audio/video codecs stay gated — exactly the triage step a 100 TB
    media crawl runs before spending decode cycles."""

    def probe(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload)
                fmt = sniff_format(buf)
                row = {"media_id": mid, "format": fmt}
                if fmt == "mp4":
                    row.update(probe_mp4(buf))
                elif fmt == "mp3":
                    row.update(probe_mp3(buf))
                elif fmt == "wav":
                    sr, ch, samples = decode_wav(buf)
                    row.update(
                        sample_rate=sr,
                        n_frames=len(samples) // max(1, ch),
                        duration_s=len(samples) / max(1, ch) / sr,
                    )
                elif fmt == "avi":
                    fps, frames = decode_avi(buf)
                    row.update(n_frames=len(frames), duration_s=len(frames) / fps)
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in PROBE_SCHEMA.fields])

    return media.select("media_id", "payload").mapInPandas(probe, PROBE_SCHEMA)


def synth_media_mixed(spark: SparkSession, n: int = 256) -> DataFrame:
    """Real decodable payloads (synth_media_real) interleaved with real
    CONTAINER payloads (MP4 skeletons, MP3 frame sequences) whose
    sample codecs stay gated — the honest mixed crawl: probe_media
    reads every row, decode_media decodes what it can and gates the
    rest."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        # ONE pass: the per-mid branch replaces the earlier union of two
        # mapInPandas branches (was 2x the Python workers for the same
        # rows — the parity-harness tail).
        for pdf in batches:
            rows = [
                _container_media_row(mid) if mid % 5 in (3, 4) else _real_media_row(mid)
                for mid in (int(m) for m in pdf["media_id"])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return (
        spark.range(0, n, 1, _SYNTH_PARTITIONS)
        .select(F.col("id").alias("media_id"))
        .mapInPandas(gen, MEDIA_SCHEMA)
    )
