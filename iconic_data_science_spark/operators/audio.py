"""Audio frame analysis over binary WAV columns.

The silence-trim / VAD / loudness-normalization step of an audio
training-data pipeline: decode PCM16 WAV payloads and emit fixed-width
frame statistics (energy, peak, RMS, a silence flag) — the input every
downstream gate (drop silent spans, loudness filter, segment sampler)
consumes.  The reference has no media pipeline at all (its data model
is MAG tables, Sample_MAG_dataset.scala:1-40); this extends the
engine's multimodal family (operators/multimodal.py) from whole-file
statistics down to the frame grain.

Execution shape: the decode is an Arrow-batched ``mapInPandas`` (the
only Python in the plan — codecs are not expressible as built-ins);
everything downstream of the emitted frame rows is plain DataFrame.
No shuffle is introduced: frames inherit the scan partitioning and the
operator is embarrassingly parallel per file.  All statistics are
exact integers (sum of squares, max |x|, floor-sqrt RMS), so the
DuckDB oracle replays them arithmetically for the synthetic corpus —
a sample-width, byte-order, or framing bug breaks the hash.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("energy", T.LongType(), False),
        T.StructField("peak", T.LongType(), False),
        T.StructField("rms", T.LongType(), False),
        T.StructField("silent", T.LongType(), False),
    ]
)


def audio_frame_stats(
    media: DataFrame,
    frame: int = 160,
    silence_rms: int = 1200,
) -> DataFrame:
    """Per-frame PCM statistics for every audio row of a media frame
    (other kinds pass through the filter, not the decoder).

    One output row per ``frame``-sample window (default 160 = 20 ms at
    8 kHz; the trailing partial window keeps its true ``n``):
    ``energy`` = Σx², ``peak`` = max|x|, ``rms`` = floor(√(energy div
    n)) and ``silent`` = 1 iff energy < silence_rms²·n — the exact
    integer form of "mean square below the RMS threshold", chosen so
    no float ever enters the result.
    """
    thr2 = int(silence_rms) * int(silence_rms)
    fr = int(frame)

    def stats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from .multimodal import decode_wav

        for b in batches:
            out: list[tuple] = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                _, _, samples = decode_wav(bytes(payload))
                x = samples.astype(np.int64)
                for f0 in range(0, len(x), fr):
                    w = x[f0 : f0 + fr]
                    energy = int(np.sum(w * w))
                    n = len(w)
                    out.append(
                        (
                            int(mid),
                            f0 // fr,
                            n,
                            energy,
                            int(np.max(np.abs(w))),
                            _isqrt(energy // n),
                            1 if energy < thr2 * n else 0,
                        )
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    audio = media.filter(F.col("kind") == "audio").select("media_id", "payload")
    return audio.mapInPandas(stats, FRAME_SCHEMA)


def _isqrt(v: int) -> int:
    """floor(sqrt) on the integer lattice — matches FLOOR(SQRT(x)) in
    any IEEE-754 engine for the magnitudes here (≪ 2**52)."""
    import math

    return math.isqrt(v)


def resample_audio(media: DataFrame, factor: int = 2) -> DataFrame:
    """Same frame shape in, same frame shape out, payloads replaced by
    integer-decimated WAVs (keep every ``factor``-th sample, sample
    rate divided by ``factor``) — the sample-rate-normalization step of
    an audio pipeline, as one Arrow-batched ``mapInPandas`` pass over
    audio rows (the audio twin of multimodal.resize_images; non-audio
    rows pass through untouched). Integer decimation (no filter) keeps
    every output byte a pure function of the input — the
    arithmetic-replay oracle contract."""
    from pyspark.sql import types as T

    fr = int(factor)

    def resample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from .multimodal import decode_wav, encode_wav

        for b in batches:
            out = []
            for _, row in b.iterrows():
                payload = bytes(row["payload"])
                if row["kind"] == "audio":
                    rate, _, samples = decode_wav(payload)
                    payload = encode_wav(rate // fr, samples[::fr])
                out.append((int(row["media_id"]), row["kind"], payload))
            yield pd.DataFrame(out, columns=["media_id", "kind", "payload"])

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )
    return media.select("media_id", "kind", "payload").mapInPandas(resample, schema)
