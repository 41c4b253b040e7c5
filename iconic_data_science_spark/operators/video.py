"""Video frame-delta analysis over binary AVI columns.

Scene-cut detection at the frame-pair grain — the shot-segmentation /
keyframe-selection step of a video training-data pipeline (sample one
frame per shot instead of per second; drop static screen-recording
spans). Completes the engine's multimodal frame-grain trio: images
(mm_resize_stats), audio (mm_audio_frames), video (here).

Execution shape mirrors audio.audio_frame_stats: the decode is an
Arrow-batched ``mapInPandas`` (real AVI parsing via
multimodal.decode_avi), one output row per ADJACENT frame pair, all
statistics exact integers (sum of absolute per-pixel deltas, the
pixel count, a cut flag from an integer threshold rule) — no shuffle,
frames inherit the scan partitioning, and the DuckDB oracle replays
every delta from the generator arithmetic.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CUT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.LongType(), False),  # the LATER frame
        T.StructField("n_values", T.LongType(), False),  # h*w*3
        T.StructField("delta", T.LongType(), False),  # Σ |later - earlier|
        T.StructField("cut", T.LongType(), False),
    ]
)


def video_scene_cuts(
    media: DataFrame,
    thr_num: int = 241,
    thr_den: int = 2,
) -> DataFrame:
    """(media_id, frame_no, n_values, delta, cut) for every adjacent
    frame pair of every video row: ``delta`` = Σ|frame_f − frame_{f−1}|
    over all pixel values, ``cut`` = 1 iff delta·thr_den > thr_num·
    n_values — the exact integer form of "mean per-value delta above
    thr_num/thr_den" (default 120.5, the synthetic generator's expected
    inter-frame delta, so both flag values occur). Non-video rows pass
    the filter, not the decoder."""
    tn, td = int(thr_num), int(thr_den)

    def cuts(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from .multimodal import decode_avi

        for b in batches:
            out: list[tuple] = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                _, frames = decode_avi(bytes(payload))
                f = frames.astype(np.int64)
                for i in range(1, len(f)):
                    d = int(np.abs(f[i] - f[i - 1]).sum())
                    nv = int(f[i].size)
                    out.append((int(mid), i, nv, d, 1 if d * td > tn * nv else 0))
            yield pd.DataFrame(out, columns=[c.name for c in CUT_SCHEMA.fields])

    video = media.filter(F.col("kind") == "video").select("media_id", "payload")
    return video.mapInPandas(cuts, CUT_SCHEMA)
