"""Alignment / post-training data assembly: fill-in-the-middle (FIM)
transforms and DPO preference-pair assembly.

The reference has no post-training data surface at all (its pipeline
ends at the static coauthor network, StaticNet.scala); this extends the
LLM-training-data family next to :func:`text.span_corruption` (T5
denoising pairs) and :func:`text.chat_render` (SFT transcripts) with
the two remaining canonical pair-synthesis steps:

- **FIM** (Bavarian et al. 2022, "Efficient Training of Language
  Models to Fill in the Middle", arXiv:2207.14255): split each
  document at two pivots into prefix/middle/suffix and re-serialize
  with sentinels so an autoregressive model learns infilling. Both
  orderings ship: PSM (``<fim_prefix> P <fim_suffix> S <fim_middle>
  M``) and the paper's joined SPM variant (``<fim_prefix>
  <fim_suffix> S <fim_middle> P M`` — prefix and middle contiguous,
  §D "SPM in PSM-compatible form").
- **DPO pairs** (Rafailov et al. 2023, "Direct Preference
  Optimization", arXiv:2305.18290 — the DATA step, not the loss):
  collapse a (prompt, response, score) table to one
  (prompt, chosen, rejected) row per prompt, chosen = best-scored
  response, rejected = worst, with the prompt-masked loss-token
  counts the trainer needs.

Design rules, same as the rest of the family:

- **Deterministic, hash-replayable randomness.** Pivots and sampling
  gates derive from md5 folds of the doc id (the span_corruption
  discipline) — no RNG, so the DuckDB oracle replays every choice and
  stream == batch holds trivially.
- **Pure in-row maps where possible.** FIM is zero-exchange and
  streamable; DPO assembly is ONE prompt-grain exchange (a single
  groupBy with min/max over an order-encoding integer — no window, no
  self-join, no join-back: the winning rows ride inside the min/max
  structs).
- **100 TB shape**: FIM inherits scan partitioning; DPO's shuffle is
  at prompt grain (the natural output grain) and the per-prompt state
  is two structs, so skew is bounded by the widest response text, not
  the response count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FIM_PREFIX = "<fim_prefix>"
FIM_SUFFIX = "<fim_suffix>"
FIM_MIDDLE = "<fim_middle>"

# order-encoding base for DPO chosen/rejected selection; must exceed
# any response_id the synthesizer emits
_DPO_ORD_BASE = 16


def _h12(s: Column) -> Column:
    """First 12 hex chars of md5 as a non-negative long — the shared
    deterministic-choice fold (span_corruption's ``h``)."""
    return F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long")


def _tokens(text_col: str) -> Column:
    return F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda t: t != "",
    )


def fim_transform(
    documents: DataFrame,
    rate_pct: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, fim_applied, n_prefix, n_middle, n_suffix,
    rendered_psm, rendered_spm) — fill-in-the-middle transform at the
    token level (the corpus token discipline; the paper operates on
    characters, documented deviation).

    A deterministic ``rate_pct``% of documents (md5 gate on the doc
    id, Bavarian §3: mix FIM with plain autoregressive data) with at
    least 2 tokens are transformed: two independent pivots a, b ~
    U[0, n] (md5 folds), lo = min, hi = max split the token stream
    into prefix t[:lo], middle t[lo:hi], suffix t[hi:]; empty segments
    are legal (the paper trains on them deliberately). Untransformed
    docs render as their plain token stream with zero segment counts.

    Both serializations are emitted so one pass feeds either training
    mix — PSM and joined SPM differ only in sentinel/segment order, so
    computing both costs one extra array concat over the SAME named
    token column.

    Scale shape: pure in-row array expressions, zero exchanges,
    streamable (stream == batch pinned in tests)."""
    d = F.col("doc_id")
    base = documents.select(
        F.col(id_col).alias("doc_id"), _tokens(text_col).alias("_t")
    )
    t = F.col("_t")
    n = F.size(t)
    gate = (_h12(F.concat(d.cast("string"), F.lit(":fim"))) % 100) < int(rate_pct)
    applied = gate & (n >= 2)
    a = _h12(F.concat(d.cast("string"), F.lit(":fim:a"))) % (n + 1)
    b = _h12(F.concat(d.cast("string"), F.lit(":fim:b"))) % (n + 1)
    lo = F.least(a, b)
    hi = F.greatest(a, b)
    pre = F.slice(t, 1, lo.cast("int"))
    mid = F.slice(t, (lo + 1).cast("int"), (hi - lo).cast("int"))
    suf = F.slice(t, (hi + 1).cast("int"), (n - hi).cast("int"))
    psm = F.concat(
        F.array(F.lit(FIM_PREFIX)),
        pre,
        F.array(F.lit(FIM_SUFFIX)),
        suf,
        F.array(F.lit(FIM_MIDDLE)),
        mid,
    )
    spm = F.concat(
        F.array(F.lit(FIM_PREFIX), F.lit(FIM_SUFFIX)),
        suf,
        F.array(F.lit(FIM_MIDDLE)),
        pre,
        mid,
    )
    plain = F.array_join(t, " ")
    return base.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        applied.cast("long").alias("fim_applied"),
        F.when(applied, lo).otherwise(F.lit(0)).cast("long").alias("n_prefix"),
        F.when(applied, hi - lo).otherwise(F.lit(0)).cast("long").alias("n_middle"),
        F.when(applied, n - hi).otherwise(F.lit(0)).cast("long").alias("n_suffix"),
        F.when(applied, F.array_join(psm, " ")).otherwise(plain).alias(
            "rendered_psm"
        ),
        F.when(applied, F.array_join(spm, " ")).otherwise(plain).alias(
            "rendered_spm"
        ),
    )


def synth_preference_responses(
    documents: DataFrame,
    prompt_tokens: int = 8,
    response_tokens: int = 8,
    n_responses: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(prompt_id, prompt, response_id, response, score) — a
    deterministic preference table off the document tokens (the synth
    discipline: id arithmetic covers every branch, SQL-replayable).

    prompt = the first ``prompt_tokens`` tokens; response k = the k-th
    ``response_tokens``-token window after the prompt (empty windows
    are legal — short docs still yield all k rows, exercising the
    degenerate branches). score = the count of DISTINCT tokens in the
    response — a deterministic reward proxy that produces real ties
    (the tie-break rules below are part of the contract).

    In-row explode of a BOUNDED sequence (``n_responses`` rows per
    doc) — no shuffle; the response windows slice the same named token
    column."""
    if n_responses < 2 or n_responses > _DPO_ORD_BASE:
        raise ValueError(
            f"n_responses must be in [2, {_DPO_ORD_BASE}] (order encoding)"
        )
    base = documents.select(
        F.col(id_col).alias("prompt_id"), _tokens(text_col).alias("_t")
    )
    t = F.col("_t")
    p = int(prompt_tokens)
    r = int(response_tokens)
    k = F.col("response_id")
    resp = F.slice(t, (p + k * r + 1).cast("int"), r)
    return base.select(
        "prompt_id",
        F.array_join(F.slice(t, 1, p), " ").alias("prompt"),
        F.explode(
            F.sequence(F.lit(0), F.lit(int(n_responses) - 1))
        ).alias("response_id"),
        "_t",
    ).select(
        "prompt_id",
        "prompt",
        k.cast("long").alias("response_id"),
        F.array_join(resp, " ").alias("response"),
        F.size(F.array_distinct(resp)).cast("long").alias("score"),
    )


def dpo_pairs(responses: DataFrame) -> DataFrame:
    """(prompt_id, prompt, chosen_id, rejected_id, chosen_score,
    rejected_score, margin, chosen, rejected, n_prompt_tokens,
    n_chosen_tokens, n_rejected_tokens) — DPO preference-pair assembly
    (Rafailov et al. 2023): per prompt, chosen = the best-scored
    response and rejected = the worst, with deterministic tie-breaks
    (score ties: chosen takes the LOWEST response_id, rejected the
    HIGHEST — so a full tie still yields a well-defined, distinct
    pair). Prompts with a single response are dropped (no pair). The
    token counts are the trainer's loss-mask arithmetic: prompt tokens
    are masked in both sequences, so n_chosen/n_rejected_tokens ARE
    the per-sequence loss-token counts.

    ONE prompt-grain exchange: selection rides an order-encoding
    integer e = score * B + (B-1 - response_id) (B = 16 > any
    response_id), so ``max(struct(e, ...))`` picks chosen and
    ``min(struct(e, ...))`` picks rejected in the SAME aggregate — no
    window function, no self-join, no join-back. At 100 TB the state
    per prompt is two structs regardless of response count."""
    e = (F.col("score") * _DPO_ORD_BASE + (
        F.lit(_DPO_ORD_BASE - 1) - F.col("response_id")
    )).alias("e")
    carried = F.struct(
        e, F.col("response_id").alias("rid"), F.col("response").alias("text")
    )
    agg = (
        responses.groupBy("prompt_id")
        .agg(
            F.first("prompt").alias("prompt"),
            F.max(carried).alias("_c"),
            F.min(carried).alias("_r"),
            F.count("*").alias("_n"),
        )
        .filter(F.col("_n") >= 2)
    )
    ntok = lambda c: F.size(  # noqa: E731
        F.filter(F.split(c, " "), lambda x: x != "")
    ).cast("long")
    return agg.select(
        "prompt_id",
        "prompt",
        F.col("_c.rid").alias("chosen_id"),
        F.col("_r.rid").alias("rejected_id"),
        (F.col("_c.e") / _DPO_ORD_BASE).cast("long").alias("chosen_score"),
        (F.col("_r.e") / _DPO_ORD_BASE).cast("long").alias("rejected_score"),
        ((F.col("_c.e") / _DPO_ORD_BASE).cast("long")
         - (F.col("_r.e") / _DPO_ORD_BASE).cast("long")).alias("margin"),
        F.col("_c.text").alias("chosen"),
        F.col("_r.text").alias("rejected"),
        ntok(F.col("prompt")).alias("n_prompt_tokens"),
        ntok(F.col("_c.text")).alias("n_chosen_tokens"),
        ntok(F.col("_r.text")).alias("n_rejected_tokens"),
    )
