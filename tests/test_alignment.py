"""FIM transform + DPO pair assembly — hand fixtures, tie-break
contracts, and the python-mirror check of the md5 pivot arithmetic."""

from __future__ import annotations

import hashlib

from iconic_data_science_spark.operators.alignment import (
    FIM_MIDDLE,
    FIM_PREFIX,
    FIM_SUFFIX,
    dpo_pairs,
    fim_transform,
    synth_preference_responses,
)


def _h12(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def test_fim_matches_python_mirror(spark):
    """The md5 gate and both pivots replay exactly in plain python —
    the same check the DuckDB oracle runs, but readable."""
    rows = [(i, " ".join(f"t{j}" for j in range(10))) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in fim_transform(docs, rate_pct=60).collect()}
    for i in range(40):
        applied = _h12(f"{i}:fim") % 100 < 60
        r = out[i]
        assert r.fim_applied == int(applied)
        assert r.n_tokens == 10
        toks = [f"t{j}" for j in range(10)]
        if not applied:
            assert (r.n_prefix, r.n_middle, r.n_suffix) == (0, 0, 0)
            assert r.rendered_psm == r.rendered_spm == " ".join(toks)
            continue
        a, b = _h12(f"{i}:fim:a") % 11, _h12(f"{i}:fim:b") % 11
        lo, hi = min(a, b), max(a, b)
        assert (r.n_prefix, r.n_middle, r.n_suffix) == (lo, hi - lo, 10 - hi)
        pre, mid, suf = toks[:lo], toks[lo:hi], toks[hi:]
        assert r.rendered_psm == " ".join(
            [FIM_PREFIX] + pre + [FIM_SUFFIX] + suf + [FIM_MIDDLE] + mid
        )
        assert r.rendered_spm == " ".join(
            [FIM_PREFIX, FIM_SUFFIX] + suf + [FIM_MIDDLE] + pre + mid
        )


def test_fim_token_conservation_and_degenerates(spark):
    rows = [(0, ""), (1, "solo"), (2, "a b"), (3, None), (4, "  x   y  z ")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in fim_transform(docs, rate_pct=100).collect()}
    # n < 2 never applies, regardless of the gate
    assert out[0].fim_applied == 0 and out[0].rendered_psm == ""
    assert out[1].fim_applied == 0 and out[1].rendered_psm == "solo"
    assert out[3].fim_applied == 0 and out[3].n_tokens == 0
    # applied docs conserve tokens across the three segments
    for i in (2, 4):
        r = out[i]
        assert r.fim_applied == 1
        assert r.n_prefix + r.n_middle + r.n_suffix == r.n_tokens
        for s in (FIM_PREFIX, FIM_SUFFIX, FIM_MIDDLE):
            assert s in r.rendered_psm and s in r.rendered_spm
    # whitespace runs collapse via the token filter
    assert out[4].n_tokens == 3


def test_fim_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i} x y z q{i}") for i in range(20)], "doc_id long, text string"
    )
    a = sorted(map(tuple, fim_transform(docs).collect()))
    b = sorted(map(tuple, fim_transform(docs).collect()))
    assert a == b


def test_synth_preference_responses_windows(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{j}" for j in range(40))), (2, "a b c")],
        "doc_id long, text string",
    )
    rows = synth_preference_responses(
        docs, prompt_tokens=8, response_tokens=8, n_responses=3
    ).collect()
    by = {(r.prompt_id, r.response_id): r for r in rows}
    assert len(rows) == 6  # 3 per doc, short docs included
    assert by[(1, 0)].prompt == " ".join(f"t{j}" for j in range(8))
    assert by[(1, 0)].response == " ".join(f"t{j}" for j in range(8, 16))
    assert by[(1, 2)].response == " ".join(f"t{j}" for j in range(24, 32))
    assert by[(1, 0)].score == 8  # all-distinct window
    # doc 2 is shorter than the prompt: empty windows, zero scores
    assert by[(2, 0)].prompt == "a b c"
    assert by[(2, 1)].response == "" and by[(2, 1)].score == 0


def test_dpo_pairs_selection_and_tiebreaks(spark):
    rows = [
        # p1: clear winner/loser
        (1, "p", 0, "x x x", 1),
        (1, "p", 1, "a b c", 3),
        (1, "p", 2, "d d e", 2),
        # p2: full tie -> chosen = lowest rid, rejected = highest rid
        (2, "q", 0, "m n", 2),
        (2, "q", 1, "o p", 2),
        (2, "q", 2, "r s", 2),
        # p3: single response -> dropped
        (3, "r", 0, "only", 1),
    ]
    resp = spark.createDataFrame(
        rows, "prompt_id long, prompt string, response_id long, response string, score long"
    )
    out = {r.prompt_id: r for r in dpo_pairs(resp).collect()}
    assert set(out) == {1, 2}
    p1 = out[1]
    assert (p1.chosen_id, p1.rejected_id) == (1, 0)
    assert (p1.chosen_score, p1.rejected_score, p1.margin) == (3, 1, 2)
    assert p1.chosen == "a b c" and p1.rejected == "x x x"
    assert (p1.n_prompt_tokens, p1.n_chosen_tokens, p1.n_rejected_tokens) == (1, 3, 3)
    p2 = out[2]
    assert (p2.chosen_id, p2.rejected_id) == (0, 2)
    assert p2.margin == 0


def test_dpo_pairs_end_to_end_synth(spark, sf_dir):
    """Composed over the synth table: every prompt yields exactly one
    pair, chosen's score >= rejected's, and a tie always resolves to
    chosen_id < rejected_id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dpo_pairs(synth_preference_responses(docs)).collect()
    assert len(out) == docs.count()
    for r in out:
        assert r.chosen_score >= r.rejected_score
        assert r.chosen_id != r.rejected_id
        if r.margin == 0:
            assert r.chosen_id < r.rejected_id
