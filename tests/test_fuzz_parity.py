"""Fuzzed-corpus oracle parity: hypothesis-generated document tables run
through the SAME Spark-vs-DuckDB hash gate as the fixed testdata.

The fixed sf* corpora can't contain every edge shape (single-token
docs, repeated separators, all-duplicate corpora, adversarial token
collisions); here the corpus itself is the fuzz input. Any mismatch is
a real cross-engine semantics bug, not a flaky fixture.
"""

from __future__ import annotations

import shutil

import pytest
from hypothesis import given, settings, strategies as st

import __spark_entry__ as entrymod
from .oracle_utils import run_parity

SF_SRC = "/root/testdata/sf0.001"

# queries that read ONLY the documents table (so overwriting
# documents.parquet exercises them fully against the fuzzed corpus)
DOC_QUERIES = [
    "dedup_exact",
    "text_token_counts",
    "text_fingerprint",
    "text_quality_score",
    "corpus_shuffle",
    "text_bm25_topk",
    "text_inverted_index",
    "select_token_budget",
    "corpus_datacard",
]

WORDS = ["spark", "merge", "customer", "window", "a", "zz", "table", "q0"]


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    """A writable copy of the sf0.001 table layout whose
    documents.parquet each example overwrites."""
    d = tmp_path_factory.mktemp("fuzz_sf")
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        shutil.copy(f"{SF_SRC}/{t}.parquet", d / f"{t}.parquet")
    return str(d)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(st.sampled_from(WORDS), min_size=1, max_size=25),
            st.sampled_from(["src0", "src1"]),
            st.sampled_from(["en", "de"]),
        ),
        min_size=2,
        max_size=12,
    )
)
def test_doc_queries_hash_match_on_fuzzed_corpus(spark, fuzz_dir, docs):
    import duckdb

    rows = [
        {"doc_id": i, "text": " ".join(toks), "lang": lang, "source": src,
         "n_chars": len(" ".join(toks))}
        for i, (toks, src, lang) in enumerate(docs)
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO d VALUES (?, ?, ?, ?, ?)",
        [(r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"]) for r in rows],
    )
    con.execute(f"COPY d TO '{fuzz_dir}/documents.parquet' (FORMAT PARQUET)")
    con.close()
    spark.catalog.clearCache()
    oracles = entrymod.oracle_sql()
    qs = entrymod.queries()
    for name in DOC_QUERIES:
        problems = run_parity(spark, fuzz_dir, qs[name], oracles[name])
        assert not problems, f"{name} on fuzzed corpus: " + "; ".join(problems)
