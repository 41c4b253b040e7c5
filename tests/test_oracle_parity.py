"""Every declared query must hash-match its DuckDB oracle (the driver's
t2 gate, replicated strictly). Runs at sf0.001 by default for speed;
set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full-size check.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from .oracle_utils import run_parity

NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    q = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        df = q(spark, sf_dir)
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    problems = run_parity(spark, sf_dir, q, oracles[name])
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
