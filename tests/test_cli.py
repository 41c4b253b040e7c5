"""CLI entry-point tests (python -m iconic_data_science_spark) — the
engine's App.scala-equivalent surface."""

from __future__ import annotations

from iconic_data_science_spark.__main__ import main


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "g3_personal_net  [oracled]" in out
    assert "a2_approx_distinct  [rows-only]" in out


def test_cli_run_writes_parquet(spark, sf_dir, tmp_path):
    out = str(tmp_path / "a1")
    assert main(["run", "a1_papers_per_author", "--sf-dir", sf_dir, "--out", out]) == 0
    assert spark.read.parquet(out).count() > 0


def test_cli_unknown_query(capsys):
    assert main(["run", "not_a_query"]) == 2


def test_cli_plan_digest(capsys, sf_dir):
    """`plan` prints the scale digest (exchanges, joins, pushdown)
    without executing the query."""
    assert main(["plan", "q1_pricing_summary", "--sf-dir", sf_dir]) == 0
    out = capsys.readouterr().out
    assert "exchanges: 1" in out
    assert "pushed: " in out and "l_shipdate" in out
    assert "reads: " in out
    assert main(["plan", "not_a_query"]) == 2


def test_cli_csv_encodes_complex_columns(spark, sf_dir, tmp_path, capsys):
    """`run --format csv` on a query emitting array columns must succeed
    by JSON-encoding the complex columns (not raise AnalysisException)."""
    out = str(tmp_path / "fp")
    assert main(
        ["run", "text_fingerprint", "--sf-dir", sf_dir, "--out", out, "--format", "csv"]
    ) == 0
    assert spark.read.option("header", True).csv(out).count() > 0


def test_cli_sql(capsys, sf_dir):
    assert main(["sql", "SELECT count(*) AS n FROM region", "--sf-dir", sf_dir]) == 0
    assert "5" in capsys.readouterr().out
