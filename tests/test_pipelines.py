"""End-to-end pipeline tests: MAG-shaped TSVs on disk → TSV reader with
explicit schemas → named pipelines → artifacts. The full path a
reference user would take after switching engines."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from iconic_data_science_spark import fixtures, pipelines, schemas
from iconic_data_science_spark.sources import tsv


def _write_mag_tsvs(spark, tmp_path):
    """Materialize the AddTestData fixture as headered TSV files, the
    reference's physical format."""
    paths = {}
    paa = [(p, a, 0, 0, "") for p, a in fixtures.TEST_PAA1]
    rows_by_table = {
        "paa": ("paper\tauthor\taffiliation\tauthorSequence\toriginalAffiliation",
                [f"{p}\t{a}\t{af}\t{s}\t{o}" for p, a, af, s, o in paa]),
        "pr": ("citing\tcited", [f"{c}\t{d}" for c, d in fixtures.TEST_PR1]),
    }
    for name, (header, lines) in rows_by_table.items():
        p = str(tmp_path / f"{name}.tsv")
        with open(p, "w") as f:
            f.write(header + "\n" + "\n".join(lines) + "\n")
        paths[name] = p
    # papers: only id/year filled, rest empty (permissive parse)
    p = str(tmp_path / "papers.tsv")
    cols = [f.name for f in schemas.struct_type("papers").fields]
    with open(p, "w") as f:
        f.write("\t".join(cols) + "\n")
        for pid, year in fixtures.PAPER_YEARS:
            row = {c: "" for c in cols}
            row["id"], row["year"] = str(pid), str(year)
            f.write("\t".join(row[c] for c in cols) + "\n")
    paths["papers"] = p
    return paths


def test_tsv_to_personal_net_end_to_end(spark, tmp_path):
    paths = _write_mag_tsvs(spark, tmp_path)
    tables = {
        "paa": tsv.read_tsv(spark, paths["paa"], schemas.DDL["paa"]),
        "papers": tsv.read_tsv(spark, paths["papers"], schemas.DDL["papers"]),
        "pr": tsv.read_tsv(spark, paths["pr"], schemas.DDL["pr"]),
    }
    net = {tuple(r) for r in pipelines.personal_net_pipeline(tables).collect()}
    assert (1, 2, 3, 1993) in net  # the hand-derived golden (test_personal_net)
    prof = {
        (r.author, r.year): (r.papers_cum, r.citations_cum, r.h_index)
        for r in pipelines.profile_pipeline(tables).collect()
    }
    assert prof[(5, 2007)] == (3, 8, 2)


def test_static_net_pipeline_with_gexf(spark, tmp_path):
    tables = {"paa": fixtures.paa_df(spark), "papers": fixtures.paper_years_df(spark).select(
        F.col("paper").alias("id"), "year"
    )}
    sources = spark.createDataFrame([(1,)], "author long")
    out = str(tmp_path / "net.gexf")
    verts, edges = pipelines.static_net_pipeline(tables, sources, depth=2, gexf_out=out)
    assert {r.author for r in verts.collect()} == {1, 2, 3, 4, 5}
    files = glob.glob(out + "/part-*")
    assert files and "<gexf" in open(files[0]).read()


def test_dwarf_pipeline_fk_closed(spark):
    tables = {
        "paa": fixtures.paa_df(spark),
        "papers": fixtures.paper_years_df(spark).select(F.col("paper").alias("id"), "year"),
        "pr": fixtures.pr_df(spark),
    }
    dwarf = pipelines.dwarf_pipeline(tables, F.col("year") >= 2004)
    kept_papers = {r.id for r in dwarf["papers"].collect()}
    assert kept_papers == {4, 5, 6, 7, 8, 9}
    # FK closure: every surviving paa/pr row references a kept paper
    assert all(r.paper in kept_papers for r in dwarf["paa"].collect())
    assert all(r.citing in kept_papers for r in dwarf["pr"].collect())


def test_curation_v8_selects_only_cleaned_survivors(spark, sf_dir):
    """Every v8-selected document must be a C4 survivor, and the
    selection must be the top-n of the survivors' scores."""
    import __spark_entry__ as entrymod

    sel = entrymod.q_curation_pipeline_v8(spark, sf_dir).collect()
    c4 = {
        r.doc_id: r.keep
        for r in entrymod.q_text_c4_line_filter(spark, sf_dir).collect()
    }
    assert len(sel) == min(100, sum(c4.values()))
    assert all(c4[r.doc_id] == 1 for r in sel)
    # scores are a descending cut: the worst selected score >= nothing
    # below it could beat (ties handled by the md5 lottery inside)
    scores = [r.dsir_score for r in sel]
    assert scores == sorted(scores, reverse=True)


def test_curation_v9_respects_both_gates(spark, sf_dir):
    """Every v9-selected document is a C4 survivor AND passed the
    pruned-LM perplexity gate learned on the cleaned corpus; the
    selection is min(50, gate survivors) with descending scores."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from iconic_data_science_spark.operators.text import (
        bigram_lm_topk,
        bigram_surprisal_gate,
        c4_line_filter,
    )

    sel = entrymod.q_curation_pipeline_v9(spark, sf_dir).collect()
    cat = entrymod._cat(spark, sf_dir)
    cleaned = (
        c4_line_filter(
            entrymod._c4_pages(cat.documents),
            min_words_per_line=3,
            min_kept_lines=3,
            bad_words=["badword"],
        )
        .filter(F.col("keep") == 1)
        .select("doc_id", F.col("clean_text").alias("text"))
        .localCheckpoint()
    )
    lm = bigram_lm_topk(cleaned, k=256)
    survivors = {
        r.doc_id
        for r in bigram_surprisal_gate(
            cleaned, lm, default_s=10, cutoff_milli=8240
        ).collect()
    }
    assert survivors, "gate killed everything — cutoff drifted"
    assert len(sel) == min(50, len(survivors))
    assert all(r.doc_id in survivors for r in sel)
    scores = [r.dsir_score for r in sel]
    assert scores == sorted(scores, reverse=True)
