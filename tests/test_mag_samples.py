"""Parity against the reference's OWN shipped MAG sample files
(/root/reference/data/samples/, 1000 rows each, read-only test input):
our schemas and readers must parse the real thing — headers where the
reference has them, headerless raw-split where it doesn't, the
country-tuple column, and the inverted-abstract JSON."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iconic_data_science_spark import schemas
from iconic_data_science_spark.operators.text import parse_country_tuple, reconstruct_abstract
from iconic_data_science_spark.sources import tsv

SAMPLES = "/root/reference/data/samples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLES), reason="reference samples not available"
)

# plain Affiliations.txt: 10 headerless columns (no lat/long/country)
AFFILIATIONS_PLAIN_DDL = (
    "id BIGINT, rank INT, name STRING, dname STRING, grid STRING, "
    "page STRING, wiki STRING, papers BIGINT, citations BIGINT, createdAt DATE"
)


def test_papers_sample_parses_with_schema(spark):
    df = tsv.read_tsv(spark, f"{SAMPLES}/Papers.txt", schemas.DDL["papers"])
    assert df.count() == 1000
    years = df.select(F.min("year"), F.max("year")).collect()[0]
    assert 1800 <= years[0] and years[1] <= 2030
    assert df.filter(F.col("id").isNull()).count() == 0


def test_paa_and_pr_samples(spark):
    paa = tsv.read_tsv(spark, f"{SAMPLES}/PaperAuthorAffiliations.txt", schemas.DDL["paa"])
    assert paa.count() == 1000
    assert paa.filter(F.col("paper").isNull() | F.col("author").isNull()).count() == 0
    pr = tsv.read_tsv(spark, f"{SAMPLES}/PaperReferences.txt", schemas.DDL["pr"])
    assert pr.count() == 1000


def test_fos_sample_and_levels(spark):
    fos = tsv.read_tsv(spark, f"{SAMPLES}/FieldsOfStudy.txt", schemas.DDL["fos"])
    assert fos.count() == 1000
    lv = fos.select(F.min("level"), F.max("level")).collect()[0]
    assert 0 <= lv[0] and lv[1] <= 5  # hierarchy is shallow (models.scala:16)


def test_headerless_affiliations_raw_split(spark):
    df = tsv.read_raw_split(spark, f"{SAMPLES}/Affiliations.txt", AFFILIATIONS_PLAIN_DDL)
    assert df.count() == 1000
    assert df.filter(F.col("citations") < 0).count() == 0


def test_affiliations_fc_country_tuple(spark):
    ddl = AFFILIATIONS_PLAIN_DDL + ", countryTuple STRING"
    df = tsv.read_raw_split(spark, f"{SAMPLES}/Affiliations_FC.txt", ddl)
    parsed = df.select("id", parse_country_tuple("countryTuple").alias("t"))
    ok = parsed.filter(F.length("t.countryCode") == 3)
    assert ok.count() > 900  # nearly all rows carry a ('XXX', 'City') tuple


def test_abstract_sample_reconstructs(spark):
    raw = tsv.read_raw_split(
        spark, f"{SAMPLES}/PaperAbstractsInvertedIndex.txt", "paper BIGINT, idx STRING"
    )
    out = raw.select("paper", reconstruct_abstract("idx").alias("text")).filter(
        F.length("text") > 0
    )
    assert out.count() > 900
    first = out.orderBy("paper").first()
    assert len(first.text.split(" ")) > 3  # real multi-word abstracts


# every shipped sample file: (file, DDL key, has header row, a key column
# that must be fully non-null). Affiliations/Affiliations_FC and the
# abstract index have dedicated tests above.
ALL_SAMPLES = [
    ("Papers.txt", "papers", True, "id"),
    ("Authors.txt", "authors", True, "id"),
    ("FieldsOfStudy.txt", "fos", True, "id"),
    ("PaperAuthorAffiliations.txt", "paa", True, "paper"),
    ("PaperFieldsOfStudy.txt", "pf", True, "paper"),
    ("PaperReferences.txt", "pr", True, "citing"),
    ("FieldOfStudyChildren.txt", "fc", True, "parent"),
    ("ConferenceInstances.txt", "conference_instances", False, "id"),
    ("ConferenceSeries.txt", "conference_series", False, "id"),
    ("Journals.txt", "journals", False, "id"),
    ("PaperUrls.txt", "paper_urls", False, "paper"),
    ("PaperLanguages.txt", "paper_languages", False, "paper"),
    ("PaperCitationContexts.txt", "paper_citation_contexts", False, "citing"),
    ("PaperRecommandations.txt", "paper_recommendations", False, "paper"),
    ("FieldOfStudyRelationship.txt", "fos_relationship", False, "fos1"),
    ("PaperAbstractsInvertedIndex.txt", "paper_abstracts", False, "paper"),
]


@pytest.mark.parametrize("fname,ddl_key,header,key_col", ALL_SAMPLES)
def test_every_sample_file_parses(spark, fname, ddl_key, header, key_col):
    """All 17 shipped MAG sample files parse through our schemas with
    1000 data rows and no null keys — a reference user can point the
    engine at any MAG file."""
    df = tsv.read_tsv(spark, f"{SAMPLES}/{fname}", schemas.DDL[ddl_key], header=header)
    assert df.count() == 1000
    assert df.filter(F.col(key_col).isNull()).count() == 0
