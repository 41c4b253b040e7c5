"""Explicit StructTypes for the MAG tables.

The reference declares schemas three ways — case-class reflection
(/root/reference/src/scala/model/models.scala:6-30), manual split+cast
(StaticNet.scala:51-55,82-85), and a broken DDL sketch
(src/notebooks/python/schemas.py:3-18, which this module fixes). One
canonical set here, DDL strings (compact, Catalyst-parsed) for all 17
sampled tables (SetUpEnv.scala:69-107; data/samples/*).
"""

from __future__ import annotations

from pyspark.sql import types as T

DDL: dict[str, str] = {
    # models.scala:6-10
    "papers": (
        "id BIGINT, rank INT, doi STRING, docType STRING, title STRING, "
        "originalTitle STRING, bookTitle STRING, year INT, date DATE, "
        "publisher STRING, journal BIGINT, conferenceSeries BIGINT, "
        "conferenceInstance BIGINT, volume STRING, issue STRING, "
        "firstPage STRING, lastPage STRING, references BIGINT, "
        "citations BIGINT, estimatedCitations BIGINT, createdAt DATE"
    ),
    # models.scala:12-13
    "authors": (
        "id BIGINT, rank BIGINT, name STRING, dname STRING, "
        "affiliation BIGINT, papers BIGINT, citations BIGINT, createdAt DATE"
    ),
    # models.scala:15-16
    "fos": (
        "id BIGINT, rank INT, name STRING, dname STRING, mainType STRING, "
        "level INT, papers BIGINT, citations BIGINT, createdAt DATE"
    ),
    # models.scala:18-21 + Affiliations_FC country enrichment
    "affiliations": (
        "id BIGINT, rank INT, name STRING, dname STRING, grid STRING, "
        "page STRING, wiki STRING, papers BIGINT, citations BIGINT, "
        "lat FLOAT, long DOUBLE, createdAt DATE, countryCode STRING, country STRING"
    ),
    # models.scala:24
    "paa": (
        "paper BIGINT, author BIGINT, affiliation BIGINT, "
        "authorSequence INT, originalAffiliation STRING"
    ),
    # models.scala:26
    "pf": "paper BIGINT, fos BIGINT, similarity DOUBLE",
    # models.scala:28
    "pr": "citing BIGINT, cited BIGINT",
    # models.scala:30
    "fc": "parent BIGINT, child BIGINT",
    # data/samples auxiliaries (MagDwarf.scala:143-147)
    # 15 columns, no rank/lat/long — matches the shipped 2018 sample
    # (data/samples/ConferenceInstances.txt)
    "conference_instances": (
        "id BIGINT, name STRING, dname STRING, series BIGINT, "
        "location STRING, url STRING, startDate DATE, endDate DATE, "
        "abstractDate DATE, submissionDate DATE, notificationDate DATE, "
        "finalDate DATE, papers BIGINT, citations BIGINT, createdAt DATE"
    ),
    "conference_series": (
        "id BIGINT, rank INT, name STRING, dname STRING, papers BIGINT, "
        "citations BIGINT, createdAt DATE"
    ),
    "journals": (
        "id BIGINT, rank INT, name STRING, dname STRING, issn STRING, "
        "publisher STRING, url STRING, papers BIGINT, citations BIGINT, createdAt DATE"
    ),
    "paper_urls": "paper BIGINT, sourceType INT, url STRING",
    "paper_languages": "paper BIGINT, language STRING",
    "paper_citation_contexts": "citing BIGINT, cited BIGINT, context STRING",
    "paper_recommendations": "paper BIGINT, recommended BIGINT, score DOUBLE",
    # 7 columns with display names inline — matches the shipped sample
    # (data/samples/FieldOfStudyRelationship.txt)
    "fos_relationship": (
        "fos1 BIGINT, name1 STRING, type1 STRING, "
        "fos2 BIGINT, name2 STRING, type2 STRING, score DOUBLE"
    ),
    # inverted abstract JSON (F7): parsed with ABSTRACT_INDEX_SCHEMA below
    "paper_abstracts": "paper BIGINT, indexed_abstract STRING",
}

# from_json target for the inverted abstract index
# (data/samples/PaperAbstractsInvertedIndex.txt:1)
ABSTRACT_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("IndexLength", T.IntegerType(), True),
        T.StructField(
            "InvertedIndex", T.MapType(T.StringType(), T.ArrayType(T.IntegerType())), True
        ),
    ]
)


def struct_type(table: str) -> T.StructType:
    return T.StructType.fromDDL(DDL[table])


TABLES = tuple(DDL)
