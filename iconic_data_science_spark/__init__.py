"""iconic_data_science_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference bibliometrics / social-network-extraction workload
(``mihaighidoveanu/iconic-data-science``), re-expressed Spark-first:
DataFrame/SQL plans optimized by Catalyst, Structured Streaming for the
streaming surface, Pandas UDFs only where built-ins cannot express the
semantics.

Layout:
    session     — SparkSession builder tuned for local[N] dev and cluster scale
    catalog     — table catalog over the driver's parquet star schema + MAG TSVs
    schemas     — explicit StructTypes for the 17 MAG tables
    operators/  — the operator catalog (SURVEY.md §2): graph, profiles,
                  indicators, dedup, similarity, text, multimodal
    functions/  — reusable column expressions (h-index, decimal-sum discipline,
                  deterministic collect_list)
    sources/    — readers/sinks (TSV w/ permissive casts, CSV, Parquet, GEXF)
    streaming/  — event-stream surface (windows, watermark, stateful dedup)
"""

__version__ = "0.1.0"
