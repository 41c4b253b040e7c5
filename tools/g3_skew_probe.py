"""G3 mega-paper skew probe (SURVEY §7 risk register; the reference's
own cost cap is ``papersToLookAt``, StaticNet.scala:314).

Injects a synthetic mega-paper — K authors on ONE paper in the G3 target
year — into the sf0.1 bridge and times the full G3 personal-net pipeline
with and without ``max_authors_per_paper``.  The mega-paper's pairs are
all weight-1, so the ``min_papers_together=2`` threshold kills them
AFTER the O(K²) fan-out and aggregation — the cap is the only control
that stops the K² cost (and, because every mega-pair dies at the weight
threshold anyway, capping changes no output rows in this distribution).

Usage: python tools/g3_skew_probe.py [K] [sf_dir]
Prints one JSON line with timings + row counts.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from iconic_data_science_spark.catalog import Catalog
from iconic_data_science_spark.operators.coauthor import coauthor_edges
from iconic_data_science_spark.operators.personal_net import personal_net
from iconic_data_science_spark.session import get_spark
from iconic_data_science_spark import magmap


def g3(paa, years, cap):
    edges = (
        coauthor_edges(paa, years, min_papers_together=2, max_authors_per_paper=cap)
        .select("ego", "alter_id", "first_year")
        .localCheckpoint()
    )
    egos = edges.select("ego").filter(F.col("ego") % 10 == 0).distinct()
    return personal_net(edges, egos=egos)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="g3-skew-probe")
    cat = Catalog(spark, sf_dir)
    base_paa = magmap.paa_raw(cat)
    # the mega-paper: K authors far outside the real author-id range, on
    # one new paper id, dated inside the G3 target year
    mega_paper = 10_000_000
    mega = spark.range(k).select(
        F.lit(mega_paper).alias("paper"),
        (F.col("id") + 50_000_000).alias("author"),
    )
    paa = base_paa.unionByName(mega).localCheckpoint()
    years = (
        magmap.paper_years_raw(cat)
        .unionByName(
            spark.range(1).select(
                F.lit(mega_paper).alias("paper"), F.lit(1995).cast("long").alias("year")
            )
        )
        .filter(F.col("year") == 1995)
        .localCheckpoint()
    )
    out = {"k": k, "sf_dir": sf_dir}
    for label, cap in (("uncapped", None), ("cap256", 256)):
        samples = []
        rows = None
        for _ in range(3):
            t0 = time.perf_counter()
            rows = g3(paa, years, cap).count()
            samples.append(round(time.perf_counter() - t0, 3))
        out[label] = {"median_sec": statistics.median(samples), "samples": samples, "rows": rows}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
