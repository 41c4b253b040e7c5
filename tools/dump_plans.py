"""Dump .explain("formatted") for bench headline queries (or a CSV subset)
to plans/r10/<query>_<tag>.txt.  Usage:

    python tools/dump_plans.py <tag> [only_csv]

Plan capture is a planning-time operation; queries whose *construction*
runs driver jobs (kmeans seeding, pagerank loop checkpoints) execute
those jobs, so the capture is slower than pure explain but still cheap
next to the bench.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import bench as benchmod
import __spark_entry__ as entrymod
from iconic_data_science_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join("/root/repo", "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"ids-plan-dump-{tag}")

    if os.environ.get("SPARK_GRAFT_BUCKETED", "1") != "0":
        os.environ["SPARK_GRAFT_BUCKETED"] = "1"
        from iconic_data_science_spark.catalog import Catalog
        from iconic_data_science_spark import magmap

        magmap.prepare_bucketed_tables(Catalog(spark, sf_dir))

    all_queries = entrymod.queries()
    names = [n for n in benchmod.HEADLINE if n in all_queries]
    if len(sys.argv) > 2:
        names = [s for s in sys.argv[2].split(",") if s in all_queries]
    for name in names:
        try:
            df = all_queries[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # capture the failure instead of dying
            text = f"PLAN CAPTURE FAILED: {e!r}\n"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(text)
        print(name, "ok", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
