"""Split each headline query's bench cost into CONSTRUCTION (python query
building: py4j chatter, driver-side jobs like seeding collects and
localCheckpoints) vs EXECUTION (the noop-sink write of the returned
frame).  Usage:

    python tools/profile_bench.py [out_json] [only_csv]

Same env contract as bench.py ($SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS,
bucketed tables prepared first, warm run then timed run).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench as benchmod
import __spark_entry__ as entrymod
from iconic_data_science_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/profile_bench.json"
    spark = get_spark(app_name="ids-profile-bench")

    if os.environ.get("SPARK_GRAFT_BUCKETED", "1") != "0":
        os.environ["SPARK_GRAFT_BUCKETED"] = "1"
        from iconic_data_science_spark.catalog import Catalog
        from iconic_data_science_spark import magmap

        magmap.prepare_bucketed_tables(Catalog(spark, sf_dir))

    all_queries = entrymod.queries()
    names = [n for n in benchmod.HEADLINE if n in all_queries]
    if len(sys.argv) > 2:
        names = [s for s in sys.argv[2].split(",") if s in all_queries]

    # JVM warm
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).write.mode(
        "overwrite"
    ).format("noop").save()

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # warm (full build+run, untimed)
        all_queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        t0 = time.perf_counter()
        df = all_queries[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        t2 = time.perf_counter()
        out[name] = {
            "construct": round(t1 - t0, 3),
            "execute": round(t2 - t1, 3),
            "total": round(t2 - t0, 3),
        }
        print(
            f"{name:32s} construct={out[name]['construct']:7.3f} "
            f"execute={out[name]['execute']:7.3f}",
            flush=True,
        )
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    tot_c = sum(v["construct"] for v in out.values())
    tot_e = sum(v["execute"] for v in out.values())
    print(f"TOTAL construct={tot_c:.1f}s execute={tot_e:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
