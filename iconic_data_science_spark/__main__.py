"""Command-line entry point — the engine's equivalent of the reference's
compiled-app path (/root/reference/src/scala/App.scala:61-85: build a
local session, wire the catalog, run one query, write the result), but
over the full query catalog and with a SQL front end:

    python -m iconic_data_science_spark list
    python -m iconic_data_science_spark run g3_personal_net \
        [--sf-dir DIR] [--out PATH] [--format parquet|csv|jsonl] \
        [--show N] [--explain]
    python -m iconic_data_science_spark sql "SELECT count(*) FROM lineitem" \
        [--sf-dir DIR] [--show N]
    python -m iconic_data_science_spark plan g3_personal_net \
        [--sf-dir DIR] [--full]

``run`` resolves any name from the driver contract's ``queries()``;
``sql`` registers the ten driver tables as temp views first, so every
pipeline is reachable declaratively too (both front ends share the one
Catalyst IR — SURVEY §3). ``plan`` prints the scale digest a reviewer
checks before shipping a query at 100 TB — pushed filters, pruned read
schemas, exchange count, join strategies, codegen spans — without
executing it (the PLANS.md columns, per query, on demand).
"""

from __future__ import annotations

import argparse
import os
import sys

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _entrymod():
    # __spark_entry__ lives at the repo root (driver contract); make it
    # importable when invoked from elsewhere
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if here not in sys.path:
        sys.path.insert(0, here)
    import __spark_entry__ as entrymod

    return entrymod


def _write(df, out: str, fmt: str) -> None:
    from .sources import sinks

    if fmt == "csv":
        # CSV cannot serialize array/struct/map columns (catalog queries
        # like text_fingerprint or mm_byte_histogram emit them); encode
        # complex columns as JSON strings instead of surfacing Spark's
        # opaque AnalysisException.
        from pyspark.sql import functions as F

        complex_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("array", "struct", "map")
        ]
        if complex_cols:
            print(
                "csv: encoding complex columns as JSON: " + ", ".join(complex_cols),
                file=sys.stderr,
            )
            df = df.select(
                *[
                    F.to_json(c).alias(c) if c in complex_cols else F.col(c)
                    for c in df.columns
                ]
            )
    writer = {"parquet": sinks.write_parquet, "csv": sinks.write_csv, "jsonl": sinks.write_jsonl}[fmt]
    writer(df, out)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="iconic_data_science_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list the query catalog")
    runp = sub.add_parser("run", help="run a cataloged query")
    runp.add_argument("query")
    sqlp = sub.add_parser("sql", help="run SQL over the registered tables")
    sqlp.add_argument("statement")
    for sp in (runp, sqlp):
        sp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
        sp.add_argument("--show", type=int, default=20, metavar="N")
    runp.add_argument("--out", help="write result here instead of showing")
    runp.add_argument("--format", default="parquet", choices=("parquet", "csv", "jsonl"))
    runp.add_argument("--explain", action="store_true", help="print the physical plan")
    planp = sub.add_parser("plan", help="print a query's scale digest without running it")
    planp.add_argument("query")
    planp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    planp.add_argument("--full", action="store_true", help="also print the formatted physical plan")
    args = p.parse_args(argv)

    entrymod = _entrymod()
    if args.cmd == "list":
        oracled = set(entrymod.oracle_sql())
        for name in sorted(entrymod.queries()):
            print(f"{name}  [{'oracled' if name in oracled else 'rows-only'}]")
        return 0

    from .session import get_spark

    spark = get_spark(app_name=f"ids-spark-{args.cmd}")
    if args.cmd == "plan":
        queries = entrymod.queries()
        if args.query not in queries:
            print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
            return 2
        from .plans import inspect

        df = queries[args.query](spark, args.sf_dir)
        plan = inspect.formatted_plan(df)
        print(f"query: {args.query}")
        print(f"exchanges: {inspect.shuffle_count(df)}")
        print(f"codegen_stages: {inspect.codegen_stages(df)}")
        for label in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin", "BroadcastNestedLoopJoin"):
            n = plan.count(f") {label}")
            if n:
                print(f"{label}: {n}")
        for fl in inspect.pushed_filters(df):
            print(f"pushed: {fl}")
        for rs in inspect.read_schemas(df):
            print(f"reads: {rs}")
        if args.full:
            print(plan)
        return 0
    if args.cmd == "run":
        queries = entrymod.queries()
        if args.query not in queries:
            print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
            return 2
        df = queries[args.query](spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        if args.out:
            _write(df, args.out, args.format)
            print(f"wrote {args.out}")
        else:
            df.show(args.show, truncate=False)
    else:
        from .catalog import Catalog

        Catalog(spark, args.sf_dir).register_views()
        spark.sql(args.statement).show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
