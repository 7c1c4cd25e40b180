"""trck-compatible command-line entry point.

    python -m trck_spark PROG.tr EVENTS.parquet [MORE.parquet ...]
        [--params params.json] [--filter '{"clauses": [...]}']
        [--window-file w.csv] [--exclude-file e.csv]
        [--output-format json|msgpack] [--output FILE]
        [--uuid-col uuid] [--ts-col timestamp] [--seq-col COL]

Mirrors the reference matcher binary's surface (reference:
bin/trck:179-301, match_traildb.c:1163-1204): a program (.tr text or flat
JSON IR), one or more event sources (each parquet path is one "DB" — a
trail spanning several paths is reassembled in path order), parameter and
side-input files, and the JSON/msgpack output formats.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="trck_spark", description="Run a trck program on Spark"
    )
    p.add_argument("program", help=".tr file or .json flat-IR file")
    p.add_argument("events", nargs="+", help="parquet path(s), one per DB")
    p.add_argument("--params")
    p.add_argument("--filter")
    p.add_argument("--window-file")
    p.add_argument("--exclude-file")
    p.add_argument("--output-format", default="json",
                   choices=["json", "msgpack"])
    p.add_argument("--output", default="-")
    p.add_argument("--uuid-col", default="uuid")
    p.add_argument("--ts-col", default="timestamp")
    p.add_argument("--seq-col", default=None)
    p.add_argument(
        "--dedup-all",
        action="store_true",
        help="compare EVERY stored field in the consecutive-duplicate "
        "identity (exact reference parity, src/ctx.c:106-134); the "
        "default compares timestamp + program-referenced fields only",
    )
    p.add_argument(
        "--fns",
        help="Python file whose public callables become the FFI function "
        "registry (the analog of linking a user .tr.c module; reference "
        "fns_imported.h). Reserved names `initialize`/`finalize` run "
        "before/after the query like the reference's weak-symbol hooks "
        "(match_traildb.c:1221-1256).",
    )
    return p


def load_fn_registry(path: str) -> dict:
    """Execute a user Python file and collect its public callables."""
    import runpy

    ns = runpy.run_path(path)
    return {
        name: fn
        for name, fn in ns.items()
        if callable(fn) and not name.startswith("_")
    }


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from trck_spark.engine import TrckSparkEngine
    from trck_spark.session import get_spark
    from trck_spark.sideinputs import parse_exclude, parse_window_csv
    from trck_spark.sinks import write_results

    prog_text = open(args.program).read()
    program = (
        json.loads(prog_text)
        if args.program.endswith(".json")
        else prog_text
    )
    params = json.load(open(args.params)) if args.params else None
    event_filter = json.loads(args.filter) if args.filter else None
    window_entries = (
        parse_window_csv(open(args.window_file).read())
        if args.window_file
        else None
    )
    exclude = (
        sorted(parse_exclude(open(args.exclude_file).read()))
        if args.exclude_file
        else None
    )
    fn_registry = load_fn_registry(args.fns) if args.fns else None

    spark = get_spark("trck_spark_cli")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from trck_spark.store import is_trail_store, open_trail_store

    if len(args.events) == 1 and is_trail_store(args.events[0]):
        # a TrailStore input keeps its layout manifest: the engine skips
        # the shuffle and (when the store proved ts-uniqueness) the
        # dedup window; single-DB, so no __db_index column
        df = open_trail_store(spark, args.events[0])
        db_col = None
    else:
        dfs = []
        for i, path in enumerate(args.events):
            d = (
                open_trail_store(spark, path)
                if is_trail_store(path)
                else spark.read.parquet(path)
            ).withColumn("__db_index", F.lit(i))
            dfs.append(d)
        df = dfs[0]
        for d in dfs[1:]:
            df = df.unionByName(d, allowMissingColumns=True)
        db_col = "__db_index"

    engine = TrckSparkEngine(spark)
    rs = engine.run(
        df,
        program,
        params=params,
        event_filter=event_filter,
        window_entries=window_entries,
        exclude=exclude,
        uuid_col=args.uuid_col,
        ts_col=args.ts_col,
        seq_col=args.seq_col,
        db_col=db_col,
        fn_registry=fn_registry,
        dedup_cols="all" if args.dedup_all else None,
    )

    blob = write_results(
        rs.program,
        rs.collect_partials(),
        rs.tuples,
        fmt=args.output_format,
    )
    if args.output == "-":
        sys.stdout.buffer.write(blob)
    else:
        with open(args.output, "wb") as f:
            f.write(blob)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
