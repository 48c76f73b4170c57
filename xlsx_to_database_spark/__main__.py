"""CLI: load xlsx workbooks into a database or parquet lake.

    python -m xlsx_to_database_spark book.xlsx --jdbc-url jdbc:... [--table t]
    python -m xlsx_to_database_spark book.xlsx --parquet-out /lake/dir
    python -m xlsx_to_database_spark book.xlsx --show   # print sample + schema

Mirrors the reference tool's CLI surface (SURVEY.md §0 item 6: connection
string, table naming from file/sheet, sheet filter, header toggle, write
mode) on Spark execution.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="xlsx_to_database_spark",
        description="Load xlsx worksheets into database tables (Spark-backed).",
    )
    p.add_argument("workbook", nargs="+", help="xlsx file path(s)")
    p.add_argument("--sheet", default=None, help="sheet name, comma list, or '*' (default: first)")
    p.add_argument("--no-header", action="store_true", help="first row is data, not column names")
    p.add_argument("--no-sanitize", action="store_true", help="keep header text as column names")
    p.add_argument("--schema", default=None, help="DDL schema override (skip inference)")
    p.add_argument("--mode", default="create", choices=["create", "append", "truncate", "overwrite"])
    sink = p.add_argument_group("sink (choose one)")
    sink.add_argument("--jdbc-url", default=None, help="JDBC connection string")
    sink.add_argument("--jdbc-driver", default=None, help="JDBC driver class, if not inferable")
    sink.add_argument("--parquet-out", default=None, help="parquet output directory")
    sink.add_argument("--txn-out", default=None, help="transaction-logged table root (versioned, time-travelable)")
    sink.add_argument("--show", action="store_true", help="print schema + first rows, write nothing")
    p.add_argument("--table", default=None, help="target table (default: from file/sheet name)")
    p.add_argument("--partition-by", default=None, help="comma list of parquet partition columns")
    p.add_argument("--txn-key", default=None, help="stats/clustering column for --txn-out (default: first column)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not (args.jdbc_url or args.parquet_out or args.txn_out or args.show):
        print("error: pick a sink: --jdbc-url, --parquet-out, --txn-out, or --show", file=sys.stderr)
        return 2

    from xlsx_to_database_spark.api import Engine

    eng = Engine(app_name="xlsx_to_database_cli")
    multi = len(args.workbook) > 1
    if multi and args.table:
        # One explicit table + many workbooks would make every file fight
        # over the same target (create fails, overwrite keeps only the
        # last); per-file default names are the reference behavior.
        print("error: --table with multiple workbooks; omit it to name per file", file=sys.stderr)
        return 2
    for path in args.workbook:
        t = eng.load_xlsx(
            path,
            sheet=args.sheet,
            header=not args.no_header,
            sanitize=not args.no_sanitize,
            schema=args.schema,
        )
        if args.show:
            t.df.printSchema()
            t.df.show(20, truncate=False)
            continue
        if args.txn_out:
            import os

            # create the first time, append after — per-file versions
            # when loading many workbooks into one table root.
            out = os.path.join(args.txn_out, t.name) if multi else args.txn_out
            exists = os.path.isdir(os.path.join(out, "_txn_log"))
            mode = "append" if (exists or args.mode == "append") else "create"
            v = t.to_txn_table(out, key=args.txn_key, mode=mode)
            print(f"{t.name}: committed version {v} at {out}")
            continue
        if args.parquet_out:
            import os

            from xlsx_to_database_spark.sources.sinks import MODE_MAP

            part = args.partition_by.split(",") if args.partition_by else None
            # Multiple workbooks each get their own subdirectory; a single
            # shared directory would error (create) or clobber (overwrite).
            out = os.path.join(args.parquet_out, t.name) if multi else args.parquet_out
            t.to_parquet(out, mode=MODE_MAP[args.mode], partition_by=part)
            print(f"{path} -> {out} ({t.name})")
        if args.jdbc_url:
            kw = {"driver": args.jdbc_driver} if args.jdbc_driver else {}
            t.to_jdbc(args.jdbc_url, table=args.table, mode=args.mode, **kw)
            print(f"{path} -> {args.jdbc_url} table={args.table or t.name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
