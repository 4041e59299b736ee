"""Command-line entry point: `python -m oaim_sandbox_spark <cmd>`.

A user of the reference drives it through its launcher/server; this is the
equivalent front door for the Spark engine:

  list                      registry inventory (name + oracle/rows-only)
  oracle NAME               print the DuckDB oracle SQL for a query
  sql NAME                  print the Spark-dialect SQL (template queries)
  run NAME [options]        run a registry query and show the result
  macros                    list the SQL macros register_sql_macros installs
  serve [options]           start the HTTP API (chat/models/prompts/testbed/
                            databases/OCI endpoint groups)

`run` options: --sf-dir DIR (default /root/testdata/sf0.001), --limit N
(default 20), --explain (formatted plan instead of rows), --master M.
`serve` options: --port P (default 8000), --api-key K (generated if absent).
"""

from __future__ import annotations

import argparse
import sys


def _entry():
    import __spark_entry__ as E

    return E


def cmd_list(_args) -> int:
    e = _entry()
    q, o = e.queries(), e.oracle_sql()
    width = max(len(n) for n in q)
    for name in q:
        kind = "oracle" if name in o else "rows-only"
        print(f"{name:<{width}}  {kind}")
    print(f"\n{len(q)} queries, {len(o)} oracle-backed")
    return 0


def cmd_oracle(args) -> int:
    e = _entry()
    o = e.oracle_sql()
    if args.name not in o:
        print(f"no oracle for {args.name!r}", file=sys.stderr)
        return 1
    print(o[args.name].strip())
    return 0


def cmd_sql(args) -> int:
    from oaim_sandbox_spark import queries as Q

    if args.name not in Q.TEMPLATES:
        print(f"{args.name!r} is not a template query (operator-backed runner)", file=sys.stderr)
        return 1
    print(Q.TEMPLATES[args.name]("spark").strip())
    return 0


def cmd_run(args) -> int:
    e = _entry()
    q = e.queries()
    if args.name not in q:
        print(f"unknown query {args.name!r} (see `list`)", file=sys.stderr)
        return 1
    from oaim_sandbox_spark.session import get_spark

    spark = get_spark("oaim-cli", master=args.master)
    try:
        df = q[args.name](spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        else:
            # one execution: take limit+1 to report truncation without a
            # second full run of (possibly heavy) pipelines for a count
            rows = df.take(args.limit + 1)
            truncated = len(rows) > args.limit
            spark.createDataFrame(rows[: args.limit], df.schema).show(args.limit, truncate=80)
            print(f"({args.limit}+ rows, truncated)" if truncated else f"({len(rows)} rows)")
    finally:
        spark.stop()
    return 0


def cmd_macros(_args) -> int:
    from oaim_sandbox_spark.functions.macros import _MACROS

    for name, (params, ret, _) in _MACROS.items():
        print(f"{name}({params}) -> {ret}")
    return 0


def cmd_serve(args) -> int:
    from oaim_sandbox_spark.serving.chat import ChatPipeline, MockLLM, RagSettings
    from oaim_sandbox_spark.serving.config_plane import PromptRegistry, bootstrap_models
    from oaim_sandbox_spark.serving.http_api import (
        ApiServer,
        bootstrap_databases,
        bootstrap_oci_profiles,
    )
    from oaim_sandbox_spark.sources.loaders import LocalObjectStore

    pipeline = ChatPipeline(
        store=None, embed_query=None, llm=MockLLM(), settings=RagSettings(rag_enabled=False)
    )
    srv = ApiServer(
        pipeline,
        models=bootstrap_models(),
        prompts=PromptRegistry("prompt"),
        api_key=args.api_key,
        port=args.port,
        object_store=LocalObjectStore(args.object_store_root) if args.object_store_root else None,
        # reference launch_server bootstrap: DEFAULT database from env,
        # OCI profiles from the CLI config file
        databases=bootstrap_databases(),
        oci_profiles=bootstrap_oci_profiles(),
    ).start()
    print(f"listening on http://127.0.0.1:{srv.port}  (api key: {srv.api_key})")
    try:
        import signal

        signal.pause()
    except (KeyboardInterrupt, AttributeError):
        pass
    finally:
        srv.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="oaim_sandbox_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list")
    p = sub.add_parser("oracle")
    p.add_argument("name")
    p = sub.add_parser("sql")
    p.add_argument("name")
    p = sub.add_parser("run")
    p.add_argument("name")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--limit", type=int, default=20)
    p.add_argument("--explain", action="store_true")
    p.add_argument("--master", default=None)
    sub.add_parser("macros")
    p = sub.add_parser("serve")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--api-key", default=None)
    p.add_argument("--object-store-root", default=None)
    args = ap.parse_args(argv)
    return {
        "list": cmd_list,
        "oracle": cmd_oracle,
        "sql": cmd_sql,
        "run": cmd_run,
        "macros": cmd_macros,
        "serve": cmd_serve,
    }[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
