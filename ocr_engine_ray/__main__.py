"""CLI entry points — the batch analog of the reference's service/CLI.

Usage::

    python -m ocr_engine_ray extract --input /root/testdata/sf0.001/documents.parquet \
        --output /tmp/extract_out --partitions 8        # checkpointed, resumable
    python -m ocr_engine_ray query pricing_summary --sf-dir /root/testdata/sf0.01

Owns its Ray session (guarded init, shutdown on exit) — the library itself
never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_extract(args) -> int:
    ray = _ray_session(args.num_cpus)
    from ocr_engine_ray.state.checkpoint import run_checkpointed

    manifest = run_checkpointed(
        args.input, args.output, num_partitions=args.partitions
    )
    print(json.dumps({"completed_partitions": len(manifest), "manifest": manifest[-1]}))
    ray.shutdown()
    return 0


def cmd_query(args) -> int:
    ray = _ray_session(args.num_cpus)
    import __ray_entry__ as entrymod

    fn = entrymod.queries().get(args.name)
    if fn is None:
        print(f"unknown query {args.name!r}; available: {sorted(entrymod.queries())}")
        ray.shutdown()
        return 2
    res = fn(args.sf_dir)
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        df = res.to_pandas()
    elif isinstance(res, pa.Table):
        df = res.to_pandas()
    else:
        df = res
    print(df.head(args.limit).to_string())
    print(f"... {len(df)} rows total")
    ray.shutdown()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ocr_engine_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("extract", help="checkpointed, resumable extraction run")
    pe.add_argument("--input", required=True, help="documents parquet path")
    pe.add_argument("--output", required=True, help="output dir (part=K + manifest)")
    pe.add_argument("--partitions", type=int, default=8)
    pe.add_argument("--num-cpus", type=int, default=None)
    pe.set_defaults(fn=cmd_extract)

    pq = sub.add_parser("query", help="run one driver-contract query")
    pq.add_argument("name")
    pq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    pq.add_argument("--limit", type=int, default=20)
    pq.add_argument("--num-cpus", type=int, default=None)
    pq.set_defaults(fn=cmd_query)

    ps = sub.add_parser(
        "serve", help="service-mode HTTP surface (POST /parse, GET /health)"
    )
    ps.add_argument("--host", default="127.0.0.1")
    ps.add_argument("--port", type=int, default=8080)
    ps.set_defaults(fn=cmd_serve)

    args = p.parse_args(argv)
    return args.fn(args)


def cmd_serve(args) -> int:
    from .serve import serve

    httpd = serve(host=args.host, port=args.port)
    print(f"ocr-engine-ray service on {args.host}:{httpd.server_address[1]}")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
