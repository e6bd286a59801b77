"""CLI entrypoint — the unit a cluster job runs:

    ray job submit --working-dir . -- python -m lightrag_ray \\
        build --pages /data/pages --out /data/kg --partitions 256

In the sandbox this runs against a local session (``RAY_ADDRESS=local``).
Subcommands: build, status, query.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="lightrag_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_build = sub.add_parser("build", help="run or resume the KG construction")
    p_build.add_argument("--pages", required=True, help="pages parquet dir")
    p_build.add_argument("--out", required=True, help="build output dir")
    p_build.add_argument("--partitions", type=int, default=16)
    p_build.add_argument("--no-resume", action="store_true")
    p_build.add_argument("--chunks-table", action="store_true",
                         help="materialize the chunks table as its own phase")

    p_status = sub.add_parser("status", help="summarize a build manifest")
    p_status.add_argument("--out", required=True)

    p_query = sub.add_parser("query", help="retrieve context from a built graph")
    p_query.add_argument("--out", required=True)
    p_query.add_argument("--mode", default="hybrid",
                         choices=["local", "global", "hybrid", "naive", "bypass"])
    p_query.add_argument("text")

    args = parser.parse_args(argv)

    if args.cmd == "status":
        from lightrag_ray.state.checkpoint import build_status

        print(json.dumps(build_status(args.out), indent=2))
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        if args.cmd == "build":
            from lightrag_ray.config import PipelineConfig
            from lightrag_ray.pipelines.kg_build import build_kg
            from lightrag_ray.state.checkpoint import build_status

            cfg = PipelineConfig(write_chunks_table=args.chunks_table)
            result = build_kg(
                args.pages, args.out, cfg,
                num_partitions=args.partitions, resume=not args.no_resume,
            )
            print(json.dumps({
                "nodes_dir": result.nodes_dir,
                "edges_dir": result.edges_dir,
                "lineage": result.lineage_path,
                "status": build_status(args.out),
            }, indent=2))
        elif args.cmd == "query":
            import os

            from lightrag_ray.pipelines.query_path import KGQueryEngine

            chunks_dir = os.path.join(args.out, "chunks")
            engine = KGQueryEngine(
                os.path.join(args.out, "nodes"),
                os.path.join(args.out, "edges"),
                chunks_dir=chunks_dir if os.path.isdir(chunks_dir) else None,
            )
            ctx = engine.query(args.text, mode=args.mode)
            print(json.dumps({
                "entities": ctx.entities,
                "relations": ctx.relations,
                "chunks": ctx.chunks,
            }, indent=2, ensure_ascii=False))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
