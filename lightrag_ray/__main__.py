"""CLI entrypoint — the unit a cluster job runs:

    ray job submit --working-dir . -- python -m lightrag_ray \\
        build --pages /data/pages --out /data/kg --partitions 256

In the sandbox this runs against a local session (``RAY_ADDRESS=local``).
Subcommands: build, status, query, answer, export, merge-entities,
edit-entity, edit-relation.
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

    p_track = sub.add_parser(
        "track", help="per-operation doc status (reference track_id surface): "
        "no --id lists tracks; with --id prints the partition/doc summary")
    p_track.add_argument("--out", required=True)
    p_track.add_argument("--id", default=None, help="track id")

    p_query = sub.add_parser("query", help="retrieve context from a built graph")
    p_query.add_argument("--out", required=True)
    p_query.add_argument("--mode", default="hybrid",
                         choices=["local", "global", "hybrid", "naive", "bypass"])
    p_query.add_argument("text")

    p_answer = sub.add_parser(
        "answer", help="context + answer via the pluggable LLM layer "
        "(deterministic offline stand-ins by default)")
    p_answer.add_argument("--out", required=True)
    p_answer.add_argument("--mode", default="hybrid",
                          choices=["local", "global", "hybrid", "naive", "bypass"])
    p_answer.add_argument("text")

    p_export = sub.add_parser("export", help="export entities/relations "
                              "(aexport_data formats)")
    p_export.add_argument("--out", required=True)
    p_export.add_argument("--output", required=True, help="output file path")
    p_export.add_argument("--format", default="csv",
                          choices=["csv", "excel", "md", "txt", "graphml",
                                   "vectors"])

    p_merge = sub.add_parser("merge-entities", help="manual cross-name merge")
    p_merge.add_argument("--out", required=True)
    p_merge.add_argument("--sources", required=True,
                         help="comma-separated source entity names")
    p_merge.add_argument("--target", required=True)

    p_edit_e = sub.add_parser("edit-entity", help="update/rename one entity")
    p_edit_e.add_argument("--out", required=True)
    p_edit_e.add_argument("--name", required=True)
    p_edit_e.add_argument("--set", required=True,
                          help='JSON updates, e.g. \'{"entity_type": "PERSON"}\'')

    p_edit_r = sub.add_parser("edit-relation", help="update one relation")
    p_edit_r.add_argument("--out", required=True)
    p_edit_r.add_argument("--src", required=True)
    p_edit_r.add_argument("--tgt", required=True)
    p_edit_r.add_argument("--set", required=True, help="JSON updates")

    args = parser.parse_args(argv)

    if args.cmd == "status":
        from lightrag_ray.state.checkpoint import build_status

        print(json.dumps(build_status(args.out), indent=2))
        return 0

    if args.cmd == "track":
        from lightrag_ray.state import doc_status as DS

        if args.id is None:
            tracks = [
                {"track_id": t["track_id"], "created_at": t["created_at"],
                 "n_partitions": len(t["partitions"])}
                for t in DS.list_tracks(args.out)
            ]
            print(json.dumps(tracks, indent=2))
        else:
            print(json.dumps(DS.track_status(args.out, args.id), indent=2))
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        if args.cmd == "build":
            from lightrag_ray.config import PipelineConfig
            from lightrag_ray.pipelines.kg_build import build_kg
            from lightrag_ray.state.checkpoint import build_status

            # shuffle knobs derived from the cluster the job landed on
            cfg = PipelineConfig.autoscaled(
                write_chunks_table=args.chunks_table
            )
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
        elif args.cmd == "answer":
            import os

            from lightrag_ray.pipelines.query_llm import LLMQueryEngine
            from lightrag_ray.pipelines.query_path import KGQueryEngine

            chunks_dir = os.path.join(args.out, "chunks")
            engine = KGQueryEngine(
                os.path.join(args.out, "nodes"),
                os.path.join(args.out, "edges"),
                chunks_dir=chunks_dir if os.path.isdir(chunks_dir) else None,
            )
            result = LLMQueryEngine(engine).query(args.text, mode=args.mode)
            print(json.dumps({
                "answer": result.answer,
                "entities": result.context.entities,
                "relations": result.context.relations,
            }, indent=2, ensure_ascii=False))
        elif args.cmd == "export":
            import os

            import ray.data as rd

            from lightrag_ray.pipelines.export import (
                export_data,
                export_vector_upserts,
                write_graphml,
            )

            nodes = rd.read_parquet(os.path.join(args.out, "nodes"))
            edges = rd.read_parquet(os.path.join(args.out, "edges"))
            if args.format == "graphml":
                write_graphml(nodes, edges, args.output)
            elif args.format == "vectors":
                export_vector_upserts(nodes, edges, args.output)
            else:
                export_data(nodes, edges, args.output, args.format)
            print(json.dumps({"written": args.output, "format": args.format}))
        elif args.cmd in ("merge-entities", "edit-entity", "edit-relation"):
            import os

            import ray.data as rd

            from lightrag_ray.pipelines import admin

            import shutil

            nodes_dir = os.path.join(args.out, "nodes")
            edges_dir = os.path.join(args.out, "edges")
            nodes = rd.read_parquet(nodes_dir)
            edges = rd.read_parquet(edges_dir)
            changed: list = []  # only rewrite tables the op touched
            if args.cmd == "merge-entities":
                nodes, edges, row = admin.merge_entities(
                    nodes, edges, args.sources.split(","), args.target
                )
                changed = [(nodes, nodes_dir), (edges, edges_dir)]
            elif args.cmd == "edit-entity":
                nodes, edges, row = admin.edit_entity(
                    nodes, edges, args.name, json.loads(args.set),
                    allow_merge=True,
                )
                changed = [(nodes, nodes_dir), (edges, edges_dir)]
            else:
                edges, row = admin.edit_relation(
                    edges, args.src, args.tgt, json.loads(args.set)
                )
                changed = [(edges, edges_dir)]
            # write-aside, then swap; every .bak survives until ALL swaps
            # land, so a crash anywhere leaves a recoverable copy of each
            # table (a half-applied multi-table op is restored from .bak)
            for ds, d in changed:
                tmp = d + ".new"
                shutil.rmtree(tmp, ignore_errors=True)
                ds.write_parquet(tmp)
            for _, d in changed:
                bak = d + ".bak"
                shutil.rmtree(bak, ignore_errors=True)
                os.rename(d, bak)
                os.rename(d + ".new", d)
            for _, d in changed:
                shutil.rmtree(d + ".bak", ignore_errors=True)
            print(json.dumps({"updated": {k: v for k, v in row.items()
                                          if not isinstance(v, list)}},
                             ensure_ascii=False, default=str))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
