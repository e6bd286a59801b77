"""End-to-end KG construction: pages parquet → nodes/edges parquet.

Phase plan (each phase streams; Parquet between phases is the checkpoint):

  A. pages → chunks          per input partition; stateless text-extract map +
                             chunker actor pool; resumable per partition
  B. chunks → mentions       per partition; extractor actor pool; resumable
  C1. mentions(kind=e) → nodes_pre     salted two-stage groupby
  C2. mentions(kind=r) → edges         salted two-stage groupby
  C3. nodes_pre ∪ edge endpoints → nodes
  D. lineage.parquet compiled from the manifest

Parallels with the reference lifecycle (lightrag/pipeline.py:1585-5340): the
three asyncio queue layers become operator pipelining; the doc-status state
machine becomes the per-partition manifest; keyed locks disappear into the
groupby shuffle.  The mentions table is first-class (unlike the reference,
where extraction results live in an LLM-response cache), which is what makes
delete/rebuild and resume cheap (SURVEY §3.4).
"""

from __future__ import annotations

import glob
import os
import time
from dataclasses import dataclass

import pyarrow as pa

from lightrag_ray.config import PipelineConfig
from lightrag_ray.constants import SOURCE_IDS_LIMIT_KEEP
from lightrag_ray.stages.chunk import ChunkerStage
from lightrag_ray.stages.endpoints import FINAL_NODES_COLUMNS, apply_endpoints
from lightrag_ray.stages.extract import ExtractStage
from lightrag_ray.stages.extract_text import make_extract_text_fn
from lightrag_ray.stages.merge import canonicalize_edges, canonicalize_entities
from lightrag_ray.state import checkpoint as ckpt

EDGE_OUTPUT_COLUMNS = [
    "src_id",
    "tgt_id",
    "weight",
    "description",
    "keywords",
    "source_ids",
    "file_paths",
    "created_at",
    "truncate",
    "n_mentions",
]


@dataclass
class BuildResult:
    chunks_dir: str
    mentions_dir: str
    nodes_dir: str
    edges_dir: str
    lineage_path: str
    track_id: str | None = None


def _partition_files(files: list[str], num_partitions: int) -> list[list[str]]:
    """Stable hash partitioning: a file's partition never changes when other
    files are added/removed, so incremental corpus growth only recomputes the
    partitions whose file sets actually changed."""
    import zlib

    num_partitions = max(1, min(num_partitions, len(files)))
    parts: list[list[str]] = [[] for _ in range(num_partitions)]
    for f in sorted(files):
        parts[zlib.crc32(os.path.basename(f).encode()) % num_partitions].append(f)
    return parts


def _files_digest(files: list[str]) -> str:
    """Content-address for a partition's input file set: the unit marker name
    embeds it, so a changed file set invalidates the old marker automatically."""
    import hashlib

    return hashlib.md5("\n".join(sorted(files)).encode()).hexdigest()[:10]


MIN_ROWS_PER_FILE = 100_000  # bounded file counts at scale; tiny runs unaffected


def _run_part(paths, unit: str, out_dir: str, build_ds, resume: bool, extra=None,
              partition_cols=None, empty_schema: pa.Schema | None = None):
    """Run one resumable unit: skip if marked done, else (re)compute.

    ``empty_schema``: write_parquet on a zero-row dataset creates no files;
    phases whose output another phase reads back pass their output schema so
    an empty-but-readable parquet file is left behind instead of nothing."""
    if resume and ckpt.is_done(paths, unit):
        return False
    ckpt.reset_unit(paths, unit, out_dir)
    t0 = time.perf_counter()
    build_ds().write_parquet(
        out_dir, min_rows_per_file=MIN_ROWS_PER_FILE, partition_cols=partition_cols
    )
    if empty_schema is not None and not glob.glob(
        os.path.join(out_dir, "**", "*.parquet"), recursive=True
    ):
        import pyarrow.parquet as pq

        os.makedirs(out_dir, exist_ok=True)
        pq.write_table(
            empty_schema.empty_table(), os.path.join(out_dir, "empty-0.parquet")
        )
    lineage = {
        "status": "done",
        "wall_s": round(time.perf_counter() - t0, 3),
        "n_rows_out": ckpt.parquet_row_count(out_dir),
    }
    lo, hi = ckpt.parquet_column_range(out_dir, "url")
    lineage["url_min"], lineage["url_max"] = lo, hi
    if extra:
        lineage.update(extra)
    ckpt.mark_done(paths, unit, lineage)
    return True


def build_kg(
    pages_paths: list[str] | str,
    out_dir: str,
    cfg: PipelineConfig | None = None,
    num_partitions: int = 4,
    resume: bool = True,
    prior_nodes_dir: str | None = None,
    prior_edges_dir: str | None = None,
    track_id: str | None = None,
) -> BuildResult:
    """Run (or resume) the full build.  Ray must already be initialized.

    ``prior_nodes_dir``/``prior_edges_dir`` turn the merge into an
    INCREMENTAL upsert against an existing graph snapshot (the reference's
    `already_*` arm): stored rows enter the reduce as pass-through partials,
    new mentions merge into them with stored-first provenance, stored-only
    keys re-emit verbatim.  See pipelines/incremental.update_kg."""
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    cfg = cfg or PipelineConfig()
    if cfg.source_ids_limit_method != SOURCE_IDS_LIMIT_KEEP:
        import warnings

        # A FIFO tail-cap at the partial level is provably unsafe (refutation
        # in stages/merge.py's module docstring), so FIFO partials carry the
        # key's FULL source list through both shuffles.
        warnings.warn(
            "source_ids_limit_method=FIFO keeps UNCAPPED per-key source "
            "lists in merge partials (the tail-cap is not associative — "
            "see stages/merge.py). A planet-hot key's partials grow with "
            "its mention count; the reference shares this limitation. "
            "Use KEEP (the default) for bounded memory at scale.",
            stacklevel=2,
        )
    paths = ckpt.BuildPaths(root=out_dir)
    ckpt.ensure_dirs(paths)

    if isinstance(pages_paths, str):
        pages_files = sorted(glob.glob(os.path.join(pages_paths, "*.parquet")))
    else:
        pages_files = sorted(pages_paths)
    if not pages_files:
        raise FileNotFoundError(f"no pages parquet under {pages_paths!r}")
    parts = _partition_files(pages_files, num_partitions)

    # ---- Phases A/B: pages → chunks → mentions (per partition)
    # With write_chunks_table=True the chunks table is its own resumable
    # phase (reference-parity: text_chunks is persisted); with False the
    # whole path fuses into one streaming pass per partition.
    extract_text = make_extract_text_fn(cfg)
    # Prune the pages scan to the columns extract_text actually reads: the
    # schema carries BOTH html:binary and text:string (duplicate corpus
    # bytes) but only cfg.text_source is used — at 100 TB reading both
    # doubles the bytes through Parquet + the object store.
    pages_columns = [
        "url",
        "warc_ts",
        "html" if cfg.text_source == "html" else "text",
        "lang",
    ]

    def _chunked(source_ds):
        return source_ds.map_batches(
            extract_text, batch_format="pyarrow", zero_copy_batch=True
        ).map_batches(
            ChunkerStage,
            fn_constructor_args=(cfg,),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.chunker_batch_size,
            concurrency=cfg.chunker_concurrency,
        )

    def _extracted(chunks_ds):
        return chunks_ds.map_batches(
            ExtractStage,
            fn_constructor_args=(cfg,),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.extractor_batch_size,
            concurrency=cfg.extractor_concurrency,
        )

    digests = [_files_digest(files) for files in parts]

    # track-id ops surface (reference lightrag.py:1804-1829): every
    # invocation gets a track record; per-doc status derives from the unit
    # markers (state/doc_status.py), never from a stored state machine.
    from lightrag_ray.state import doc_status as track

    if track_id is None:
        track_id = track.generate_track_id("insert")
    track.record_track(paths, track_id, parts, digests)

    any_part_ran = False
    if cfg.write_chunks_table:
        for k, files in enumerate(parts):
            if not files:  # hash partitioning may leave a partition empty
                continue
            unit = f"chunks-part-{k:05d}-{digests[k]}"
            ckpt.clear_stale_markers(paths, f"chunks-part-{k:05d}-", unit)
            ran = _run_part(
                paths,
                unit,
                paths.part_dir("chunks", k),
                lambda files=files: _chunked(
                    rd.read_parquet(files, columns=pages_columns)
                ),
                resume,
                extra={"phase": "chunks", "partition_id": k, "n_files_in": len(files)},
            )
            if ran:  # downstream mentions partition is now stale
                any_part_ran = True
                ckpt.clear_stale_markers(paths, f"mentions-part-{k:05d}-", "")
        for k in range(len(parts)):
            if not parts[k]:
                continue
            chunks_part = paths.part_dir("chunks", k)
            unit = f"mentions-part-{k:05d}-{digests[k]}"
            ckpt.clear_stale_markers(paths, f"mentions-part-{k:05d}-", unit)
            any_part_ran |= _run_part(
                paths,
                unit,
                paths.part_dir("mentions", k),
                lambda chunks_part=chunks_part: _extracted(
                    rd.read_parquet(chunks_part)
                ),
                resume,
                extra={"phase": "mentions", "partition_id": k},
                partition_cols=["kind"],
            )
    else:
        for k, files in enumerate(parts):
            if not files:
                continue
            unit = f"mentions-part-{k:05d}-{digests[k]}"
            ckpt.clear_stale_markers(paths, f"mentions-part-{k:05d}-", unit)
            any_part_ran |= _run_part(
                paths,
                unit,
                paths.part_dir("mentions", k),
                lambda files=files: _extracted(
                    _chunked(rd.read_parquet(files, columns=pages_columns))
                ),
                resume,
                extra={"phase": "mentions_fused", "partition_id": k},
                partition_cols=["kind"],
            )

    if any_part_ran:
        # new/changed mention partitions invalidate the merge outputs
        for unit in ("nodes_pre", "edges", "nodes"):
            ckpt.reset_unit(paths, unit, paths.phase_dir(unit))

    def _reprobed(cfg_in: PipelineConfig, boundary: str):
        """Phase-boundary re-sizing (cfg.reprobe): re-measure sustained
        parallelism NOW and re-derive the shuffle knobs from it.

        A session-start probe cannot see a burstable host depleting its CPU
        credits mid-build; shuffles sized to the stale reading thrash (see
        PipelineConfig.reprobe).  Only partitioning knobs change
        (shuffle_partitions, concurrent_reduces) — salt/reduce bucketing and
        every semantic knob stay fixed, so the output is bit-identical to a
        non-adaptive run.  Returns (cfg, lineage_extra | None)."""
        if not cfg_in.reprobe:
            return cfg_in, None
        import dataclasses
        import math

        import ray

        from lightrag_ray import probe

        nominal = int(ray.cluster_resources().get("CPU", 8))
        eff = probe.measure_effective_cpus(nominal)
        sized = max(2, min(nominal, math.ceil(eff)))
        cfg_out = dataclasses.replace(
            cfg_in,
            shuffle_partitions=max(8, sized),
            concurrent_reduces=cfg_in.concurrent_reduces
            and eff >= 0.7 * nominal,
        )
        info = {
            "reprobe_boundary": boundary,
            "reprobe_effective_cpus": round(eff, 2),
            "reprobe_nominal_cpus": nominal,
            "reprobe_shuffle_partitions": cfg_out.shuffle_partitions,
            "reprobe_concurrent_reduces": cfg_out.concurrent_reduces,
        }
        import logging

        logging.getLogger("lightrag_ray.kg_build").info(
            "reprobe@%s: eff=%.1f/%d -> shuffle_partitions=%d "
            "concurrent_reduces=%s",
            boundary,
            eff,
            nominal,
            cfg_out.shuffle_partitions,
            cfg_out.concurrent_reduces,
        )
        return cfg_out, info

    # boundary B→C: the reduce phases shuffle; only probe when they will run
    reduce_pending = not (
        resume
        and ckpt.is_done(paths, "nodes_pre")
        and ckpt.is_done(paths, "edges")
    )
    reprobe_bc = None
    if reduce_pending:
        cfg, reprobe_bc = _reprobed(cfg, "B->C")

    mentions_glob = os.path.join(out_dir, "mentions")

    def _read_sized(files_or_dir, target_block_bytes: int = 32 << 20):
        """read_parquet with fan-out sized by ACTUAL bytes.

        Ray's default read heuristic targets a minimum block COUNT, which
        splits a tiny reduced-graph table into hundreds of near-empty blocks
        — and the downstream sort pays per-block scheduling for every one
        (measured: 40 s wall / 9 s remote compute for the endpoint
        aggregation over an 8 KB-scale graph, 382 blocks).  Sizing the block
        count as max(shuffle width, bytes/target) keeps full parallelism on
        TB-scale inputs and collapses KB-scale ones to one block per shuffle
        partition."""
        files = (
            sorted(
                glob.glob(
                    os.path.join(files_or_dir, "**", "*.parquet"), recursive=True
                )
            )
            if isinstance(files_or_dir, str)
            else list(files_or_dir)
        )
        n_bytes = sum(os.path.getsize(f) for f in files)
        width = cfg.shuffle_partitions or 8
        n_blocks = max(width, n_bytes // target_block_bytes)
        return rd.read_parquet(files, override_num_blocks=int(n_blocks))

    def _read_mentions(kind: str):
        # mentions are hive-partitioned by kind: select the partition
        # directories directly — only that half of the table leaves storage
        files = sorted(
            glob.glob(
                os.path.join(mentions_glob, "**", f"kind={kind}", "*.parquet"),
                recursive=True,
            )
        )
        if not files:
            # A valid corpus can legitimately produce zero mentions of one
            # kind (e.g. every chunk yields ≤ 1 entity ⇒ no relations), and
            # write_parquet(partition_cols=["kind"]) only creates directories
            # for observed kinds — emit an empty, schema-carrying dataset
            # instead of failing the build.
            from lightrag_ray.stages.extract import MENTIONS_SCHEMA

            schema = pa.schema(
                [f for f in MENTIONS_SCHEMA if f.name != "kind"]
            )
            return rd.from_arrow(schema.empty_table())
        return _read_sized(files)

    # ---- Phases C1 + C2: entity/edge canonicalization (independent shuffles,
    # run concurrently so the two Dataset executions share the cluster)
    nodes_pre_dir = paths.phase_dir("nodes_pre")
    edges_dir = paths.phase_dir("edges")
    from concurrent.futures import ThreadPoolExecutor

    def _prior(path):
        return _read_sized(path) if path else None

    from lightrag_ray.stages.merge import NODES_SCHEMA

    from lightrag_ray.stages.merge import EDGES_SCHEMA

    edges_out_schema = pa.schema(
        [EDGES_SCHEMA.field(c) for c in EDGE_OUTPUT_COLUMNS + ["_ord"]]
    )
    run_nodes_pre = (
        _run_part,
        paths,
        "nodes_pre",
        nodes_pre_dir,
        lambda: canonicalize_entities(
            _read_mentions("e"), cfg, prior_nodes=_prior(prior_nodes_dir)
        ),
        resume,
        {"phase": "nodes_pre", **(reprobe_bc or {})},
    )
    run_edges = (
        _run_part,
        paths,
        "edges",
        edges_dir,
        lambda: canonicalize_edges(
            _read_mentions("r"), cfg, prior_edges=_prior(prior_edges_dir)
        ).select_columns(EDGE_OUTPUT_COLUMNS + ["_ord"]),
        resume,
        {"phase": "edges", **(reprobe_bc or {})},
    )
    if cfg.concurrent_reduces:
        # independent shuffles share the cluster (multi-node default)
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_nodes = pool.submit(*run_nodes_pre, empty_schema=NODES_SCHEMA)
            f_edges = pool.submit(*run_edges, empty_schema=edges_out_schema)
            f_nodes.result()
            f_edges.result()
    else:
        # sequential: each shuffle gets the whole node (single-node /
        # oversubscribed hosts — see PipelineConfig.concurrent_reduces)
        run_nodes_pre[0](*run_nodes_pre[1:], empty_schema=NODES_SCHEMA)
        run_edges[0](*run_edges[1:], empty_schema=edges_out_schema)

    # ---- Phase C3: endpoint back-propagation → final nodes
    from lightrag_ray.stages.endpoints import FINAL_NODES_SCHEMA

    reprobe_cd = None
    if not (resume and ckpt.is_done(paths, "nodes")):
        cfg, reprobe_cd = _reprobed(cfg, "C->endpoints")

    nodes_dir = paths.phase_dir("nodes")
    _run_part(
        paths,
        "nodes",
        nodes_dir,
        lambda: apply_endpoints(
            _read_sized(nodes_pre_dir), _read_sized(edges_dir), cfg
        ).select_columns(FINAL_NODES_COLUMNS),
        resume,
        extra={"phase": "nodes", **(reprobe_cd or {})},
        empty_schema=pa.schema(
            [FINAL_NODES_SCHEMA.field(c) for c in FINAL_NODES_COLUMNS]
        ),
    )

    lineage_path = ckpt.write_lineage_parquet(paths)
    return BuildResult(
        chunks_dir=paths.phase_dir("chunks"),
        mentions_dir=mentions_glob,
        nodes_dir=nodes_dir,
        edges_dir=edges_dir,
        lineage_path=lineage_path,
        track_id=track_id,
    )
