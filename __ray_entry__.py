"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
(or in lightrag_ray) calls ``ray.init()`` / ``ray.shutdown()``.

``entry()`` runs the flagship pipeline — the full KG construction over a
deterministic Common-Crawl-style pages corpus synthesized from sf0.001 —
and returns the node table.  ``queries()`` / ``oracle_sql()`` expose the
operator catalog checked against DuckDB (see
lightrag_ray/pipelines/queries.py) plus rows-only entries for the
non-SQL-expressible pipelines.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable
from typing import Any

from lightrag_ray.config import PipelineConfig
from lightrag_ray.pipelines import queries as _Q
from lightrag_ray.pipelines.kg_build import build_kg
from lightrag_ray.sources.pages import synth_pages_from_documents


def _run_flagship(sf_dir: str):
    import ray.data as rd

    work = tempfile.mkdtemp(prefix="lightrag_ray_entry_")
    files = synth_pages_from_documents(sf_dir, f"{work}/pages", num_files=4)
    result = build_kg(files, f"{work}/build", PipelineConfig(), num_partitions=2)
    return rd.read_parquet(result.nodes_dir)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 → nodes Dataset."""
    return _run_flagship("/root/testdata/sf0.001")


def _q_kg_build_nodes(sf_dir: str):
    return _run_flagship(sf_dir)


def _q_kg_build_edges(sf_dir: str):
    import ray.data as rd

    work = tempfile.mkdtemp(prefix="lightrag_ray_entry_")
    files = synth_pages_from_documents(sf_dir, f"{work}/pages", num_files=4)
    result = build_kg(files, f"{work}/build", PipelineConfig(), num_partitions=2)
    ds = rd.read_parquet(result.edges_dir)
    return ds.map_batches(
        lambda t: t.select(["src_id", "tgt_id", "weight", "created_at"]),
        batch_format="pyarrow",
    )


def queries() -> dict[str, Callable[[str], Any]]:
    q = dict(_Q.queries())
    # rows-only checked pipelines (not SQL-expressible: token-window overlap,
    # salted shuffle, stateful stages)
    q["kg_build_nodes"] = _q_kg_build_nodes
    q["kg_build_edges"] = _q_kg_build_edges
    try:
        from lightrag_ray.extras import catalog as _extras

        q.update(_extras.queries())
    except ImportError:
        pass
    return q


def oracle_sql() -> dict[str, str]:
    sql = dict(_Q.oracle_sql())
    try:
        from lightrag_ray.extras import catalog as _extras

        sql.update(_extras.oracle_sql())
    except ImportError:
        pass
    return sql
