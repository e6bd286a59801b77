"""Merge-semantics parity: our salted two-stage canonicalization vs the
reference's `_merge_nodes_then_upsert` / `_merge_edges_then_upsert` driven over
an in-memory graph (the same harness style as the reference's own
tests/extraction/test_merge_description_dedup.py).

Both sides consume the SAME deterministic mention sets (generated with a
seeded RNG: Zipf-hot entities, type-vote collisions, duplicate descriptions,
unseen relation endpoints, cap overflows) and the SAME deterministic summary
model; node/edge fields are compared exactly.
"""

from __future__ import annotations

import asyncio
import json
import random
import re

import pandas as pd
import pyarrow as pa
import pytest

from lightrag_ray.config import PipelineConfig
from lightrag_ray.constants import GRAPH_FIELD_SEP
from lightrag_ray.functions.tokenizer import SegmentTokenizer
from lightrag_ray.stages.endpoints import (
    FINAL_NODES_SCHEMA,
    make_edges_to_endpoint_rows,
    make_finalize_endpoint_bucket_groupfn,
    make_nodes_to_endpoint_rows,
)
from lightrag_ray.stages.extract import MENTIONS_SCHEMA
from lightrag_ray.stages.merge import (
    EDGES_SCHEMA,
    NODES_SCHEMA,
    make_bucket_finalize_edges_groupfn,
    make_bucket_finalize_entities_groupfn,
    make_bucket_merge_groupfn,
    make_edge_partials_fn,
    make_entity_partials_fn,
    make_prior_edges_to_partials_fn,
    make_prior_nodes_to_partials_fn,
)
from lightrag_ray.stages.summarize import make_deterministic_summary_model

# ---------------------------------------------------------------------------
# deterministic mention-set generator


def gen_mentions(seed: int, n_chunks: int = 40, hot_every: int = 2):
    rng = random.Random(seed)
    names = [f"entity {i:02d}" for i in range(12)] + ["HotCorp"]
    types = ["organization", "person", "location"]
    e_rows, r_rows = [], []
    for c in range(n_chunks):
        doc = c // 4
        url = f"https://s.example/{doc:04d}"
        ts = 1_700_000_000 + doc
        sid = f"doc-{doc:04d}-chunk-{c % 4:03d}"
        chunk_names = rng.sample(names[:-1], k=rng.randint(2, 5))
        if c % hot_every == 0:
            chunk_names.append("HotCorp")
        ri = 0
        for name in chunk_names:
            desc = (
                f"{name} described in chunk {c}"
                if rng.random() < 0.7
                else f"{name} recurring description"  # exact dupes across chunks
            )
            e_rows.append(
                dict(
                    kind="e", name=name, tgt="", entity_type=rng.choice(types),
                    description=desc, keywords="", weight=0.0, source_id=sid,
                    file_path=url, timestamp=ts, chunk_order=c % 4, rec_index=ri,
                )
            )
            ri += 1
        pairs = list(zip(chunk_names, chunk_names[1:]))
        if rng.random() < 0.4:
            pairs.append((chunk_names[0], f"ghost {rng.randint(0, 3)}"))  # unseen endpoint
        for a, b in pairs:
            if a == b:
                continue
            r_rows.append(
                dict(
                    kind="r", name=a, tgt=b, entity_type="",
                    description=f"{a} linked to {b} in chunk {c}",
                    keywords=rng.choice(["joint, venture", "co-occurrence", "деal"]),
                    weight=1.0, source_id=sid, file_path=url, timestamp=ts,
                    chunk_order=c % 4, rec_index=ri,
                )
            )
            ri += 1
    return e_rows, r_rows


def _ord(row):
    return (row["timestamp"], row["file_path"], row["chunk_order"], row["rec_index"])


# ---------------------------------------------------------------------------
# our side (production group fns, driven without Ray)


def _apply_groupfn(df: pd.DataFrame, keys: list[str], fn, out_schema=None):
    outs = []
    for _, g in df.groupby(keys, sort=True):
        outs.append(fn(g.reset_index(drop=True)))
    if not outs:
        return pa.table({}) if out_schema is None else out_schema.empty_table()
    if isinstance(outs[0], pd.DataFrame):
        return pd.concat(outs, ignore_index=True)
    return pa.concat_tables(outs)


def run_ours(
    e_rows, r_rows, cfg: PipelineConfig, batch_size: int = 37,
    prior_nodes: pa.Table | None = None, prior_edges: pa.Table | None = None,
):
    def batches(rows):
        for i in range(0, len(rows), batch_size):
            chunk = rows[i : i + batch_size]
            yield pa.Table.from_pylist(chunk, schema=MENTIONS_SCHEMA)

    # entities (`incremental` mirrors canonicalize_entities/edges: partial
    # caps off whenever a prior snapshot joins the reduce)
    inc_n = prior_nodes is not None
    e_parts = [make_entity_partials_fn(cfg, inc_n)(b) for b in batches(e_rows)]
    if prior_nodes is not None and prior_nodes.num_rows:
        e_parts.append(make_prior_nodes_to_partials_fn(cfg)(prior_nodes))
    e_df = pa.concat_tables(e_parts).to_pandas() if e_parts else None
    nodes_pre = NODES_SCHEMA.empty_table()
    if e_df is not None and len(e_df):
        merged = _apply_groupfn(
            e_df, ["b1"], make_bucket_merge_groupfn(cfg, "e", inc_n)
        )
        nodes_pre = _apply_groupfn(
            merged.to_pandas(),
            ["b2"],
            make_bucket_finalize_entities_groupfn(cfg, inc_n),
            NODES_SCHEMA,
        )
    # edges
    inc_r = prior_edges is not None
    r_parts = [make_edge_partials_fn(cfg, inc_r)(b) for b in batches(r_rows)]
    if prior_edges is not None and prior_edges.num_rows:
        r_parts.append(make_prior_edges_to_partials_fn(cfg)(prior_edges))
    edges = EDGES_SCHEMA.empty_table()
    if r_parts:
        r_df = pa.concat_tables(r_parts).to_pandas()
        if len(r_df):
            merged = _apply_groupfn(
                r_df, ["b1"], make_bucket_merge_groupfn(cfg, "r", inc_r)
            )
            edges = _apply_groupfn(
                merged.to_pandas(),
                ["b2"],
                make_bucket_finalize_edges_groupfn(cfg, inc_r),
                EDGES_SCHEMA,
            )
    # endpoints
    union = pa.concat_tables(
        [
            make_nodes_to_endpoint_rows(cfg)(nodes_pre),
            make_edges_to_endpoint_rows(cfg)(edges),
        ]
    )
    nodes = _apply_groupfn(
        union.to_pandas(),
        ["_bucket"],
        make_finalize_endpoint_bucket_groupfn(cfg),
        FINAL_NODES_SCHEMA,
    )
    nodes_list = sorted(nodes.to_pylist(), key=lambda r: r["entity_id"])
    edges_list = sorted(edges.to_pylist(), key=lambda r: (r["src_id"], r["tgt_id"]))
    return nodes_list, edges_list


# ---------------------------------------------------------------------------
# reference side (real merge coroutines, in-memory graph)


class _MemGraph:
    def __init__(self):
        self.nodes: dict = {}
        self.edges: dict = {}

    async def get_node(self, name):
        return self.nodes.get(name)

    async def upsert_node(self, name, node_data):
        self.nodes[name] = dict(node_data)

    async def has_node(self, name):
        return name in self.nodes

    async def has_edge(self, src, tgt):
        return (src, tgt) in self.edges or (tgt, src) in self.edges

    async def get_edge(self, src, tgt):
        return self.edges.get((src, tgt)) or self.edges.get((tgt, src))

    async def upsert_edge(self, src, tgt, edge_data):
        self.edges[(src, tgt)] = dict(edge_data)


def _make_ref_llm(cfg: PipelineConfig):
    """Mock LLM applying OUR deterministic summary model to the prompt's JSONL
    payload — the shared pure function both engines summarize with."""
    tokenizer = SegmentTokenizer()
    model = make_deterministic_summary_model(tokenizer, cfg.summary_length_recommended)

    async def llm(prompt: str, **kwargs) -> str:
        m = re.search(r"(Entity|Relation) Name: (.+?)\n", prompt)
        dtype, name = m.group(1), m.group(2)
        block = re.search(r"```\n(.*?)\n```", prompt, re.DOTALL).group(1)
        descs = [
            json.loads(line)["Description"]
            for line in block.splitlines()
            if line.strip()
        ]
        return model(dtype, name, descs)

    return llm


def _ref_config(ref, cfg: PipelineConfig):
    return {
        "tokenizer": ref.utils.Tokenizer("segment", SegmentTokenizer()),
        "summary_context_size": cfg.summary_context_size,
        "summary_max_tokens": cfg.summary_max_tokens,
        "force_llm_summary_on_merge": cfg.force_llm_summary_on_merge,
        "summary_length_recommended": cfg.summary_length_recommended,
        "source_ids_limit_method": cfg.source_ids_limit_method,
        "max_source_ids_per_entity": cfg.max_source_ids_per_entity,
        "max_source_ids_per_relation": cfg.max_source_ids_per_relation,
        "max_file_paths": cfg.max_file_paths,
        "file_path_more_placeholder": cfg.file_path_more_placeholder,
        "role_llm_funcs": {"extract": _make_ref_llm(cfg)},
        "addon_params": {},
        "embedding_token_limit": None,
    }


def run_reference(ref, e_rows, r_rows, cfg: PipelineConfig, graph=None):
    graph = graph or _MemGraph()
    config = _ref_config(ref, cfg)

    # group mentions exactly as merge_nodes_and_edges does
    # (lightrag/operate.py:3374-3387), in deterministic arrival order
    all_nodes: dict[str, list] = {}
    for row in sorted(e_rows, key=_ord):
        all_nodes.setdefault(row["name"], []).append(
            dict(
                entity_name=row["name"], entity_type=row["entity_type"],
                description=row["description"], source_id=row["source_id"],
                file_path=row["file_path"], timestamp=row["timestamp"],
            )
        )
    all_edges: dict[tuple, list] = {}
    for row in sorted(r_rows, key=_ord):
        key = tuple(sorted((row["name"], row["tgt"])))
        all_edges.setdefault(key, []).append(
            dict(
                src_id=row["name"], tgt_id=row["tgt"], weight=row["weight"],
                description=row["description"], keywords=row["keywords"],
                source_id=row["source_id"], file_path=row["file_path"],
                timestamp=row["timestamp"],
            )
        )

    async def drive():
        for name, rows in all_nodes.items():
            await ref.operate._merge_nodes_then_upsert(
                name, rows, graph, None, config
            )
        for (src, tgt), rows in all_edges.items():
            await ref.operate._merge_edges_then_upsert(
                src, tgt, rows, graph, None, None, config
            )

    asyncio.run(drive())
    return graph


# ---------------------------------------------------------------------------
# comparison


def _split(joined: str) -> list[str]:
    return [s for s in (joined or "").split(GRAPH_FIELD_SEP) if s]


def _compare(ref_graph: _MemGraph, nodes: list[dict], edges: list[dict]):
    ours_nodes = {n["entity_id"]: n for n in nodes}
    assert set(ours_nodes) == set(ref_graph.nodes)
    for name, ref_node in ref_graph.nodes.items():
        ours = ours_nodes[name]
        assert ours["entity_type"] == ref_node["entity_type"], name
        assert ours["description"] == ref_node["description"], name
        assert ours["source_ids"] == _split(ref_node["source_id"]), name
        assert ours["file_paths"] == _split(ref_node["file_path"]), name
        assert ours["truncate"] == ref_node.get("truncate", ""), name

    ref_edges = {tuple(sorted(k)): v for k, v in ref_graph.edges.items()}
    ours_edges = {(e["src_id"], e["tgt_id"]): e for e in edges}
    assert set(ours_edges) == set(ref_edges)
    for key, ref_edge in ref_edges.items():
        ours = ours_edges[key]
        assert ours["weight"] == ref_edge["weight"], key
        assert ours["description"] == ref_edge["description"], key
        assert ",".join(ours["keywords"]) == ref_edge["keywords"], key
        assert ours["source_ids"] == _split(ref_edge["source_id"]), key
        assert ours["file_paths"] == _split(ref_edge["file_path"]), key
        assert ours["truncate"] == ref_edge.get("truncate", ""), key


# ---------------------------------------------------------------------------
# the actual tests


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_merge_parity_default_caps(ref, seed):
    cfg = PipelineConfig()
    e_rows, r_rows = gen_mentions(seed)
    nodes, edges = run_ours(e_rows, r_rows, cfg)
    _compare(run_reference(ref, e_rows, r_rows, cfg), nodes, edges)


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_merge_parity_tight_keep_caps(ref, seed):
    """Caps small enough that KEEP truncation + file-path placeholders fire."""
    cfg = PipelineConfig(
        max_source_ids_per_entity=5,
        max_source_ids_per_relation=3,
        max_file_paths=2,
    )
    e_rows, r_rows = gen_mentions(seed, n_chunks=60)
    nodes, edges = run_ours(e_rows, r_rows, cfg)
    _compare(run_reference(ref, e_rows, r_rows, cfg), nodes, edges)


@pytest.mark.parametrize("seed", [21, 22])
def test_merge_parity_fifo(ref, seed):
    cfg = PipelineConfig(
        source_ids_limit_method="FIFO",
        max_source_ids_per_entity=5,
        max_source_ids_per_relation=4,
        max_file_paths=3,
    )
    e_rows, r_rows = gen_mentions(seed, n_chunks=50)
    nodes, edges = run_ours(e_rows, r_rows, cfg)
    _compare(run_reference(ref, e_rows, r_rows, cfg), nodes, edges)


@pytest.mark.parametrize("seed", [31, 32])
def test_merge_parity_summary_gate(ref, seed):
    """Thresholds low enough that the deterministic summary model runs,
    including multi-round map-reduce."""
    cfg = PipelineConfig(
        force_llm_summary_on_merge=3,
        summary_max_tokens=20,
        summary_context_size=40,
        summary_length_recommended=15,
    )
    e_rows, r_rows = gen_mentions(seed, n_chunks=30)
    nodes, edges = run_ours(e_rows, r_rows, cfg)
    _compare(run_reference(ref, e_rows, r_rows, cfg), nodes, edges)


def _two_batches(seed: int, n_chunks: int = 60):
    e_rows, r_rows = gen_mentions(seed, n_chunks=n_chunks)
    cut_e = len(e_rows) // 2
    cut_r = len(r_rows) // 2
    return (e_rows[:cut_e], r_rows[:cut_r]), (e_rows[cut_e:], r_rows[cut_r:])


@pytest.mark.parametrize(
    "cfg",
    [
        PipelineConfig(),
        PipelineConfig(
            max_source_ids_per_entity=6, max_source_ids_per_relation=4,
            max_file_paths=3,
        ),
        PipelineConfig(
            source_ids_limit_method="FIFO",
            max_source_ids_per_entity=6, max_source_ids_per_relation=4,
            max_file_paths=3,
        ),
        PipelineConfig(
            force_llm_summary_on_merge=3, summary_max_tokens=20,
            summary_context_size=40, summary_length_recommended=15,
        ),
    ],
    ids=["default", "tight-keep", "fifo", "summary-gate"],
)
@pytest.mark.parametrize("seed", [41, 42])
def test_incremental_merge_parity(ref, seed, cfg):
    """Batch 1 builds a graph; batch 2 merges INTO it (the reference's
    `already_*` incremental arm) — ours via prior-snapshot partials."""
    (e1, r1), (e2, r2) = _two_batches(seed)

    # reference: sequential batches over one live graph
    graph = run_reference(ref, e1, r1, cfg)
    graph = run_reference(ref, e2, r2, cfg, graph=graph)

    # ours: batch 1 fresh, batch 2 against the batch-1 snapshot
    nodes1, edges1 = run_ours(e1, r1, cfg)
    nodes2, edges2 = run_ours(
        e2,
        r2,
        cfg,
        prior_nodes=pa.Table.from_pylist(
            [dict(n, _sources_complete=not n["truncate"]) for n in nodes1]
        ),
        prior_edges=pa.Table.from_pylist(edges1, schema=EDGES_SCHEMA),
    )
    _compare(graph, nodes2, edges2)


def test_merge_partitioning_invariance():
    """Output is identical for any batch split of the same mention rows."""
    cfg = PipelineConfig(max_source_ids_per_entity=7, max_source_ids_per_relation=5)
    e_rows, r_rows = gen_mentions(99, n_chunks=50)
    base = run_ours(e_rows, r_rows, cfg, batch_size=1000)
    for bs in (7, 23, 64):
        assert run_ours(e_rows, r_rows, cfg, batch_size=bs) == base
    # and for any row ORDER (shuffled input)
    rng = random.Random(0)
    e2, r2 = list(e_rows), list(r_rows)
    rng.shuffle(e2)
    rng.shuffle(r2)
    assert run_ours(e2, r2, cfg, batch_size=13) == base


@pytest.mark.parametrize("seed", [51, 52])
def test_incremental_reingest_hot_keys_keep(ref, seed):
    """Round-1 ADVICE regression: KEEP-mode incremental RE-INGEST of hot keys.

    Batch 2 replays many of batch 1's mentions (already-stored source_ids)
    plus more new sources than the cap.  The reference admits replayed rows
    because their source_id is already stored (operate.py step 4 keeps
    existing_full_source_ids); partial-level capping computed over the
    new-mention order alone would drop them before the finalizer."""
    cfg = PipelineConfig(
        max_source_ids_per_entity=4, max_source_ids_per_relation=3,
        max_file_paths=2,
    )
    e_rows, r_rows = gen_mentions(seed, n_chunks=60, hot_every=1)
    cut_e, cut_r = 2 * len(e_rows) // 3, 2 * len(r_rows) // 3
    # batch 1 = the chronologically LAST third (largest ord keys), so its
    # stored source_ids sort BEYOND the new-order cap when batch 2 replays
    # them together with the earlier two-thirds — the exact dropped-early case
    e1, r1 = e_rows[cut_e:], r_rows[cut_r:]
    e2 = e_rows[:cut_e] + e1[:-5]
    r2 = r_rows[:cut_r] + r1[:-5]

    graph = run_reference(ref, e1, r1, cfg)
    graph = run_reference(ref, e2, r2, cfg, graph=graph)

    nodes1, edges1 = run_ours(e1, r1, cfg)
    nodes2, edges2 = run_ours(
        e2,
        r2,
        cfg,
        prior_nodes=pa.Table.from_pylist(
            [dict(n, _sources_complete=not n["truncate"]) for n in nodes1]
        ),
        prior_edges=pa.Table.from_pylist(edges1, schema=EDGES_SCHEMA),
    )
    _compare(graph, nodes2, edges2)


def test_llm_summary_model_protocol():
    """X3's LLM arm: the injected model receives the reference-shaped prompt
    (JSONL list, subject header, token constraint) and its output is
    sanitized + think-stripped."""
    from lightrag_ray.stages.summarize import make_llm_summary_model

    seen = {}

    def model(user_prompt, system_prompt, history):
        seen["prompt"] = user_prompt
        return "<think>plan</think>Alpha Corp is a company.\x00"

    fn = make_llm_summary_model(model, target_tokens=600)
    out = fn("Entity", "Alpha Corp", ["desc one", "desc two"])
    assert out == "Alpha Corp is a company."
    assert 'Entity Name: Alpha Corp' in seen["prompt"]
    assert '{"Description": "desc one"}' in seen["prompt"]
    assert "must not exceed 600 tokens" in seen["prompt"]
