"""Benchmark harness.

Headline: full KG construction (pages → chunks → mentions → nodes/edges) over
a deterministic Common-Crawl-style corpus synthesized from
``$GRAFT_SF_DIR/documents.parquet`` (default /root/testdata/sf0.1), replicated
``$BENCH_REPLICATE``× (default 20) with distinct urls so the corpus is large
enough for parallelism to matter.  Prints ONE JSON line.

    python bench.py                # headline + per-query timings
    python bench.py --scaling      # same job at N and 4N CPUs (default 4/16)
                                   # in fresh processes; reports efficiency

Ray session: ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("BENCH_REPLICATE", "480"))
WORK = os.environ.get("BENCH_WORK_DIR", "/tmp/lightrag_bench")


def _progress(msg: str) -> None:
    """Per-leg heartbeat on stderr (stdout stays the one JSON line) — makes
    a wedged leg identifiable from the log instead of a silent hour."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)

TIMED_QUERIES = ["doc_chunk_stats", "kg_nodes_simple", "exact_dedup", "knn_top10",
                 "simhash", "minhash_lsh_pairs", "embedding_lsh_pairs",
                 "knn_ivf_top10", "knn_ivf_delta_top10"]


def _pages_dir(k_lo: int = 0, k_hi: int | None = None) -> str:
    tag = os.path.basename(os.path.normpath(SF_DIR))
    k_hi = REPLICATE if k_hi is None else k_hi
    suffix = f"-x{REPLICATE}" if k_lo == 0 and k_hi == REPLICATE else f"-k{k_lo}-{k_hi}"
    return os.path.join(WORK, f"pages-{tag}{suffix}")


def synth_replicated_pages(
    num_files: int = 16, k_lo: int = 0, k_hi: int | None = None
) -> list[str]:
    """Deterministic replicated pages corpus (idempotent across runs — also
    serves as the warm-read for scaling comparisons).  ``k_lo``/``k_hi``
    select the variant range: the default [0, REPLICATE) is the headline
    corpus; a disjoint range synthesizes NEW pages (distinct urls/texts) for
    the incremental leg."""
    import glob

    import pyarrow as pa
    import ray.data as rd

    k_hi = REPLICATE if k_hi is None else k_hi
    out_dir = _pages_dir(k_lo, k_hi)
    existing = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    if existing:
        return existing

    from lightrag_ray.sources.pages import PAGES_SCHEMA, _EPOCH_US

    def replicate(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        sources = batch.column("source").to_pylist()
        urls, tss, htmls, out_texts, out_langs = [], [], [], [], []
        for did, text, lang, src in zip(doc_ids, texts, langs, sources):
            for k in range(k_lo, k_hi):
                urls.append(f"https://{src}.example.org/doc/{did:010d}/v{k:04d}")
                tss.append(_EPOCH_US + (did * REPLICATE + k) * 1_000_000)
                body = f"{text} variant{k:04d}"
                htmls.append(f"<html><body><p>{body}</p></body></html>".encode())
                out_texts.append(body)
                out_langs.append(lang)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(out_texts, pa.string()),
                "lang": pa.array(out_langs, pa.string()),
            },
            schema=PAGES_SCHEMA,
        )

    os.makedirs(out_dir, exist_ok=True)
    ds = rd.read_parquet(
        os.path.join(SF_DIR, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )
    ds.map_batches(replicate, batch_format="pyarrow", zero_copy_batch=True).repartition(
        num_files
    ).write_parquet(out_dir)
    return sorted(glob.glob(os.path.join(out_dir, "*.parquet")))


def run_headline(eff_cpus: float | None = None) -> dict:
    import ray.data as rd

    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.pipelines.kg_build import build_kg

    files = synth_replicated_pages()
    n_pages = sum(
        __import__("pyarrow.parquet", fromlist=["x"]).read_metadata(f).num_rows
        for f in files
    )
    build_dir = os.path.join(WORK, f"build-cpus{NUM_CPUS}")
    shutil.rmtree(build_dir, ignore_errors=True)

    # Size pools from MEASURED sustained parallelism, not the nominal vCPU
    # count: on a throttled shared-tenancy host (this one sustains ~12-18 of
    # 32 nominal) pools sized to nominal oversubscribe and thrash (round-2
    # VERDICT #1).  eff ≤ nominal, so the fixed pools always fit the session.
    sized = NUM_CPUS if eff_cpus is None else max(3, min(NUM_CPUS, math.ceil(eff_cpus)))
    # fused phase runs BOTH pools at once: budget chunker + extractor + read
    # tasks within the sized budget or the executor deadlocks waiting for actors
    chunker_pool = max(1, sized // 8)
    extractor_pool = max(2, sized - 2 - chunker_pool)
    # shuffle knobs derived from cluster size (config.autoscaled), pools
    # budgeted explicitly for the fused phase
    cfg = PipelineConfig.autoscaled(
        cluster_cpus=sized,
        chunker_concurrency=chunker_pool,
        extractor_concurrency=extractor_pool,
        chunker_batch_size=512,
        extractor_batch_size=512,
        # bigger combiner batches measured faster again under the columnar
        # stage-0 (87 vs 91 s); ~0.5 GB heap per in-flight combine task, so
        # this stays a bench override — the library default is sized for
        # smaller workers
        merge_batch_size=524288,
        write_chunks_table=False,  # fused streaming pass (the at-scale default)
        # one node: two full-width concurrent shuffle executors thrash an
        # oversubscribed host (measured 330 s concurrent vs 78 s sequential
        # for the same two phases); each phase saturates the node alone
        concurrent_reduces=False,
        # re-probe at phase boundaries: the session-start probe can't see the
        # burstable host depleting credits MID-build (identical code measured
        # 202.6 vs 479.6 s); the reduce phases re-size from a fresh reading
        reprobe=True,
    )
    t0 = time.perf_counter()
    result = build_kg(files, build_dir, cfg, num_partitions=1, resume=False)
    wall = time.perf_counter() - t0
    n_nodes = rd.read_parquet(result.nodes_dir).count()
    n_edges = rd.read_parquet(result.edges_dir).count()
    return {
        "kg_build_sec": round(wall, 3),
        "n_pages": n_pages,
        "docs_per_sec": round(n_pages / wall, 1),
        "n_nodes": n_nodes,
        "n_edges": n_edges,
        "sized_cpus": sized,
        "nodes_dir": result.nodes_dir,
        "edges_dir": result.edges_dir,
    }


def run_incremental(eff_cpus: float | None = None) -> dict:
    """Incremental update_kg leg (round-2 VERDICT #8): prior graph = the
    headline build, delta = 10% NEW pages (disjoint variant range, distinct
    urls).  Measures the already_* merge arm: only the delta's mentions are
    extracted; the prior node/edge tables stream through the stored-partial
    path."""
    import ray.data as rd

    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.pipelines.incremental import update_kg

    delta_files = synth_replicated_pages(
        num_files=4, k_lo=REPLICATE, k_hi=REPLICATE + max(1, REPLICATE // 10)
    )
    n_delta = sum(
        __import__("pyarrow.parquet", fromlist=["x"]).read_metadata(f).num_rows
        for f in delta_files
    )
    prior_dir = os.path.join(WORK, f"build-cpus{NUM_CPUS}")
    out_dir = os.path.join(WORK, f"update-cpus{NUM_CPUS}")
    shutil.rmtree(out_dir, ignore_errors=True)
    sized = NUM_CPUS if eff_cpus is None else max(3, min(NUM_CPUS, math.ceil(eff_cpus)))
    chunker_pool = max(1, sized // 8)
    extractor_pool = max(2, sized - 2 - chunker_pool)
    cfg = PipelineConfig.autoscaled(
        cluster_cpus=sized,
        chunker_concurrency=chunker_pool,
        extractor_concurrency=extractor_pool,
        chunker_batch_size=512,
        extractor_batch_size=512,
        merge_batch_size=524288,
        write_chunks_table=False,
        concurrent_reduces=False,
        reprobe=True,
    )
    t0 = time.perf_counter()
    result = update_kg(prior_dir, delta_files, out_dir, cfg, num_partitions=1)
    wall = time.perf_counter() - t0
    return {
        "kg_update_sec": round(wall, 3),
        "n_delta_pages": n_delta,
        "delta_docs_per_sec": round(n_delta / wall, 1),
        "n_nodes_after": rd.read_parquet(result.nodes_dir).count(),
        "n_edges_after": rd.read_parquet(result.edges_dir).count(),
    }


def synth_replicated_documents(num_files: int = 16) -> str:
    """documents-shaped replicated corpus for the dedup/curation legs
    (round-3 VERDICT next #6): REPLICATE variants per source doc, with
    realistic crawl-dup skew — every 10th variant is a NEAR-DUP of the base
    text (suffix marker only → 3-gram Jaccard ≈ 1, clusters of REPLICATE/10
    members), the rest are distinct documents (deterministic word shuffle
    drops char-3-gram Jaccard to ~0.5, below the 0.8 threshold).  Returns an
    sf_dir-shaped directory containing documents.parquet/."""
    import glob
    import random

    import pyarrow as pa
    import ray.data as rd

    tag = os.path.basename(os.path.normpath(SF_DIR))
    root = os.path.join(WORK, f"docs-{tag}-x{REPLICATE}")
    out_dir = os.path.join(root, "documents.parquet")
    if glob.glob(os.path.join(out_dir, "*.parquet")):
        return root

    def replicate(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        out_ids, out_texts, out_langs = [], [], []
        for did, text, lang in zip(doc_ids, texts, langs):
            words = (text or "").split()
            for k in range(REPLICATE):
                out_ids.append(did * REPLICATE + k)
                if k % 10 == 0:  # near-dup arm: marker suffix only
                    out_texts.append(f"{text} variant{k:04d}")
                else:  # distinct arm: deterministic word shuffle
                    w = list(words)
                    random.Random((did << 20) | k).shuffle(w)
                    out_texts.append(" ".join(w) + f" variant{k:04d}")
                out_langs.append(lang)
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "text": pa.array(out_texts, pa.string()),
                "lang": pa.array(out_langs, pa.string()),
                # n_chars = len(text), the testdata documents convention
                # (q_bestrep_dedup_lsh reads it for the keep-longest argmax)
                "n_chars": pa.array(
                    [len(t) for t in out_texts], pa.int64()
                ),
            }
        )

    os.makedirs(out_dir, exist_ok=True)
    rd.read_parquet(
        os.path.join(SF_DIR, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    ).map_batches(replicate, batch_format="pyarrow", zero_copy_batch=True).repartition(
        num_files
    ).write_parquet(out_dir)
    return root


_LEG_TEMPLATE = """
import json, sys, time
import ray
ray.init(address="local", num_cpus={cpus}, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
{body}
ray.shutdown()
"""


def _subprocess_leg(body: str, timeout: int = 3600) -> dict:
    """Run one bench leg in its own process with a FRESH Ray session.

    The LSH→CC dedup chains are isolated this way because repeated chain
    runs inside one long-lived session reproducibly wedged the streaming
    executor: raylet workers segfault in _raylet.so on the third chain
    invocation (observed twice at the same instruction pointer, 2.4M-doc
    corpus), task retries then spin the driver at 100% forever.  A fresh
    session per heavy leg sidesteps the accumulation and also matches how
    these legs were measured in isolation."""
    code = _LEG_TEMPLATE.format(cpus=NUM_CPUS, body=body)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        return {"error": f"leg subprocess timed out after {timeout}s"}
    if proc.returncode != 0:
        return {"error": (proc.stderr or "no stderr")[-300:]}
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    return {"error": "no JSON line from leg subprocess"}


def run_dedup_legs() -> dict:
    """LSH→CC→filter chain throughput at bench scale (round-3 VERDICT next
    #6) plus the round-5 chain legs, EACH chain in its own subprocess /
    fresh Ray session (see _subprocess_leg for why)."""
    sf_like = synth_replicated_documents()
    out: dict = {}

    legs = {
        "chains": f"""
from lightrag_ray.extras import catalog as X
res = {{}}
for name, fn in (("corpus_dedup_lsh", X.q_corpus_dedup_lsh),
                 ("curated_corpus_lsh", X.q_curated_corpus_lsh)):
    cc = {{}}
    t0 = time.perf_counter()
    n = fn({sf_like!r}, cc_stats=cc).count()
    res[name] = round(time.perf_counter() - t0, 3)
    res[name + "_rows"] = n
    res[name + "_cc_iters"] = cc.get("cc_iterations")
print(json.dumps(res))
""",
        # the round-5 flagship composition: curate (LSH near-dup arm) →
        # pack into SEQ_LEN-token training sequences — only the 16 B/doc
        # count table is ever materialized on top of the curation chain
        "training_shards_lsh": f"""
from lightrag_ray.extras import packing as PK
t0 = time.perf_counter()
n = PK.q_training_shards_lsh({sf_like!r}).count()
print(json.dumps({{"training_shards_lsh": round(time.perf_counter() - t0, 3),
                   "training_shards_lsh_rows": n}}))
""",
        # keep-best-representative policy over the same LSH cluster chain
        "bestrep_dedup_lsh": f"""
from lightrag_ray.extras import catalog as X
t0 = time.perf_counter()
n = X.q_bestrep_dedup_lsh({sf_like!r}).count()
print(json.dumps({{"bestrep_dedup_lsh": round(time.perf_counter() - t0, 3),
                   "bestrep_dedup_lsh_rows": n}}))
""",
        # incremental LSH maintenance: one-time base index build vs the
        # per-refresh delta probe — the crawl-refresh cost model
        "lsh_delta": f"""
import os, shutil, tempfile
from lightrag_ray.extras import dedup as D
shutil.rmtree(os.path.join(tempfile.gettempdir(), "lightrag_ray_lshindex"),
              ignore_errors=True)
res = {{}}
t0 = time.perf_counter()
D.build_lsh_band_index({sf_like!r})
res["lsh_delta_index_build"] = round(time.perf_counter() - t0, 3)
t0 = time.perf_counter()
res["lsh_delta_probe_rows"] = D.lsh_delta_pairs({sf_like!r}).count()
res["lsh_delta_probe"] = round(time.perf_counter() - t0, 3)
print(json.dumps(res))
""",
        # signature-transport comparison (round-4 VERDICT next #1): the
        # broadcast arm vs the sharded arm the >8M-doc regime runs
        "lsh_transport": f"""
from lightrag_ray.extras import dedup as D
res = {{}}
for name, fn in (("lsh_pairs_broadcast", D.minhash_lsh_pairs),
                 ("lsh_pairs_sharded", D._minhash_lsh_pairs_sharded)):
    t0 = time.perf_counter()
    res[name + "_rows"] = fn({sf_like!r}).count()
    res[name] = round(time.perf_counter() - t0, 3)
print(json.dumps(res))
""",
    }
    for name, body in legs.items():
        _progress(f"dedup leg {name} (subprocess)")
        res = _subprocess_leg(body)
        if "error" in res:
            out[f"{name}_error"] = res["error"]
        else:
            out.update(res)
    if out.get("lsh_pairs_broadcast") and out.get("lsh_pairs_sharded"):
        out["lsh_sharded_vs_broadcast_ratio"] = round(
            out["lsh_pairs_sharded"] / out["lsh_pairs_broadcast"], 3
        )
    return out


def _seq_pack_leg(sf_like: str):
    from lightrag_ray.extras import packing as PK

    return PK.q_seq_pack(sf_like)


def run_webquality_legs() -> dict:
    """Webtext curation gates at bench scale: repetition stats, the
    boilerplate scorer (DF combiner → vocab-bounded groupby → guarded
    broadcast) and PII redaction over the replicated documents corpus.
    Consumed with count() so the corpus-sized outputs stream through the
    executor instead of landing on the driver.  passage_dedup_docs is the
    tumbling-8-gram exact-substring gate: two bounded-bucket exchanges over
    the fingerprint stream (~n_tokens/8 skinny rows per doc)."""
    from lightrag_ray.extras import catalog as X
    from lightrag_ray.extras import passages as PS
    from lightrag_ray.extras import webquality as WQ

    sf_like = synth_replicated_documents()
    out = {}
    for name, fn in (
        ("repetition_stats", WQ.q_repetition_stats),
        ("boilerplate_frac", WQ.q_boilerplate_frac),
        ("pii_scan", WQ.q_pii_scan),
        ("lm_quality", WQ.q_lm_quality),
        ("ccnet_buckets", WQ.q_ccnet_buckets),
        ("host_quality_gate", WQ.q_host_quality_gate),
        ("dsir_select", X.q_dsir_select),
        ("seq_pack", _seq_pack_leg),
        ("passage_dedup_docs", PS.q_passage_dedup_docs),
    ):
        _progress(f"webquality leg {name}")
        t0 = time.perf_counter()
        try:
            n = fn(sf_like).count()
        except Exception as ex:  # one failing leg must not kill the bench
            out[f"{name}_error"] = repr(ex)[:300]
            continue
        out[name] = round(time.perf_counter() - t0, 3)
        out[f"{name}_rows"] = n
    return out


def run_webcrawl_legs() -> dict:
    """Crawl-side operators at bench scale: URL canonicalization dedup
    (bounded-bucket argmax reduce), BM25 scoring (narrow TF table build +
    score), and 8-gram decontamination (guarded eval-gram broadcast into an
    actor-pool scorer) over the replicated documents corpus.

    decontam uses a corpus-scaled ``eval_mod`` so the held-out slice stays
    benchmark-suite-sized (~1.2k docs at 2.4M): real eval sets are FIXED
    size, and a 1/20 slice of a replicated 2.4M-doc corpus is not a
    benchmark — it correctly trips the broadcast guard."""
    from lightrag_ray.extras import webcrawl as WC

    sf_like = synth_replicated_documents()
    out = {}
    for name, fn in (
        ("url_dedup", WC.q_url_dedup),
        ("bm25_top10", WC.q_bm25_top10),
        ("decontam", lambda sf: WC.q_decontam(sf, eval_mod=2000)),
        ("crawl_cdc", WC.q_crawl_cdc),
    ):
        t0 = time.perf_counter()
        try:
            n = fn(sf_like).count()
        except Exception as ex:  # one failing leg must not kill the bench
            out[f"{name}_error"] = repr(ex)[:300]
            continue
        out[name] = round(time.perf_counter() - t0, 3)
        out[f"{name}_rows"] = n
    return out


def run_tokenizer_legs() -> dict:
    """BPE tokenizer training + learned-vocab encode at bench scale: the
    corpus streams once through the pretokenize-and-count combiner (the
    only corpus-sized pass — the merge loop runs over the vocabulary-
    bounded histogram), then the trained rank table is broadcast and the
    corpus re-encoded by an actor pool.  Both legs run on the replicated
    2.4M-page corpus."""
    from lightrag_ray.extras import bpe_train as BT

    sf_like = synth_replicated_documents()
    out = {}
    for name, fn in (
        ("bpe_train", lambda sf: BT.q_bpe_merges(sf, n_merges=200)),
        ("bpe_encode_stats", lambda sf: BT.q_bpe_encode_stats(sf, n_merges=200)),
    ):
        t0 = time.perf_counter()
        try:
            res = fn(sf_like)
            n = res.num_rows if hasattr(res, "num_rows") else res.count()
        except Exception as ex:  # one failing leg must not kill the bench
            out[f"{name}_error"] = repr(ex)[:300]
            continue
        out[name] = round(time.perf_counter() - t0, 3)
        out[f"{name}_rows"] = n
    return out


def run_linkgraph_leg() -> dict:
    """Fixed-point PageRank over a link graph at bench scale: the node
    space is the replicated corpus's doc-id range (2.4M at the default
    REPLICATE), edges come through the REAL path — anchor-html synthesis →
    regex href extraction → (src, tgt) — then 5 power-iteration rounds of
    two bounded-bucket exchanges each over the ~5.4M-edge graph."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from lightrag_ray.extras import linkgraph as LG

    n = pq.read_metadata(os.path.join(SF_DIR, "documents.parquet")).num_rows
    n *= REPLICATE

    def to_doc_ids(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("id"), np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64())})

    out = {}
    t0 = time.perf_counter()
    try:
        nodes = rd.range(n).map_batches(
            to_doc_ids, batch_format="pyarrow", zero_copy_batch=True
        )
        edges = nodes.map_batches(
            lambda b: LG._synth_anchor_html(b, n),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).map_batches(
            LG.extract_links, batch_format="pyarrow", zero_copy_batch=True
        )
        rows = LG.pagerank_ds(nodes, edges, n).count()
    except Exception as ex:  # one failing leg must not kill the bench
        return {"pagerank_error": repr(ex)[:300]}
    out["pagerank"] = round(time.perf_counter() - t0, 3)
    out["pagerank_rows"] = rows

    t0 = time.perf_counter()
    try:
        edges = nodes.map_batches(
            lambda b: LG._synth_anchor_html(b, n),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).map_batches(
            LG.extract_links, batch_format="pyarrow", zero_copy_batch=True
        )
        rows = LG.kcore_ds(edges).count()
    except Exception as ex:
        out["kcore_error"] = repr(ex)[:300]
        return out
    out["kcore"] = round(time.perf_counter() - t0, 3)
    out["kcore_rows"] = rows

    t0 = time.perf_counter()
    try:
        edges = nodes.map_batches(
            lambda b: LG._synth_anchor_html(b, n),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).map_batches(
            LG.extract_links, batch_format="pyarrow", zero_copy_batch=True
        )
        triads = nodes.map_batches(
            lambda b: LG._triad_edges(b, n),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        rows = LG.triangle_counts_ds(nodes, edges.union(triads)).count()
    except Exception as ex:
        out["triangles_error"] = repr(ex)[:300]
        return out
    out["triangles"] = round(time.perf_counter() - t0, 3)
    out["triangles_rows"] = rows

    t0 = time.perf_counter()
    try:
        pages = nodes.map_batches(
            lambda b: LG._synth_anchor_html(b, n),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        rows = LG.anchor_text_top_ds(pages).count()
    except Exception as ex:
        out["anchor_text_top_error"] = repr(ex)[:300]
        return out
    out["anchor_text_top"] = round(time.perf_counter() - t0, 3)
    out["anchor_text_top_rows"] = rows

    t0 = time.perf_counter()
    try:
        edges = nodes.map_batches(
            lambda b: LG._synth_anchor_html(b, n),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).map_batches(
            LG.extract_links, batch_format="pyarrow", zero_copy_batch=True
        )
        rows = LG.hits_ds(nodes, edges).count()
    except Exception as ex:
        out["hits_error"] = repr(ex)[:300]
        return out
    out["hits"] = round(time.perf_counter() - t0, 3)
    out["hits_rows"] = rows

    t0 = time.perf_counter()
    try:
        edges = nodes.map_batches(
            lambda b: LG._synth_anchor_html(b, n),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).map_batches(
            LG.extract_links, batch_format="pyarrow", zero_copy_batch=True
        )
        rows = LG.lpa_labels_ds(nodes, edges).count()
    except Exception as ex:
        out["lpa_error"] = repr(ex)[:300]
        return out
    out["lpa"] = round(time.perf_counter() - t0, 3)
    out["lpa_rows"] = rows

    # seeded retrieval primitives: same deterministic seed rule as the
    # catalog queries (doc_id % 101 == 3 → ~n/101 seeds)
    seeds = np.arange(3, n, 101, dtype=np.int64)
    t0 = time.perf_counter()
    try:
        edges = nodes.map_batches(
            lambda b: LG._synth_anchor_html(b, n),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).map_batches(
            LG.extract_links, batch_format="pyarrow", zero_copy_batch=True
        )
        rows = LG.ppr_ds(nodes, edges, seeds).count()
    except Exception as ex:
        out["ppr_error"] = repr(ex)[:300]
        return out
    out["ppr"] = round(time.perf_counter() - t0, 3)
    out["ppr_rows"] = rows

    t0 = time.perf_counter()
    try:
        edges = nodes.map_batches(
            lambda b: LG._synth_anchor_html(b, n),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).map_batches(
            LG.extract_links, batch_format="pyarrow", zero_copy_batch=True
        )
        rows = LG.bfs_hops_ds(edges, seeds).count()
    except Exception as ex:
        out["bfs_hops_error"] = repr(ex)[:300]
        return out
    out["bfs_hops"] = round(time.perf_counter() - t0, 3)
    out["bfs_hops_rows"] = rows
    return out


def _latency_stub_model_fn(user_prompt, system_prompt, history):
    """Offline stub model with a fixed 10 ms simulated call latency — the
    envelope probe for the LLM arm.  The latency makes extraction
    model-call-bound (the reference's real bottleneck), so throughput should
    track calls-in-flight = extractor actors × llm_max_async."""
    import time as _t

    _t.sleep(0.01)
    from lightrag_ray.stages.llm_extractor import offline_stub_model_fn

    return offline_stub_model_fn(user_prompt, system_prompt, history)


def run_llm_legs(eff_cpus: float | None = None) -> dict:
    """LLM-arm throughput envelope (round-4 VERDICT next #5): build_kg with
    ``extractor="llm"`` + the fixed-latency offline stub over an
    unreplicated pages corpus, at two calls-in-flight settings.  The ratio
    between them shows the actor pool saturating when extraction is
    2-calls-per-chunk bound (async=1 serializes each actor; async=8 keeps 8
    calls in flight per actor)."""
    import glob as _glob

    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.pipelines.kg_build import build_kg
    from lightrag_ray.sources.pages import synth_pages_from_documents

    pages_dir = os.path.join(WORK, "pages-llm")
    files = synth_pages_from_documents(SF_DIR, pages_dir, num_files=8)
    n_pages = sum(
        __import__("pyarrow.parquet", fromlist=["x"]).read_metadata(f).num_rows
        for f in files
    )
    sized = NUM_CPUS if eff_cpus is None else max(3, min(NUM_CPUS, math.ceil(eff_cpus)))
    chunker_pool = max(1, sized // 8)
    extractor_pool = max(2, sized - 2 - chunker_pool)
    out: dict = {"llm_n_pages": n_pages, "llm_extractor_pool": extractor_pool}
    for max_async in (1, 8):
        cfg = PipelineConfig.autoscaled(
            cluster_cpus=sized,
            chunker_concurrency=chunker_pool,
            extractor_concurrency=extractor_pool,
            chunker_batch_size=512,
            extractor_batch_size=512,
            merge_batch_size=524288,
            write_chunks_table=False,
            concurrent_reduces=False,
            extractor="llm",
            extractor_options={"model_fn": _latency_stub_model_fn},
            llm_max_async=max_async,
            max_gleaning=1,  # 2 calls per chunk: extract + one gleaning round
        )
        build_dir = os.path.join(WORK, f"build-llm-async{max_async}")
        shutil.rmtree(build_dir, ignore_errors=True)
        t0 = time.perf_counter()
        try:
            build_kg(files, build_dir, cfg, num_partitions=1, resume=False)
        except Exception as ex:  # one failing leg must not kill the bench
            out[f"kg_build_llm_async{max_async}_error"] = repr(ex)[:300]
            continue
        wall = time.perf_counter() - t0
        out[f"kg_build_llm_async{max_async}"] = round(wall, 3)
        out[f"kg_build_llm_async{max_async}_docs_per_sec"] = round(
            n_pages / wall, 1
        )
    return out


def run_query_legs(headline: dict, n_queries: int = 64) -> dict:
    """Query-path throughput against the headline build's graph (round-4
    VERDICT next #6): one engine build (node+edge VDB embedding, the
    persistent-store analogue), then ``n_queries`` hybrid retrievals
    (keywords → entity/relation vector top-k → 1-hop context assembly).
    Retrieval uses the guarded broadcast fetches — no driver
    materialization beyond the ≤top-k hit sets."""
    from lightrag_ray.pipelines.query_path import KGQueryEngine

    nodes_dir, edges_dir = headline.get("nodes_dir"), headline.get("edges_dir")
    if not nodes_dir:
        return {}
    out: dict = {}
    t0 = time.perf_counter()
    engine = KGQueryEngine(nodes_dir, edges_dir)
    out["query_engine_setup"] = round(time.perf_counter() - t0, 3)
    import pyarrow.parquet as pq

    sample = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["text"]
    ).column("text")[:n_queries].to_pylist()
    queries = [" ".join((t or "").split()[:8]) for t in sample]
    t0 = time.perf_counter()
    n_hits = 0
    for q in queries[: max(8, n_queries // 8)]:  # sequential arm: a sample
        ctx = engine.query(q, mode="hybrid")
        n_hits += len(ctx.entities) + len(ctx.relations)
    wall = time.perf_counter() - t0
    n_seq = max(8, n_queries // 8)
    out["query_hybrid"] = round(wall, 3)
    out["query_hybrid_per_sec"] = round(n_seq / wall, 2)
    out["query_hybrid_hits"] = n_hits
    # batched arm: the full batch through ONE execution set (parity with the
    # sequential path is pinned by tests/test_query_path.py)
    t0 = time.perf_counter()
    ctxs = engine.query_batch(queries, mode="hybrid")
    wall = time.perf_counter() - t0
    out["query_hybrid_batch"] = round(wall, 3)
    out["query_hybrid_batch_per_sec"] = round(len(queries) / wall, 2)
    out["query_hybrid_batch_hits"] = sum(
        len(c.entities) + len(c.relations) for c in ctxs
    )
    return out


def run_queries() -> dict:
    from lightrag_ray.extras import catalog as X
    from lightrag_ray.pipelines import queries as Q

    out = {}
    cat = {**Q.queries(), **X.queries()}
    for name in TIMED_QUERIES:
        t0 = time.perf_counter()
        ds = cat[name](SF_DIR)
        ds.to_pandas()  # consume
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    import faulthandler

    # if a leg ever wedges, dump every thread's stack to stderr every 10
    # minutes so the hang site is in the log
    faulthandler.dump_traceback_later(600, repeat=True, file=sys.stderr)

    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from lightrag_ray.probe import measure_effective_cpus

    eff = measure_effective_cpus(NUM_CPUS)
    _progress("headline")
    headline = run_headline(eff)
    # scaling legs compare ONLY the headline build; skip the incremental +
    # query legs there so a 4-CPU leg doesn't pay an hour of extras
    headline_only = os.environ.get("BENCH_HEADLINE_ONLY") == "1"

    def leg(name, thunk, empty):
        if headline_only:
            return empty
        _progress(f"start {name}")
        out = thunk()
        _progress(f"done {name}")
        return out

    incr = leg(
        "incremental",
        lambda: run_incremental(eff),
        {"kg_update_sec": None, "n_delta_pages": 0, "delta_docs_per_sec": None},
    )
    qtimes = leg("queries", run_queries, {})
    dedup_legs = leg("dedup", run_dedup_legs, {})
    webq_legs = leg("webquality", run_webquality_legs, {})
    webcrawl_legs = leg("webcrawl", run_webcrawl_legs, {})
    linkgraph_legs = leg("linkgraph", run_linkgraph_leg, {})
    tokenizer_legs = leg("tokenizer", run_tokenizer_legs, {})
    llm_legs = leg("llm", lambda: run_llm_legs(eff), {})
    query_legs = leg("query_path", lambda: run_query_legs(headline), {})
    ray.shutdown()

    print(
        json.dumps(
            {
                "metric": "kg_construction_wall_seconds",
                "value": headline["kg_build_sec"],
                "unit": "sec",
                "queries": {
                    "kg_build": headline["kg_build_sec"],
                    "kg_update_10pct": incr["kg_update_sec"],
                    **qtimes,
                    **{
                        k: v
                        for k, v in dedup_legs.items()
                        if not k.endswith(
                            ("_rows", "_cc_iters", "_error", "_ratio")
                        )
                    },
                    **{
                        k: v
                        for k, v in webq_legs.items()
                        if not k.endswith(("_rows", "_error"))
                    },
                    **{
                        k: v
                        for k, v in webcrawl_legs.items()
                        if not k.endswith(("_rows", "_error"))
                    },
                    **{
                        k: v
                        for k, v in linkgraph_legs.items()
                        if not k.endswith(("_rows", "_error"))
                    },
                    **{
                        k: v
                        for k, v in tokenizer_legs.items()
                        if not k.endswith(("_rows", "_error"))
                    },
                    **{
                        k: v
                        for k, v in llm_legs.items()
                        if k.startswith("kg_build_llm_async")
                        and not k.endswith(("_error", "_docs_per_sec"))
                    },
                    **{
                        k: v
                        for k, v in query_legs.items()
                        if k in ("query_hybrid", "query_hybrid_batch",
                                 "query_engine_setup")
                    },
                },
                "llm_legs": llm_legs,
                "query_legs": query_legs,
                "linkgraph_legs": linkgraph_legs,
                "tokenizer_legs": tokenizer_legs,
                "dedup_legs": dedup_legs,
                "webquality_legs": webq_legs,
                "webcrawl_legs": webcrawl_legs,
                "sf": os.path.basename(os.path.normpath(SF_DIR)),
                "num_cpus": NUM_CPUS,
                "effective_cpus": round(eff, 1),
                "sized_cpus": headline["sized_cpus"],
                "docs_per_sec": headline["docs_per_sec"],
                "delta_docs_per_sec": incr["delta_docs_per_sec"],
                "n_delta_pages": incr["n_delta_pages"],
                "n_pages": headline["n_pages"],
                "n_nodes": headline["n_nodes"],
                "n_edges": headline["n_edges"],
            }
        )
    )


def scaling() -> None:
    """Same input, fresh processes at N and 4N CPUs (the sandbox proxy for
    the north rule's N vs 4N cluster sizes).

    Legs default to 4 and 16 vCPUs (override with $BENCH_SCALE_LO /
    $BENCH_SCALE_HI): the current sandbox host advertises 32 vCPUs but
    sustains only ~12-18 effective cores under load (shared tenancy /
    burstable throttling — see BASELINE.md), so a 32-wide leg measures the
    host's throttle, not the engine's scaling.  Both legs stay under the
    effective-core ceiling; the ratio is still 4×."""
    lo_n = int(os.environ.get("BENCH_SCALE_LO", "4"))
    hi_n = int(os.environ.get("BENCH_SCALE_HI", str(4 * lo_n)))
    # Scaling legs default to the 2.4M-page corpus (REPLICATE=480, the
    # headline corpus): shorter legs hit the fixed-overhead Amdahl floor
    # (~18 s of session startup + corpus open on a 55 s 16-CPU leg →
    # measured 0.67 at 600k pages vs 0.82-1.04 at 2.4M across rounds 4-5).
    # The remaining run-to-run spread is the burstable host's credit curve,
    # attributable via the per-leg effective_cpus the output records.
    # Override with $BENCH_SCALE_REPLICATE.
    scale_rep = os.environ.get("BENCH_SCALE_REPLICATE", "480")

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_HEADLINE_ONLY="1",
                   BENCH_REPLICATE=scale_rep)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    run(lo_n)  # warm-up pass: page cache + corpus synthesis, untimed
    lo = run(lo_n)
    hi = run(hi_n)
    t_lo, t_hi = lo["value"], hi["value"]
    eff = (t_lo / t_hi) / (hi_n / lo_n)
    print(
        json.dumps(
            {
                f"sec_{lo_n}": t_lo,
                f"sec_{hi_n}": t_hi,
                f"docs_per_sec_{lo_n}": lo["docs_per_sec"],
                f"docs_per_sec_{hi_n}": hi["docs_per_sec"],
                "cpus": [lo_n, hi_n],
                "scaling_efficiency": round(eff, 3),
                "n_pages": lo["n_pages"],
                # per-leg host state, for attributing a bad ratio to the
                # burstable host's credit curve vs the engine
                "effective_cpus": [lo.get("effective_cpus"),
                                   hi.get("effective_cpus")],
                "sized_cpus": [lo.get("sized_cpus"), hi.get("sized_cpus")],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
