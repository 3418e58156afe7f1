"""Benchmark: headline queries + KG-pipeline throughput.

Prints exactly ONE JSON line:
  {"metric": "e2e_sec", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "triples_per_sec": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_BENCH_DOCS (KG corpus size, default 4000),
     SPARK_GRAFT_BENCH_REPS (repetitions per query, default 2).

Noise methodology (round-2 VERDICT #5): this host shows up to 3.4x
wall-clock variance on byte-identical runs (co-tenant CPU steal —
SCALING.json host_noise_evidence), so single-shot per-query timings are
untrustworthy. Each query is timed SPARK_GRAFT_BENCH_REPS times in
*interleaved* order (the whole list runs, then runs again) and the
reported time is the per-query MIN — both repetitions of a query land in
different noise windows, and min filters additive interference. The JSON
carries "reps" and "method" so BENCH_r{N} records the protocol.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "4000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    import __spark_entry__ as E
    from pubmedkb_web_spark.pipeline import runner
    from pubmedkb_web_spark.session import build_session

    spark = build_session(
        app_name="bench", cores=cpus, shuffle_partitions=cpus, driver_memory="48g"
    )

    headline = [
        "rel_relevance_page",
        "spec_and_or",
        "tpch_pricing_summary",
        "top_revenue_orders",
        "rrf_fusion_orders",
        "odds_ratio_pairs",
        "cooccurrence_tokens",
        "sessionize_users",
        "bm25_docs",
        "minhash_signatures",
        "lsh_near_dup_pairs",
        "simhash_docs",
        "cosine_topk",
        "lang_id_docs",
        "quality_scores",
        "fingerprint_docs",
        "exact_dedup_docs",
        "mesh_bfs",
        # round-2 operators
        "disease_gene_blend",
        "glof_rollup",
        "varsum_clean",
        "qa_target_filter",
        "mesh_subgraph",
        "embed_text_docs",
        "journal_impact_meta",
        "paper_text_fetch",
        # round-3 operators
        "kg_extractor_slice",
        "gvd_stats",
        "variant_in_kb",
        "ann_cosine_lsh",
        # round-5 operators
        "ivf_cosine_topk",
        "user_sessions",
        # round-6 operators
        "repetition_docs",
        "gopher_filters",
        "pii_scrub",
        "c4_line_filters",
        "decontaminate_docs",
    ]
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    # round 6 merged some queries() entries to fit the driver's 50-gate cap;
    # the per-capability q_ functions remain, so headline names resolve
    # through queries() first, then the module attribute
    qs = E.queries()
    resolve = lambda n: qs.get(n) or getattr(E, f"q_{n}")  # noqa: E731
    times: dict[str, float] = {}
    for _rep in range(max(1, reps)):
        for name in headline:
            t0 = time.time()
            # count() drives the full plan without collecting wide rows
            resolve(name)(spark, sf_dir).count()
            dt = round(time.time() - t0, 3)
            times[name] = min(times.get(name, dt), dt)
    total = sum(times.values())

    # KG pipeline throughput: fresh build per rep (no resume), triples/sec.
    # Same min-over-reps protocol as the per-query legs (round-4 VERDICT
    # "What's missing" #1: the single-shot kg leg was the one headline
    # number the noise methodology did not protect).
    kg_dt = None
    n_triples = 0
    for _rep in range(max(1, reps)):
        out_dir = tempfile.mkdtemp(prefix="bench_kg_")
        try:
            t0 = time.time()
            tables = runner.run_kg_pipeline(spark, out_dir, n_docs=n_docs, resume=False)
            n_triples = tables["triples"].count()
            dt = round(time.time() - t0, 3)
            kg_dt = dt if kg_dt is None else min(kg_dt, dt)
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
    times["kg_pipeline"] = kg_dt
    total += kg_dt

    print(
        json.dumps(
            {
                "metric": "e2e_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "kg_docs": n_docs,
                "kg_triples": n_triples,
                "triples_per_sec": round(n_triples / kg_dt, 2) if kg_dt else None,
                "cpus": cpus,
                "reps": reps,
                "method": "per-query min over interleaved repetitions; "
                "kg_pipeline min over fresh-build repetitions "
                "(host co-tenant noise up to 3.4x on identical runs; "
                "see SCALING.json host_noise_evidence)",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
