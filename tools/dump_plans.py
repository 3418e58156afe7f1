"""Dump .explain('formatted') for named declared queries to files.

Usage: python tools/dump_plans.py OUT_DIR SUFFIX [names...]
Writes OUT_DIR/<name>_<SUFFIX>.txt for each query (default: a fixed list
of the round-7 touched queries). SPARK_GRAFT_SF_DIR picks the data
(default sf0.1 — plan shape, not timing, is what matters here).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "embed_text_docs", "spec_and_or", "spec_pair", "rel_relevance_page",
    "cooccurrence_tokens", "odds_ratio_pairs", "qa_target_filter",
    "glof_rollup", "gvd_stats", "kg_extractor_slice", "mesh_bfs",
    "mesh_subgraph", "bm25_docs", "minhash_signatures", "simhash_docs",
    "lsh_near_dup_pairs", "repetition_docs", "cosine_topk",
]


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as E
    from pubmedkb_web_spark.session import build_session

    spark = build_session(
        app_name="dump_plans", cores=8, shuffle_partitions=8, driver_memory="12g"
    )
    qs = E.queries()
    resolve = lambda n: qs.get(n) or getattr(E, f"q_{n}")  # noqa: E731
    for name in names:
        try:
            df = resolve(name)(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as ex:  # noqa: BLE001
            plan = f"ERROR building plan: {type(ex).__name__}: {ex}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print("wrote", name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
