"""A/B the hot-bucket cap's bucket-size pass: capped vs uncapped LSH.

Round-4 VERDICT "Next round" #4: lsh_candidate_pairs(max_bucket_size=K)
pays a groupBy + join on the band key even when no bucket exceeds K; the
r4 gate-scale slowdown (1.2 → 2.4 s) tracks that diff. This measures the
real overhead at corpus scale, in one JVM, interleaved A/B/A/B:

  A  uncapped  lsh_candidate_pairs(sigs)                  — pure clique join
  B  capped    lsh_candidate_pairs(sigs, max_bucket_size) — sizes pass + routing

on (1) an UNSKEWED corpus of n_docs fixture documents (no bucket ever
exceeds the cap — the overhead is pure waste here, the number that
decides the default) and (2) a skewed corpus with a 10k-identical-doc
hot cluster (where the cap is doing its job — the star fallback's win
shows up as B « A). Signatures are materialized to /dev/shm parquet
once and read back by both arms, so the A/B isolates the candidate-join
stage itself.

Decision rule from the verdict: if the unskewed overhead exceeds 20%,
fuse the size computation into the join via a window; under 20%, keep
the separate aggregation (AQE co-locates it) and record the number.

Usage: python tools/capcost_ab.py [n_docs] [cycles] [cap]
Appends one JSON line to CAPCOST_AB.json (summary) after printing
per-cycle samples.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/CAPCOST_AB.json"


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    from pyspark.sql import functions as F

    from pubmedkb_web_spark import fixtures
    from pubmedkb_web_spark.ops import dedup
    from pubmedkb_web_spark.session import build_session

    base = "/dev/shm/spark_graft_capcost"
    os.makedirs(base, exist_ok=True)
    spark = build_session(
        cores=8,
        shuffle_partitions=32,
        driver_memory="20g",
        extra_conf={"spark.local.dir": os.path.join(base, "local")},
    )

    def materialize_sigs(df, path: str):
        if not os.path.exists(path):
            sh = dedup.shingles(df, 3, id_col="doc_id", text_col="content")
            dedup.minhash_signatures(sh, 8, portable=False).write.parquet(path)
        return spark.read.parquet(path)

    # unskewed: the fixture corpus (distinct synthetic docs)
    flat = fixtures.ingest(fixtures.source_table(spark, n_docs)).select(
        "doc_id", "content"
    )
    sig_flat = materialize_sigs(flat, os.path.join(base, f"sig_flat_{n_docs}"))

    # skewed: same corpus + a 10k-identical hot cluster
    one = (
        fixtures.ingest(fixtures.source_table(spark, 1)).select("content").limit(1)
    )
    hot = (
        spark.range(10_000)
        .crossJoin(F.broadcast(one))
        .select((F.col("id") + 2 * n_docs).cast("string").alias("doc_id"), "content")
    )
    skew = flat.unionByName(hot)
    sig_skew = materialize_sigs(skew, os.path.join(base, f"sig_skew_{n_docs}"))

    def time_arm(sigs, use_cap: bool) -> tuple[float, int]:
        t0 = time.time()
        n = dedup.lsh_candidate_pairs(
            sigs, 4, 2, max_bucket_size=cap if use_cap else None
        ).count()
        return round(time.time() - t0, 2), n

    samples: dict[str, list[float]] = {}
    counts: dict[str, int] = {}
    for c in range(cycles):
        for corpus, sigs in (("flat", sig_flat), ("skew", sig_skew)):
            for arm, use_cap in (("uncapped", False), ("capped", True)):
                key = f"{corpus}_{arm}"
                dt, n = time_arm(sigs, use_cap)
                samples.setdefault(key, []).append(dt)
                counts[key] = n
                print(f"cycle {c} {key}: {dt}s, {n} pairs", flush=True)

    mins = {k: min(v) for k, v in samples.items()}
    flat_overhead = round(mins["flat_capped"] / mins["flat_uncapped"] - 1, 3)
    skew_speedup = round(mins["skew_uncapped"] / mins["skew_capped"], 2)
    report = {
        "n_docs": n_docs,
        "cap": cap,
        "cycles": cycles,
        "min_sec": mins,
        "pair_counts": counts,
        "flat_cap_overhead": flat_overhead,
        "skew_cap_speedup": skew_speedup,
        "samples": samples,
        "decision_rule": "fuse sizes into the join via a window if flat overhead > 0.20",
    }
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: report[k] for k in ("flat_cap_overhead", "skew_cap_speedup", "min_sec")}))
    spark.stop()
    shutil.rmtree(os.path.join(base, "local"), ignore_errors=True)


if __name__ == "__main__":
    main()
