"""Root-cause matrix for the mention-pairs branch's 2→8 scaling residual.

Round-4 ANNOT_BISECT at 1.6M docs decomposed the annotations stage into
contingency 0.66, write 0.76, and mention_pairs 0.45 — the pair branch is
the worst scaler and is NOT covered by the driver-phase/broadcast-build
story (that explains contingency, not this). This tool separates the
candidate fixed costs the bisect's single `pairs_s` number conflates:

  t_plan      analyzed+optimized plan construction (driver-only; pure
              fixed cost, identical at any core count)
  t_scan      mentions.count() + sentences.count() — raw parquet scan
              of the two inputs, no join
  t_selfjoin  the (doc_id, sent_idx) self-join WITHOUT the sentence
              join — isolates the pair explode + its exchange(s)
  t_full      extractors.mention_pairs(...).count() — the bisect leg
  t_trivial   spark.range(1e6).count() ×3 — per-job scheduling floor

In-engine share at level c = (t_full − t_plan − sched) and the scaling
verdict compares THAT, not the wall number: a branch whose 8-core wall
is half fixed driver cost reads as a 0.45 "efficiency" even when the
distributed work scales perfectly.

Reads the same shared upstream parquet as tools/annotations_bisect.py
(/dev/shm, keyed by n_docs + code fingerprint) so every invocation at
every core count measures identical bytes. Interleave invocations
(2, 8, 2, 8) for noise parity; each invocation is a fresh JVM.

Usage: python tools/pairs_matrix.py <cores> [n_docs] [shuffle_partitions]
Appends one JSON line to PAIRS_MATRIX.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/PAIRS_MATRIX.jsonl"


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_600_000
    shuf = int(sys.argv[3]) if len(sys.argv) > 3 else 4 * cores
    from pyspark.sql import functions as F

    from pubmedkb_web_spark.session import build_session
    from pubmedkb_web_spark.pipeline import extractors, runner

    base = "/dev/shm/spark_graft_bisect"
    os.makedirs(base, exist_ok=True)
    extra = {
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.files.openCostInBytes": "512k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
        "spark.local.dir": os.path.join(base, "local"),
    }
    spark = build_session(
        cores=cores,
        shuffle_partitions=shuf,
        driver_memory="20g",  # flat heap across levels — cross-core comparability
        extra_conf=extra,
    )

    from pubmedkb_web_spark import fixtures
    from pubmedkb_web_spark.pipeline import mentions as M

    up_dir = os.path.join(base, f"up_{n_docs}_{runner.CODE_FINGERPRINT[:12]}")
    s_path = os.path.join(up_dir, "sentences")
    m_path = os.path.join(up_dir, "mentions")
    if not (os.path.exists(s_path) and os.path.exists(m_path)):
        src = fixtures.ingest(fixtures.source_table(spark, n_docs))
        s_df, m_df = M.build_mentions(src, fixtures.entity_dict_df(spark).cache())
        s_df.write.mode("overwrite").parquet(s_path)
        m_df.write.mode("overwrite").parquet(m_path)
    sentences = spark.read.parquet(s_path)
    mentions = spark.read.parquet(m_path)

    rec: dict = {
        "cores": cores,
        "shuffle_partitions": shuf,
        "n_docs": n_docs,
        "ts": round(time.time(), 1),
    }

    # per-job scheduling floor (3 trivial jobs, min)
    floors = []
    for _ in range(3):
        t0 = time.time()
        spark.range(1_000_000).count()
        floors.append(time.time() - t0)
    rec["t_trivial"] = round(min(floors), 2)

    # driver-only plan construction for the full pairs plan
    t0 = time.time()
    pairs_df = extractors.mention_pairs(mentions, sentences)
    pairs_df._jdf.queryExecution().optimizedPlan()
    rec["t_plan"] = round(time.time() - t0, 2)

    t0 = time.time()
    nm = mentions.count()
    ns = sentences.count()
    rec["t_scan"] = round(time.time() - t0, 2)
    rec["mention_rows"] = nm
    rec["sentence_rows"] = ns

    # self-join only: the pair explode without the sentence join
    m = mentions.select("doc_id", "sent_idx", "mention_idx", "offset")
    m1 = m.select(
        "doc_id", "sent_idx", F.col("mention_idx").alias("h"), F.col("offset").alias("ho")
    )
    m2 = m.select(
        "doc_id", "sent_idx", F.col("mention_idx").alias("t"), F.col("offset").alias("to")
    )
    t0 = time.time()
    npairs = (
        m1.join(m2, ["doc_id", "sent_idx"]).filter(F.col("ho") < F.col("to")).count()
    )
    rec["t_selfjoin"] = round(time.time() - t0, 2)
    rec["pair_rows"] = npairs

    t0 = time.time()
    extractors.mention_pairs(mentions, sentences).count()
    rec["t_full"] = round(time.time() - t0, 2)

    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
