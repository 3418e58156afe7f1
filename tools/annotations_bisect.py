"""Bisect the annotations stage at a given corpus size and core count.

Round-2 SCALING.json left one in-engine anti-scaler unexplained: the
annotations stage ran ~2.4x slower at 32 threads at 400k+ docs. The 200k
bisect showed every component flat 8->32, implicating write volume +
concurrent spill. This tool separates the components at ANY size:

  compute   extract_all(...).count()        — no wide write
  write     default parquet (snappy)        — the stage's real commit
  write_z   zstd + repartition(cores)       — fewer, larger, smaller files

The upstream tables (source/sentences/mentions) are built ONCE per
n_docs via the checkpointed pipeline into a shared tmpfs dir and read
back by every invocation — so an 8-core and a 32-core bisect measure the
identical input. Interleave invocations (8, 32, 8, 32) for noise parity.

Usage: python tools/annotations_bisect.py <cores> [n_docs]
Appends one JSON line to ANNOT_BISECT.jsonl.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/ANNOT_BISECT.jsonl"


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 400000
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
        shuffle_partitions=4 * cores,
        driver_memory="20g",  # flat heap — the r3 lesson; cross-core comparability
        extra_conf=extra,
    )

    # shared upstream (ONLY source -> sentences/mentions, not the full
    # pipeline): keyed by (n_docs, code fingerprint); the first invocation
    # builds it and later ones read the same bytes
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

    rec: dict = {"cores": cores, "n_docs": n_docs, "ts": round(time.time(), 1)}

    t0 = time.time()
    ann = extractors.extract_all(mentions, sentences)
    n = ann.count()
    rec["compute_count_s"] = round(time.time() - t0, 1)
    rec["ann_rows"] = n

    # sub-bisect: the corpus contingency aggregation alone (the odds_ratio
    # branch input — includes the salted pair-count shuffle and the two
    # name-count broadcasts, excludes the pair explode and the write)
    t0 = time.time()
    extractors.pair_contingency(mentions, sentences).count()
    rec["contingency_s"] = round(time.time() - t0, 1)

    # sub-bisect: the mention-pair relation alone (self-join + sentence join)
    t0 = time.time()
    extractors.mention_pairs(mentions, sentences).count()
    rec["pairs_s"] = round(time.time() - t0, 1)

    w1 = tempfile.mkdtemp(dir=base)
    t0 = time.time()
    extractors.extract_all(mentions, sentences).write.mode("overwrite").parquet(w1)
    rec["write_snappy_s"] = round(time.time() - t0, 1)
    rec["snappy_files"] = sum(
        1 for f in os.listdir(w1) if f.endswith(".parquet")
    )
    rec["snappy_mb"] = round(
        sum(
            os.path.getsize(os.path.join(w1, f))
            for f in os.listdir(w1)
            if f.endswith(".parquet")
        )
        / 1e6,
        1,
    )
    shutil.rmtree(w1, ignore_errors=True)

    w2 = tempfile.mkdtemp(dir=base)
    t0 = time.time()
    (
        extractors.extract_all(mentions, sentences)
        .repartition(cores)
        .write.mode("overwrite")
        .option("compression", "zstd")
        .parquet(w2)
    )
    rec["write_zstd_repart_s"] = round(time.time() - t0, 1)
    rec["zstd_mb"] = round(
        sum(
            os.path.getsize(os.path.join(w2, f))
            for f in os.listdir(w2)
            if f.endswith(".parquet")
        )
        / 1e6,
        1,
    )
    shutil.rmtree(w2, ignore_errors=True)

    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
