"""Adjudicate WHY the mention-pair self-join is core-count-insensitive.

PAIRS_MATRIX.jsonl (1.6M docs) shows t_selfjoin ~13.5 s at BOTH 2 and 8
cores — a serial bottleneck, not driver fixed cost. Prime suspect: the
session's 64 MB autoBroadcastJoinThreshold. The self-join sides are the
corpus-sized mentions table pruned to 4 int/long columns; their actual
shuffle bytes (~9.3M thin rows, lz4) can land under 64 MB, at which
point AQE converts the shuffle join into a BroadcastHashJoin whose
hashed-relation build is SINGLE-THREADED on the driver — constant wall
time at any core count, and at 100 TB an outright OOM (the build side
scales with the corpus; a broadcast threshold is only safe for true
dimension tables).

Arms (one JVM per invocation, fresh; interleave core counts across
invocations for noise parity):

  default        engine session as-is (64 MB threshold, AQE on)
  merge_hint     both joins hinted MERGE (sort-merge; never broadcast)
  shuffle_hash   both joins hinted SHUFFLE_HASH (per-partition hash
                 build — parallel build, no sort; the pair-explode's
                 groups are tiny so no per-partition build risk)

Each arm records wall seconds and the join node names extracted from
the EXECUTED plan (post-AQE), so the broadcast conversion is observed,
not inferred.

Usage: python tools/pairs_probe.py <cores> [n_docs]
Appends one JSON line per arm to PAIRS_PROBE.jsonl.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/PAIRS_PROBE.jsonl"


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_600_000
    shuf = 4 * cores
    from pyspark.sql import functions as F

    from pubmedkb_web_spark.session import build_session
    from pubmedkb_web_spark.pipeline import runner

    base = "/dev/shm/spark_graft_bisect"
    extra = {
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.files.openCostInBytes": "512k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
        "spark.local.dir": os.path.join(base, "local"),
    }
    spark = build_session(
        cores=cores, shuffle_partitions=shuf, driver_memory="20g", extra_conf=extra
    )

    up_dir = os.path.join(base, f"up_{n_docs}_{runner.CODE_FINGERPRINT[:12]}")
    mentions = spark.read.parquet(os.path.join(up_dir, "mentions"))

    m = mentions.select("doc_id", "sent_idx", "mention_idx", "offset")
    m1 = m.select(
        "doc_id", "sent_idx", F.col("mention_idx").alias("h"), F.col("offset").alias("ho")
    )
    m2 = m.select(
        "doc_id", "sent_idx", F.col("mention_idx").alias("t"), F.col("offset").alias("to")
    )

    def joined(hint: str | None):
        left, right = m1, m2
        if hint:
            left, right = m1.hint(hint), m2.hint(hint)
        return left.join(right, ["doc_id", "sent_idx"]).filter(F.col("ho") < F.col("to"))

    def join_nodes(df) -> list[str]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        return sorted(set(re.findall(r"(\w*(?:HashJoin|MergeJoin)\w*)", plan)))

    for arm, hint in (("default", None), ("merge_hint", "merge"), ("shuffle_hash", "shuffle_hash")):
        df = joined(hint)
        t0 = time.time()
        n = df.count()
        dt = round(time.time() - t0, 2)
        rec = {
            "cores": cores,
            "n_docs": n_docs,
            "arm": arm,
            "sec": dt,
            "pair_rows": n,
            "join_nodes": join_nodes(df),
            "ts": round(time.time(), 1),
        }
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
