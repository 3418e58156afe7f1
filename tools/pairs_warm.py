"""Warm-vs-cold decomposition of the mention-pairs branch (round-5 #3).

tools/pairs_probe.py adjudicated the PAIRS_MATRIX core-insensitivity:
the executed join is SortMergeJoin at every core count (NOT an AQE
broadcast conversion — the 64 MB threshold never fires here), and the
constant ~4-7 s is per-JVM FIRST-RUN cost: whole-stage-codegen compile +
shuffle-machinery spin-up, identical at 2 and 8 cores. Re-running the
identical plan in the same JVM drops 9.57→3.81→2.06 s at 8 cores and
13.62→7.83 s at 2 cores. This tool records the clean warm numbers for
the FULL mention_pairs relation (self-join + sentence join), cold and
warm, so the scaling attribution is pinned with the production plan:

  eff_cold  = t2_cold / (4 * t8_cold)   — what ANNOT_BISECT measured (0.45)
  eff_warm  = t2_warm / (4 * t8_warm)   — the distributed work itself

At 100 TB the pairs stage runs for hours in a warmed executor fleet;
the cold component is a per-JVM constant (compile once, run all day),
so eff_warm is the number that predicts cluster behavior.

Usage: python tools/pairs_warm.py <cores> [n_docs] [reps]
Appends one JSON line to PAIRS_WARM.jsonl. Interleave core counts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/PAIRS_WARM.jsonl"


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_600_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    shuf = 4 * cores

    from pubmedkb_web_spark.session import build_session
    from pubmedkb_web_spark.pipeline import extractors, runner

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
    up = os.path.join(base, f"up_{n_docs}_{runner.CODE_FINGERPRINT[:12]}")
    mentions = spark.read.parquet(os.path.join(up, "mentions"))
    sentences = spark.read.parquet(os.path.join(up, "sentences"))

    times = []
    rows = None
    for _ in range(reps):
        t0 = time.time()
        rows = extractors.mention_pairs(mentions, sentences).count()
        times.append(round(time.time() - t0, 2))

    rec = {
        "cores": cores,
        "n_docs": n_docs,
        "pair_rows": rows,
        "cold": times[0],
        "warm": min(times[1:]) if len(times) > 1 else None,
        "all": times,
        "ts": round(time.time(), 1),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
