"""Bisect the triples stage at 3.2M docs in local-cluster executor mode.

The round-6 calm-window cluster pairs (PAIR_HUNT.jsonl, steal ~0.0) put
the whole-pipeline 2-vs-8-core efficiency at 0.769, and the per-stage
table pins the worst big-stage scaler: triples at 0.62 (141.0 s on
local-cluster[1,2,10g] vs 56.9 s on local-cluster[4,2,10g]; ideal 35.3).
The stage is scan(annotations) -> project -> two broadcast joins against
the dictionary-sized canon map -> dropDuplicates -> zstd parquet write.
This tool separates those components so the 0.62 gets a cause, not a
guess:

  project   to_triples + rewrite_triples, count()   — scan + broadcast joins
  dedup     + dropDuplicates, count()               — adds the one shuffle
  write     + parquet write (the real stage shape)  — adds the zstd sink

Upstream (source -> ... -> annotations, canonical_map) is built ONCE per
n_docs into a shared tmpfs checkpoint dir via the normal resumable
pipeline and re-read by every invocation — an interleaved (2, 8, 2, 8)
sequence measures identical input bytes.

Usage: python tools/triples_bisect.py <cores> [n_docs]
Env: SPARK_GRAFT_EXEC_CORES (default 2) as in tools/scaling_leg.py.
Appends one JSON line to TRIPLES_BISECT.jsonl.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

REPO = "/root/repo"
OUT = os.path.join(REPO, "TRIPLES_BISECT.jsonl")
BASE = "/dev/shm/spark_graft_tbisect"


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 3200000
    from pubmedkb_web_spark.session import build_session
    from pubmedkb_web_spark.pipeline import canonicalize, extractors, materialize, runner

    exec_cores = int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "2"))
    exec_mem_mb = int(os.environ.get("SPARK_GRAFT_EXEC_MEM_MB", "10240"))
    n_exec = max(1, cores // exec_cores)
    master = f"local-cluster[{n_exec},{exec_cores},{exec_mem_mb}]"
    os.makedirs(BASE, exist_ok=True)
    shuffle = max(4 * cores, n_docs // 12500)
    spark = build_session(
        cores=cores,
        master=master,
        shuffle_partitions=shuffle,
        driver_memory="4g",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "64m",
            "spark.sql.files.openCostInBytes": "512k",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
            "spark.executor.memory": f"{exec_mem_mb}m",
            "spark.executorEnv.PYTHONPATH": REPO,
            "spark.local.dir": os.path.join(BASE, "local"),
        },
    )

    # shared upstream checkpoint, built by whichever invocation runs first
    # (source gen is seed-deterministic, so every leg reads identical bytes)
    up = os.path.join(BASE, f"up_{n_docs}")
    runner.run_kg_pipeline(spark, up, n_docs=n_docs, resume=True)
    ann = spark.read.parquet(os.path.join(up, "annotations"))
    canon = spark.read.parquet(os.path.join(up, "canonical_map"))

    def projected():
        return canonicalize.rewrite_triples(extractors.to_triples(ann), canon)

    t0 = time.time()
    n_proj = projected().count()
    t_project = time.time() - t0

    t0 = time.time()
    n_dedup = materialize.dedup_triples(projected()).count()
    t_dedup = time.time() - t0

    scratch = os.path.join(BASE, f"scratch_{cores}")
    t0 = time.time()
    materialize.dedup_triples(projected()).write.mode("overwrite").parquet(scratch)
    t_write = time.time() - t0
    shutil.rmtree(scratch, ignore_errors=True)

    rec = {
        "cores": cores,
        "master": master,
        "n_docs": n_docs,
        "rows_projected": n_proj,
        "rows_dedup": n_dedup,
        "project_s": round(t_project, 1),
        "dedup_s": round(t_dedup, 1),
        "write_s": round(t_write, 1),
        "shuffle_partitions": shuffle,
        "ts": round(time.time(), 1),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
