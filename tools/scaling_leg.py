"""Run ONE scaling leg (fresh JVM) and append the record to
SCALING_SAMPLES.jsonl. Companion to scaling_sampler.py for environments
where a long-lived detached sampler is not possible — the caller
interleaves legs (8, 32, 8, 32, ...) across invocations, which preserves
the same same-noise-window property as the in-process sampler.

Usage: python tools/scaling_leg.py <cores> <n_docs> [stage_bisect]

Cluster-analog resourcing:
- heap FLAT at 20 g per JVM regardless of core count. The round-2 plan of
  2.5 g/core ("4N executors bring 4N memory") was measured to be the wrong
  analog: an 80 g single-JVM heap makes the aggregate-heavy annotations
  plan ~4x SLOWER at BOTH 8 and 32 cores (fresh-JVM interleaved matrix,
  SCALING.json r3: 8c 26.9 s@20g vs 117.9 s@80g; 32c 40.4 s@20g vs
  162.8 s@80g) — oversized execution memory grows hash aggregates into
  tens-of-GB random-access working sets instead of spilling sequentially
  to tmpfs. Real clusters hold memory-per-core constant by adding modest
  JVMs (4N executors x ~20 g), never by inflating one JVM's heap to 80 g.
- shuffle + checkpoint on tmpfs (SPARK_GRAFT_SCALE_TMPFS=1, default): a 4N
  cluster brings 4N local disks; the sandbox's single 460 MB/s virtual disk
  is not the cluster analog
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/SCALING_SAMPLES.jsonl"


def main() -> None:
    cores = sys.argv[1]
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 400000
    from pubmedkb_web_spark.session import build_session
    from pubmedkb_web_spark.pipeline import runner

    tmpfs = os.environ.get("SPARK_GRAFT_SCALE_TMPFS", "1") == "1"
    base = "/dev/shm/spark_graft_scale" if tmpfs else None
    extra = {
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.files.openCostInBytes": "512k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
    }
    if base:
        os.makedirs(base, exist_ok=True)
        extra["spark.local.dir"] = os.path.join(base, "local")
    spark = build_session(
        cores=cores,
        shuffle_partitions=4 * int(cores),
        driver_memory="20g",
        extra_conf=extra,
    )
    out = tempfile.mkdtemp(dir=base)
    t0 = time.time()
    tables = runner.run_kg_pipeline(spark, out, n_docs=n_docs, resume=False)
    n = tables["triples"].count()
    dt = time.time() - t0
    stages = {name: r.seconds for name, r in tables["_pipeline"].results.items()}
    rec = {
        "cores": int(cores),
        "n_docs": n_docs,
        "sec": round(dt, 1),
        "triples": n,
        "tps": round(n / dt, 1),
        "tmpfs": tmpfs,
        "heap_g": 20,
        "stages": stages,
        "ts": round(time.time(), 1),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
