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

REPO = "/root/repo"
OUT = "/root/repo/SCALING_SAMPLES.jsonl"


def main() -> None:
    cores = sys.argv[1]
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 400000
    from pubmedkb_web_spark.session import build_session
    from pubmedkb_web_spark.pipeline import runner

    tmpfs = os.environ.get("SPARK_GRAFT_SCALE_TMPFS", "1") == "1"
    base = "/dev/shm/spark_graft_scale" if tmpfs else None
    # advisory sized for the corpus: 4m (the r2/r3 tuning for 200-400k
    # docs) fragments every post-shuffle stage into thousands of tasks
    # once the initial shuffle count is data-sized; 64m (Spark's default)
    # lets AQE coalesce small stages while the big window sorts keep
    # bounded partitions. Override with SPARK_GRAFT_ADVISORY.
    advisory = os.environ.get("SPARK_GRAFT_ADVISORY", "64m" if n_docs >= 1000000 else "4m")
    extra = {
        "spark.sql.files.maxPartitionBytes": "64m" if n_docs >= 1000000 else "4m",
        "spark.sql.files.openCostInBytes": "512k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": advisory,
    }
    if base:
        os.makedirs(base, exist_ok=True)
        extra["spark.local.dir"] = os.path.join(base, "local")
    # shuffle partitions sized by DATA, not cores: a fixed 4x-cores count
    # lets per-partition sort volume grow with the corpus until the
    # mentions window sort spills (measured at 3.2M docs: mentions 391 s
    # at 8 cores vs 88-97 s at 1.6M — 4x time for 2x data). A cluster
    # sets the initial count high and lets AQE coalesce to the advisory
    # size; override with SPARK_GRAFT_SHUFFLE.
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "0")) or max(
        4 * int(cores), n_docs // 12500
    )
    # default 20 g (flat across core counts — the r3-measured best for both
    # levels). SPARK_GRAFT_HEAP_G overrides it outright;
    # SPARK_GRAFT_HEAP_PER_CORE_G sizes it as cores x that value — the
    # per-core-constant-memory cluster analog (N and 4N executors each keep
    # the same memory PER CORE, so the low-core leg gets proportionally less
    # total heap instead of the flat analog's 4x-per-core advantage).
    per_core = os.environ.get("SPARK_GRAFT_HEAP_PER_CORE_G")
    if per_core:
        heap_g = max(2, round(int(cores) * float(per_core)))
    else:
        heap_g = int(os.environ.get("SPARK_GRAFT_HEAP_G", "20"))
    # SPARK_GRAFT_EXEC_MODE=cluster runs local-cluster[n_exec, cores_per_exec,
    # mem_mb] — SEPARATE executor JVMs, each with its own heap and Python
    # worker pool. This is the faithful "N vs 4N executors" analog the north
    # rule names: growing the cluster multiplies executor count while holding
    # PER-EXECUTOR memory constant, whereas the flat-20g single-JVM analog
    # hands the low-core leg a 4x per-core memory advantage (its tasks sort
    # in RAM while the high-core leg's spill). cores argv stays the TOTAL
    # core count; executors = cores / SPARK_GRAFT_EXEC_CORES (default 2).
    master = None
    if os.environ.get("SPARK_GRAFT_EXEC_MODE") == "cluster":
        exec_cores = int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "2"))
        exec_mem_mb = int(os.environ.get("SPARK_GRAFT_EXEC_MEM_MB", "10240"))
        n_exec = max(1, int(cores) // exec_cores)
        master = f"local-cluster[{n_exec},{exec_cores},{exec_mem_mb}]"
        extra["spark.executor.memory"] = f"{exec_mem_mb}m"
        # executor JVMs spawn their own Python workers, which don't inherit
        # the driver's sys.path — ship the package the --py-files way
        extra["spark.executorEnv.PYTHONPATH"] = REPO
        # driver no longer hosts executor state; a modest heap suffices
        heap_g = int(os.environ.get("SPARK_GRAFT_HEAP_G", "4"))
    spark = build_session(
        cores=cores,
        master=master,
        shuffle_partitions=shuffle,
        driver_memory=f"{heap_g}g",
        extra_conf=extra,
    )
    out = tempfile.mkdtemp(dir=base)
    t0 = time.time()
    tables = runner.run_kg_pipeline(spark, out, n_docs=n_docs, resume=False)
    n = tables["triples"].count()
    dt = time.time() - t0
    stages = {name: r.seconds for name, r in tables["_pipeline"].results.items()}
    stage_parts = {name: len(r.partitions) for name, r in tables["_pipeline"].results.items()}
    rec = {
        "cores": int(cores),
        "n_docs": n_docs,
        "sec": round(dt, 1),
        "triples": n,
        "tps": round(n / dt, 1),
        "tmpfs": tmpfs,
        "heap_g": heap_g,
        "master": master or f"local[{cores}]",
        "shuffle_partitions": shuffle,
        "advisory": advisory,
        "stages": stages,
        "stage_partitions": stage_parts,
        "ts": round(time.time(), 1),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
