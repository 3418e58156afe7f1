"""Codec A/B for the triples-stage write (follow-up to triples_bisect.py).

The bisect pinned the triples stage's 0.62 scaling on the WRITE increment
(zstd parquet encode+commit): 68.1 s at 2 cores vs 38.9 s at 8 — 0.44
efficiency for a fully parallel sink. Hypothesis: zstd's encode is
memory-bandwidth-bound, and this VM's ~17-effective-core overcommit
saturates bandwidth well before 8 task threads. Test: the same dedup+write
with zstd / snappy / lz4 at 2 and 8 cores over the shared bisect upstream.

Usage: python tools/triples_codec_ab.py <cores>
Appends JSON lines to TRIPLES_BISECT.jsonl (kind=codec_ab).
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
    from pubmedkb_web_spark.pipeline import canonicalize, extractors, materialize

    exec_cores = int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "2"))
    exec_mem_mb = int(os.environ.get("SPARK_GRAFT_EXEC_MEM_MB", "10240"))
    n_exec = max(1, cores // exec_cores)
    master = f"local-cluster[{n_exec},{exec_cores},{exec_mem_mb}]"
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
    up = os.path.join(BASE, f"up_{n_docs}")
    ann = spark.read.parquet(os.path.join(up, "annotations"))
    canon = spark.read.parquet(os.path.join(up, "canonical_map"))
    df = materialize.dedup_triples(
        canonicalize.rewrite_triples(extractors.to_triples(ann), canon)
    )

    sizes = {}
    times = {}
    for codec in ("zstd", "snappy", "lz4"):
        scratch = os.path.join(BASE, f"codec_{cores}_{codec}")
        spark.conf.set("spark.sql.parquet.compression.codec", codec)
        t0 = time.time()
        df.write.mode("overwrite").parquet(scratch)
        times[codec] = round(time.time() - t0, 1)
        b = 0
        for root, _d, fns in os.walk(scratch):
            for fn in fns:
                if fn.endswith(".parquet"):
                    b += os.path.getsize(os.path.join(root, fn))
        sizes[codec] = b
        shutil.rmtree(scratch, ignore_errors=True)

    rec = {
        "kind": "codec_ab",
        "cores": cores,
        "master": master,
        "n_docs": n_docs,
        "write_s": times,
        "bytes": sizes,
        "ts": round(time.time(), 1),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
