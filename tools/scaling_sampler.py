"""Long-horizon N-vs-4N scaling sampler.

The shared-host VM's wall-clock varies >3x between byte-identical runs
(neighbor noise), swamping the core-count signal in any single A/B pair.
This sampler interleaves fresh-JVM legs at local[8] and local[32] over a
long window and appends one JSON line per leg to SCALING_SAMPLES.jsonl;
the min per (n_docs, cores) level across the window estimates the calm-box
throughput. Interleaving (not blocking) guarantees both levels sample the
same noise distribution.

Usage: python tools/scaling_sampler.py [n_docs] [max_minutes]
Stop early: touch /tmp/scaling_sampler.stop
"""

import json
import os
import subprocess
import sys
import time

CHILD = r'''
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from pubmedkb_web_spark.session import build_session
from pubmedkb_web_spark.pipeline import runner
cores, n_docs = sys.argv[1], int(sys.argv[2])
# Cluster-analog resourcing (round-2 VERDICT confounders):
# - heap scales with cores (4N executors bring 4N memory): 2.5 g/core
# - shuffle + checkpoint on tmpfs when SPARK_GRAFT_SCALE_TMPFS=1 (a 4N
#   cluster brings 4N local disks; the sandbox's single 460 MB/s virtual
#   disk is not the cluster analog)
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
spark = build_session(cores=cores, shuffle_partitions=4 * int(cores),
    driver_memory=f"{int(cores) * 5 // 2}g", extra_conf=extra)
out = tempfile.mkdtemp(dir=base)
t0 = time.time()
tables = runner.run_kg_pipeline(spark, out, n_docs=n_docs, resume=False)
n = tables["triples"].count()
dt = time.time() - t0
stages = {name: r.seconds for name, r in tables["_pipeline"].results.items()}
print(json.dumps({"cores": int(cores), "n_docs": n_docs, "sec": round(dt, 1),
                  "triples": n, "tps": round(n / dt, 1), "tmpfs": tmpfs,
                  "heap_g": int(cores) * 5 // 2, "stages": stages}))
shutil.rmtree(out, ignore_errors=True)
spark.stop()
'''

STOP = "/tmp/scaling_sampler.stop"
OUT = "/root/repo/SCALING_SAMPLES.jsonl"


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 150000
    max_minutes = float(sys.argv[2]) if len(sys.argv) > 2 else 120
    deadline = time.time() + max_minutes * 60
    legs = ["8", "32"]
    i = 0
    while time.time() < deadline and not os.path.exists(STOP):
        c = legs[i % 2]
        i += 1
        try:
            p = subprocess.run(
                [sys.executable, "-c", CHILD, c, str(n_docs)],
                capture_output=True, text=True, timeout=1700,
            )
            line = (p.stdout.strip().splitlines() or ["{}"])[-1]
            rec = json.loads(line) if line.startswith("{") else {"error": p.stderr[-300:]}
        except subprocess.TimeoutExpired:
            rec = {"cores": int(c), "n_docs": n_docs, "error": "leg timeout 1700s"}
        rec["ts"] = round(time.time(), 1)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        time.sleep(10)


if __name__ == "__main__":
    main()
