"""Ad-hoc 2x2 scaling measurement used for BASELINE.md (see also
tools/bench_scaling.py). Fresh JVM per leg; best-of-k per level to filter
shared-host neighbor noise.

Usage: python tools/scaling_2x2.py [n_docs] [comma-separated core legs]
"""

import json
import subprocess
import sys
import time

CHILD = r'''
import json, shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from pubmedkb_web_spark.session import build_session
from pubmedkb_web_spark.pipeline import runner
cores, n_docs = sys.argv[1], int(sys.argv[2])
# sandbox-scaled partition sizing: the test corpus is tens of MB, so the
# production defaults (128 MB splits / 64 MB AQE advisory) collapse every
# scan to 1-2 tasks and idle the extra cores. At real scale these three
# lines are unnecessary -- files and shuffles are naturally >= the targets.
spark = build_session(cores=cores, shuffle_partitions=4 * int(cores), driver_memory="40g",
    extra_conf={
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.files.openCostInBytes": "512k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
    })
out = tempfile.mkdtemp()
t0 = time.time()
tables = runner.run_kg_pipeline(spark, out, n_docs=n_docs, resume=False)
n = tables["triples"].count()
dt = time.time() - t0
print(json.dumps({"cores": cores, "n": n_docs, "sec": round(dt,1), "triples": n, "tps": round(n/dt,1)}))
shutil.rmtree(out, ignore_errors=True)
spark.stop()
'''


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 120000
    legs = sys.argv[2].split(",") if len(sys.argv) > 2 else ["32", "8", "32", "8"]
    out = []
    for c in legs:
        p = subprocess.run(
            [sys.executable, "-c", CHILD, c, str(n_docs)],
            capture_output=True, text=True, timeout=1700,
        )
        line = (p.stdout.strip().splitlines() or [p.stderr[-500:]])[-1]
        print(line, flush=True)
        if line.startswith("{"):
            out.append(json.loads(line))
        time.sleep(15)
    best = {}
    for r in out:
        c = int(r["cores"])
        if c not in best or r["tps"] > best[c]["tps"]:
            best[c] = r
    levels = sorted(best)
    if len(levels) == 2 and levels[1] == 4 * levels[0]:
        lo, hi = best[levels[0]], best[levels[1]]
        eff = hi["tps"] / (4 * lo["tps"])
        summary = {
            "n_docs": n_docs, "N": levels[0], "4N": levels[1],
            "sec_N": lo["sec"], "sec_4N": hi["sec"],
            "throughput_N": lo["tps"], "throughput_4N": hi["tps"],
            "speedup": round(hi["tps"] / lo["tps"], 3),
            "scaling_efficiency": round(eff, 3),
            "method": "full checkpointed pipeline (M0-M4), fresh JVM per leg, "
                      "best-of-k per level (shared-host wall-clock noise)",
        }
        print(json.dumps(summary), flush=True)
        json.dump(
            {"runs": out, "summary": summary},
            open("/root/repo/SCALING.json", "w"),
            indent=1,
        )


if __name__ == "__main__":
    main()
