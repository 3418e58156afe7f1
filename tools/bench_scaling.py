"""Two-parallelism-level scaling evidence (BASELINE.md north rule).

The real criterion is throughput scaling efficiency ≥0.8 from N to 4N
executors; per driver instruction the sandbox substitution is the same job
at local[N] vs local[4N] on the same input. Each level runs in a fresh
subprocess (fresh JVM — no warm-cache bleed), builds the full KG pipeline
(M0→M4, resume off) and reports triples/sec.

Usage: python tools/bench_scaling.py [n_docs] [N] — runs N and 4N.
Writes/updates the 'Scaling evidence' section consumed by BASELINE.md.
"""

from __future__ import annotations

import json
import subprocess
import sys

CHILD = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from pubmedkb_web_spark.session import build_session
from pubmedkb_web_spark.pipeline import runner

cores, n_docs = int(sys.argv[1]), int(sys.argv[2])
spark = build_session(app_name=f"scale{cores}", cores=cores,
                      shuffle_partitions=cores, driver_memory="32g")
out = tempfile.mkdtemp(prefix=f"scale_{cores}_")
t0 = time.time()
tables = runner.run_kg_pipeline(spark, out, n_docs=n_docs, resume=False)
n_triples = tables["triples"].count()
dt = time.time() - t0
shutil.rmtree(out, ignore_errors=True)
print(json.dumps({"cores": cores, "sec": round(dt, 2),
                  "triples": n_triples,
                  "triples_per_sec": round(n_triples / dt, 2)}))
spark.stop()
"""


def run_level(cores: int, n_docs: int) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", CHILD, str(cores), str(n_docs)],
        capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    lo = run_level(n, n_docs)
    print(json.dumps(lo))
    hi = run_level(4 * n, n_docs)
    print(json.dumps(hi))
    eff = hi["triples_per_sec"] / (4 * lo["triples_per_sec"])
    speedup = hi["triples_per_sec"] / lo["triples_per_sec"]
    summary = {
        "n_docs": n_docs,
        "N": n,
        "throughput_N": lo["triples_per_sec"],
        "throughput_4N": hi["triples_per_sec"],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(summary))
    with open("/root/repo/SCALING.json", "w") as f:
        json.dump({"levels": [lo, hi], "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()
