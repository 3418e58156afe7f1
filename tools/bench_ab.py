"""Interleaved A/B bench: round-3-tagged code vs HEAD, same noise window.

Round-4 VERDICT "Next round" #1: BENCH_r04 could not be compared to
BENCH_r03 (different windows, 2 reps, single-shot kg leg). This driver
runs the TWO CODE VERSIONS interleaved — cycle i runs r3's bench.py then
HEAD's bench.py back-to-back — so every r3 sample has a HEAD sample in
the same noise window. Per-query result is the MIN across cycles per
version (the established co-tenant-noise filter, bench.py:12-19); the
verdict per query is the HEAD/r3 ratio of those mins.

Each bench.py subprocess runs with SPARK_GRAFT_BENCH_REPS=1 (the cycles
ARE the reps — in-process repetition would double wall-clock without
adding cross-window coverage). The r3 tree is a plain `git worktree` of
commit 5df9ee4; nothing is copied or patched.

Usage: python tools/bench_ab.py [cycles] [r3_worktree]
Writes BENCH_AB_R3_R5.json at the repo root.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH_AB_R3_R5.json")


def run_bench(tree: str, env: dict) -> dict:
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"bench failed in {tree}:\n{proc.stderr[-3000:]}")
    # bench prints exactly ONE JSON line (other lines are Spark logs)
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line from bench in {tree}")


def main() -> None:
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    r3_tree = sys.argv[2] if len(sys.argv) > 2 else "/tmp/r3wt"
    env = {
        **os.environ,
        "SPARK_GRAFT_BENCH_REPS": "1",
        "SPARK_GRAFT_SF_DIR": os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        ),
    }
    samples: dict[str, list[dict]] = {"r3": [], "head": []}
    for c in range(cycles):
        for label, tree in (("r3", r3_tree), ("head", REPO)):
            t0 = time.time()
            rec = run_bench(tree, env)
            rec["_cycle"] = c
            rec["_wall"] = round(time.time() - t0, 1)
            samples[label].append(rec)
            print(
                f"cycle {c} {label}: e2e={rec['value']} kg={rec['queries'].get('kg_pipeline')}",
                flush=True,
            )

    def mins(label: str) -> dict:
        out: dict[str, float] = {}
        for rec in samples[label]:
            for q, t in rec["queries"].items():
                out[q] = min(out.get(q, t), t)
        return out

    m3, mh = mins("r3"), mins("head")
    shared = sorted(set(m3) & set(mh))
    ratios = {q: round(mh[q] / m3[q], 3) for q in shared if m3[q] > 0}
    report = {
        "protocol": (
            f"{cycles} interleaved cycles (r3 then HEAD per cycle), REPS=1 per "
            "subprocess, per-query min across cycles per version; ratio = "
            "HEAD_min / r3_min"
        ),
        "r3_commit": "5df9ee4",
        "r3_min": m3,
        "head_min": mh,
        "ratio_head_over_r3": ratios,
        "median_ratio": sorted(ratios.values())[len(ratios) // 2] if ratios else None,
        "e2e_min_r3": round(sum(m3.values()), 3),
        "e2e_min_head": round(sum(mh.values()), 3),
        "samples": samples,
    }
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: report[k] for k in ("median_ratio", "e2e_min_r3", "e2e_min_head")}))


if __name__ == "__main__":
    main()
