"""Hunt for a calm-window 2-vs-8 scaling pair (round-5 VERDICT #2).

Runs back-to-back (2-core, 8-core) full-pipeline legs at 1.6M docs in a
loop via tools/scaling_leg.py, annotating each leg with the /proc/stat
steal+user series sampled DURING the leg. The round-4 bar (same-window
pair efficiency >= 0.80 with no min-pooling) is only achievable in a
genuinely calm window, and this host's calm windows are minutes-scale
and invisible to loadavg (see BASELINE.md round-5 pairs adjudication) —
so the only strategy that works is: keep measuring, classify every
window by its own steal/wall evidence, and keep the best honest pair.

Each completed pair appends to PAIR_HUNT.jsonl:
  {t2, t8, efficiency, steal_mean_2, steal_mean_8, ts}

Stops after max_pairs or when a pair reaches the target efficiency.

Usage: python tools/pair_hunter.py [max_pairs] [target_eff]
Env: PAIR_HUNT_DOCS overrides the corpus size (default 1600000); each
pair record carries both legs' triple counts and their equality (the
determinism-across-core-counts check at that size).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

REPO = "/root/repo"
SAMPLES = os.path.join(REPO, "SCALING_SAMPLES.jsonl")
OUT = os.path.join(REPO, "PAIR_HUNT.jsonl")


def snap() -> list[int]:
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


class StealMeter(threading.Thread):
    def __init__(self) -> None:
        super().__init__(daemon=True)
        self.samples: list[float] = []
        self._stop = threading.Event()

    def run(self) -> None:
        prev = snap()
        while not self._stop.wait(15.0):
            cur = snap()
            d = [y - x for x, y in zip(prev, cur)]
            prev = cur
            tot = sum(d) or 1
            self.samples.append(round(100 * d[7] / tot, 2))

    def stop(self) -> list[float]:
        self._stop.set()
        return self.samples


def last_leg() -> dict:
    with open(SAMPLES) as f:
        return json.loads(f.readlines()[-1])


N_DOCS = int(os.environ.get("PAIR_HUNT_DOCS", "1600000"))
# Core counts for the (low, high) legs. 2,8 is the historical single-JVM
# pair; with SPARK_GRAFT_EXEC_MODE=cluster and SPARK_GRAFT_EXEC_CORES=2,
# PAIR_HUNT_CORES=4,16 runs local-cluster[2,2,m] vs local-cluster[8,2,m] —
# the literal "N executors vs 4N executors" of the north rule, where BOTH
# legs pay inter-executor shuffle fetch (a 1-executor low leg reads 100%
# of its shuffle locally, an advantage no real N-executor cluster has).
C_LO, C_HI = (int(c) for c in os.environ.get("PAIR_HUNT_CORES", "2,8").split(","))


def run_leg(cores: int) -> tuple[dict, list[float]]:
    meter = StealMeter()
    meter.start()
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scaling_leg.py"), str(cores), str(N_DOCS)],
        cwd=REPO,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        check=True,
    )
    steals = meter.stop()
    return last_leg(), steals


def main() -> None:
    max_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    target = float(sys.argv[2]) if len(sys.argv) > 2 else 0.80
    for i in range(max_pairs):
        leg2, st2 = run_leg(C_LO)
        leg8, st8 = run_leg(C_HI)
        eff = round(leg2["sec"] / ((C_HI / C_LO) * leg8["sec"]), 3)
        rec = {
            "pair": i,
            "n_docs": N_DOCS,
            "cores": [C_LO, C_HI],
            "master": [leg2.get("master"), leg8.get("master")],
            "t2": leg2["sec"],
            "t8": leg8["sec"],
            "triples_2": leg2.get("triples"),
            "triples_8": leg8.get("triples"),
            "triples_match": leg2.get("triples") == leg8.get("triples"),
            "efficiency": eff,
            "steal_mean_2": round(sum(st2) / len(st2), 2) if st2 else None,
            "steal_max_2": max(st2) if st2 else None,
            "steal_mean_8": round(sum(st8) / len(st8), 2) if st8 else None,
            "steal_max_8": max(st8) if st8 else None,
            "ts": round(time.time(), 1),
        }
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        scale = N_DOCS / 1600000.0
        # calm bands calibrated at 2/8 cores, 1.6M docs; rescale linearly
        # for other corpus sizes and inversely for other core counts
        if (
            eff >= target
            and leg8["sec"] < 400 * scale * 8 / C_HI
            and leg2["sec"] < 900 * scale * 2 / C_LO
        ):
            # efficiency >= target AND BOTH legs in their calm bands.
            # Certifying only t8 would let a noise-inflated t2 fake high
            # efficiency (eff = t2 / (4*t8) grows with t2); the calm
            # bands come from the round-4/5 sample history at 1.6M docs
            # (calm t2 ~800 s, calm t8 ~250 s, noisy legs 1.5-3x that),
            # scaled linearly for other PAIR_HUNT_DOCS sizes.
            print("target met in a certified-calm window", flush=True)
            break


if __name__ == "__main__":
    main()
