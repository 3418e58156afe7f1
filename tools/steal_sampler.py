"""Sample hypervisor CPU-steal alongside scaling legs.

loadavg cannot see co-tenant contention on a virtualized host: the
round-5 calm-window 2-core leg read 1644.8 s against a round-4 calm
minimum of 800.7 s while loadavg sat at the leg's own ~2.1 — the
missing signal is /proc/stat steal time (observed 0-15%+ swinging by
the minute on this VM). Run this beside any leg; the per-window steal
series is the noise annotation that decides whether a pair is
headline-grade or storm data.

Usage: python tools/steal_sampler.py <out.jsonl> [interval_s]
Samples until killed. Each line: {"ts", "steal_pct", "user_pct",
"idle_pct"} over the trailing interval.
"""

from __future__ import annotations

import json
import sys
import time


def snap() -> list[int]:
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def main() -> None:
    out = sys.argv[1]
    interval = float(sys.argv[2]) if len(sys.argv) > 2 else 15.0
    prev = snap()
    while True:
        time.sleep(interval)
        cur = snap()
        d = [y - x for x, y in zip(prev, cur)]
        prev = cur
        tot = sum(d) or 1
        rec = {
            "ts": round(time.time(), 1),
            "steal_pct": round(100 * d[7] / tot, 2),
            "user_pct": round(100 * d[0] / tot, 2),
            "idle_pct": round(100 * d[3] / tot, 2),
        }
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
