"""Summarize SCALING_SAMPLES.jsonl into min-per-level efficiencies.

Usage: python tools/scaling_report.py <ts_cutoff>
Only legs with ts >= cutoff (i.e. the current code version) are used —
min-per-level is only meaningful across legs of identical code.
Prints per-(n_docs) 2->8 end-to-end efficiency from per-level minima plus
per-stage efficiencies computed from the SAME legs that achieved each
level's end-to-end minimum (stage times within one leg are coherent;
mixing stages across legs would fabricate a leg that never ran).
"""

import json
import sys


def main() -> None:
    cutoff = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0
    recs = [json.loads(l) for l in open("/root/repo/SCALING_SAMPLES.jsonl")]
    recs = [r for r in recs if r.get("ts", 0) >= cutoff]
    by = {}
    for r in recs:
        by.setdefault((r["n_docs"], r["cores"]), []).append(r)
    out = {}
    for n_docs in sorted({k[0] for k in by}):
        lo = by.get((n_docs, 2)) or []
        hi = by.get((n_docs, 8)) or []
        if not lo or not hi:
            continue
        best_lo = min(lo, key=lambda r: r["sec"])
        best_hi = min(hi, key=lambda r: r["sec"])
        speed = best_lo["sec"] / best_hi["sec"]
        stages = {}
        for s in best_lo["stages"]:
            if s in best_hi["stages"] and best_hi["stages"][s] > 0:
                stages[s] = round(best_lo["stages"][s] / best_hi["stages"][s] / 4, 2)
        out[n_docs] = {
            "legs_2": [r["sec"] for r in lo],
            "legs_8": [r["sec"] for r in hi],
            "min_2": best_lo["sec"],
            "min_8": best_hi["sec"],
            "speedup_2_to_8": round(speed, 2),
            "efficiency": round(speed / 4, 2),
            "tps_8": best_hi["tps"],
            "triples": best_hi["triples"],
            "per_stage_efficiency_from_min_legs": stages,
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
