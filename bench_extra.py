"""Extra benchmarks for optimization work — NOT the frozen driver bench.

Times an arbitrary subset of the declared queries with the same
min-over-interleaved-reps protocol as bench.py, but drives each plan with
the noop sink (guide §1.4: computes every column of every row, no
collect/count pruning) so what is timed is the computation itself.

Usage: python bench_extra.py [--count] name [name ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0),
       SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_REPS (default 2).
--count uses .count() instead of the noop sink — bench.py's exact
methodology, for apples-to-apples per-query comparisons with BENCH_r{N}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--count"]
    use_count = "--count" in sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

    import __spark_entry__ as E
    from pubmedkb_web_spark.session import build_session

    spark = build_session(
        app_name="bench_extra", cores=cpus, shuffle_partitions=cpus, driver_memory="48g"
    )
    qs = E.queries()
    resolve = lambda n: qs.get(n) or getattr(E, f"q_{n}")  # noqa: E731
    times: dict[str, float] = {}
    for _rep in range(max(1, reps)):
        for name in args:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = resolve(name)(spark, sf_dir)
            if use_count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            times[name] = min(times.get(name, dt), dt)
            spark.sparkContext.setJobDescription(None)
    print(
        json.dumps(
            {
                "metric": "subset_sec",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf_dir,
                "cpus": cpus,
                "reps": reps,
                "sink": "count" if use_count else "noop",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
