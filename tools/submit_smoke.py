"""North-rule launch-mode smoke: package the engine and run it via
``spark-submit --py-files`` on a MULTI-EXECUTOR master
(local-cluster[2,2,2048] — two separate executor JVMs, 2 cores each), the
closest single-box analog of the rule's cluster deployment. Proves:

- the package imports and runs with NO repo checkout on the executors
  (only the zip shipped by --py-files);
- the checkpointed pipeline builds end-to-end under a real scheduler with
  executor-side pandas UDF workers;
- a driver-contract query returns the expected rows.

Usage: python tools/submit_smoke.py   (writes /tmp/submit_smoke_result.json)
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = r"""
import json, sys, tempfile
from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()
from pubmedkb_web_spark.pipeline import runner
from pubmedkb_web_spark.query import nen

out = runner.run_kg_pipeline(spark, tempfile.mkdtemp(), n_docs=40)
counts = {k: v.count() for k, v in out.items() if k != "_pipeline"}
from pubmedkb_web_spark import fixtures
ed = fixtures.entity_dict_df(spark)
hits = nen.ids_by_name(ed, nen.fuzzy_names(ed, "p.v600e", min_similarity=0.7))
result = {
    "counts": counts,
    "fuzzy_rows": hits.count(),
    "executors": spark.sparkContext.getConf().get("spark.master"),
}
with open(sys.argv[1], "w") as f:
    json.dump(result, f)
spark.stop()
"""


def main() -> None:
    workdir = tempfile.mkdtemp()
    zip_path = os.path.join(workdir, "pubmedkb_web_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "pubmedkb_web_spark")
        for root, _d, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    job_path = os.path.join(workdir, "job.py")
    with open(job_path, "w") as f:
        f.write(JOB)
    result_path = os.path.join(workdir, "result.json")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only source of the pkg
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local-cluster[2,2,2048]",
            "--driver-memory", "3g",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--py-files", zip_path,
            job_path, result_path,
        ],
        cwd=workdir,  # NOT the repo: import must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    ok = proc.returncode == 0 and os.path.exists(result_path)
    summary = {"returncode": proc.returncode, "ok": ok}
    if ok:
        summary["result"] = json.load(open(result_path))
    else:
        summary["stderr_tail"] = proc.stderr[-3000:]
    with open("/tmp/submit_smoke_result.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1)[:1500])
    shutil.rmtree(workdir, ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
