"""The literal ``spark-submit --py-files`` deployment path (north rule:
"run via spark-submit --py-files on a multi-executor cluster").

Packages the library into a zip and launches the canonical job
(scripts/submit_tokens_job.py) through the real spark-submit binary
from a scratch cwd — executors import cuckoofilter_spark ONLY from the
zip, so this catches anything the packaged artifact is missing (the
repo-cwd pytest run can't: cwd masks executor-import breaks).
"""
import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit binary not available")
def test_spark_submit_pyfiles_job(tmp_path):
    zip_path = tmp_path / "cuckoofilter_spark.zip"
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "make_pyfiles_zip.py"),
         str(zip_path)],
        check=True, capture_output=True, timeout=60)
    assert zip_path.stat().st_size > 100_000

    env = dict(os.environ, SUBMIT_JOB_DOCS="2000")
    # keep the submitted JVM off the pytest session's heap
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    p = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--py-files", str(zip_path),
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.sql.adaptive.enabled=true",
         "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
         os.path.join(ROOT, "scripts", "submit_tokens_job.py")],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=str(tmp_path))
    assert p.returncode == 0, p.stderr[-2000:]
    result = json.loads(p.stdout.strip().splitlines()[-1])
    assert result["ok"] is True, result
    assert result["checks"] == {
        "no_false_negatives": True, "fpr_within_bound": True,
        "hll_within_bound": True, "cms_within_bound": True,
        "kll_median_close": True}
    assert result["total_tokens"] > 0
