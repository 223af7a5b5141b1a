"""SparkSession factory with the configs this library assumes.

Local defaults target the sandbox (local[N] single JVM); on a real
cluster only the master/shuffle-partition settings change — the
library's operators depend on nothing here except Arrow being enabled.
"""

from __future__ import annotations

import os
import pathlib

from pyspark.sql import SparkSession

_PKG_ROOT = str(pathlib.Path(__file__).resolve().parent.parent)


def get_spark(app: str = "cuckoofilter-spark", cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cores
    # Python workers must import this package regardless of driver cwd.
    # Local-mode stand-in for `spark-submit --py-files cuckoofilter_spark.zip`.
    pp = os.environ.get("PYTHONPATH", "")
    if _PKG_ROOT not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = _PKG_ROOT + (os.pathsep + pp if pp else "")
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
