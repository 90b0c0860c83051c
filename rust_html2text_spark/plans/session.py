"""SparkSession construction tuned for the HTML→text extraction workload.

Scale rationale (100 TB / 1000 executors):
- AQE on: runtime coalescing of shuffle partitions + skew-split of any
  oversized partition after the url-hash repartition.
- Arrow batches kept small (`maxRecordsPerBatch`): HTML rows are ~10 KB-10 MB;
  the default 10k rows/batch would hold up to tens of GB per Python worker.
  512 rows/batch bounds worker memory at ~0.5-5 GB worst case while keeping
  Arrow transfer vectorized.
- `files.maxPartitionBytes` left at 128 MB so a 100 TB scan yields ~800k
  input splits — fine for 1000 executors.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "rust-html2text-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: one shuffle partition per core keeps all cores busy
        # without tiny-task overhead; on a real cluster this is set to
        # ~2-3x total executor cores by the job submitter.
        n = master[master.find("[") + 1 : master.find("]")]
        shuffle_partitions = 32 if n == "*" else int(n)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
