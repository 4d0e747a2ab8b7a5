"""SparkSession builder tuned for this engine.

Local mode is a single JVM with N executor threads; the same configs
(AQE, Arrow, shuffle-partition sizing) are what we would ship to a
1000-executor cluster via spark-submit — only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    cores: int | None = None,
    app_name: str = "menelaus_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``shuffle_partitions`` defaults to ``cores`` in local mode: the
    classic 200 over-parallelizes small local runs and under-
    parallelizes 100 TB; on a real cluster this would be set to
    ~2-3x total executor cores.
    """
    cores = cores or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cores
    # Python workers are separate processes: driver-side sys.path edits
    # don't reach them. Exporting PYTHONPATH before the JVM launches is
    # the local-mode analog of `spark-submit --py-files menelaus_spark.zip`
    # (the cluster launch mode required by the north rule).
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_parent + (os.pathsep + existing if existing else "")
        )
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch + file-split sizing for wide binary rows (~50 KB
        # audio payloads): batches and splits must be sized in BYTES.
        # 1024 rows x ~50 KB ~= 50 MB per in-flight Arrow batch keeps 32
        # concurrent Python workers well under memory pressure; 64 MB
        # splits give ~2-3 waves of tasks per stage at 32 cores while
        # still amortizing per-task setup (tiny splits were the other
        # failure mode: 1 MB files -> per-task overhead dominated).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.files.maxPartitionBytes", "64m")
        .config("spark.sql.files.openCostInBytes", "8m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        # off-heap column vectors: parquet scan batches of ~50 KB binary
        # audio rows bypass the GC entirely (on-heap scan batches caused
        # allocation-pressure collapse at high thread counts)
        .config("spark.memory.offHeap.enabled", "true")
        .config("spark.memory.offHeap.size", os.environ.get("SPARK_OFFHEAP", "16g"))
        .config("spark.sql.columnVector.offheap.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        # InferFiltersFromGenerate turns every explode(expr) into a
        # size(expr)>0 pre-filter; predicate pushdown then substitutes
        # the FULL generator input into that filter and pushes it below
        # the nearest Exchange — so a heavy shingle/tokenize expression
        # is evaluated TWICE per row, once of those on the pre-shuffle
        # (often single-split) side of a repartition. Our generators
        # explode computed arrays that are almost never empty, so the
        # inferred filter prunes nothing and only duplicates work (at
        # any scale — the duplicate evaluation is per input row).
        # Measured on the r06 bench: minhash_documents 4.6 s -> 1.5 s
        # warm with the rule excluded, identical results.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
