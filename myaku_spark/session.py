"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for the 100 TB design point and scaled down by the
``parallelism`` argument for local testing:

- AQE on (runtime coalescing + skew-join splitting).
- Arrow execution for pandas UDFs (all our Python code paths are
  Arrow-vectorized; no per-row Python anywhere).
- shuffle partitions sized to the core count locally; on a real cluster
  this should be ~2-3x total cores and AQE coalesces the tail.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "myaku_spark",
    parallelism: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the index-build workload.

    Args:
        parallelism: local core count; defaults to $SPARK_GRAFT_CPUS or 32.
        extra_conf: overrides applied last.
    """
    if parallelism is None:
        parallelism = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Make the package importable on executor Python workers regardless of
    # the driver's cwd (equivalent of spark-submit --py-files for local
    # mode; on a cluster, ship a zip of myaku_spark via --py-files).
    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_dir not in pp.split(":"):
        os.environ["PYTHONPATH"] = f"{repo_dir}:{pp}" if pp else repo_dir
    builder = SparkSession.builder.appName(app_name)
    # Under spark-submit (gateway already launched with --master from the
    # CLI — a real cluster or explicit local[N]) the submitted master
    # wins; standalone invocations get local[parallelism].
    under_spark_submit = (
        "PYSPARK_GATEWAY_PORT" in os.environ
        or "--master" in os.environ.get("PYSPARK_SUBMIT_ARGS", "")
    )
    if not under_spark_submit:
        builder = builder.master(f"local[{parallelism}]")
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(max(parallelism, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Don't let AQE coalesce far below the core count: our
        # post-shuffle stages run CPU-bound Python kernels, where
        # bytes-per-partition is the wrong sizing signal. (At PB scale
        # the 64MB advisory dominates anyway; these floors only bite on
        # small data. CPU-bound UDF stages additionally repartition
        # explicitly — see segments.py / build_index.py.)
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # Codegen classes from a many-query session fill the JVM's
        # default 240 MB code cache (measured >115 MB halfway through
        # the bench query set); once full, UseCodeCacheFlushing evicts
        # silently and hot generated methods fall back to interpreted
        # execution (observed as 5-8x executor CPU inflation on
        # identical queries). 512 MB keeps compiled code resident.
        # Applied to executors too for cluster deployments (same
        # generated classes run there).
        .config(
            "spark.driver.extraJavaOptions",
            (
                "-XX:ReservedCodeCacheSize=512m "
                + os.environ.get("SPARK_GRAFT_JAVA_OPTS", "")
            ).strip(),
        )
        .config(
            "spark.executor.extraJavaOptions",
            (
                "-XX:ReservedCodeCacheSize=512m "
                + os.environ.get("SPARK_GRAFT_JAVA_OPTS", "")
            ).strip(),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
