"""SparkSession factory tuned for this engine.

Local mode is the test bed; the configs are chosen so the same code is
correct on a multi-executor cluster (AQE on, Arrow on, adaptive skew-join
on). ``spark.sql.shuffle.partitions`` defaults to the local core count —
on a real cluster it should be set to ~2-3x total cores by the submitter.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def spark_session(
    app_name: str = "housing_crawler_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    AQE + Arrow + UTC are mandatory for this engine:
    - AQE coalesces small shuffle partitions and splits skewed ones at
      runtime (the frontier's hot hosts additionally get explicit salting
      in ``operators.frontier`` — AQE alone does not fix skewed windows).
    - Arrow makes the pandas-UDF image codec path batch-transfer.
    - UTC pins timestamp semantics so results match ANSI-SQL oracles.
    """
    cores = cores or DEFAULT_CPUS
    shuffle = shuffle_partitions or cores
    # one BLAS thread per python worker: task-level parallelism already
    # saturates the cores; nested BLAS threading (OpenBLAS defaults to
    # n_cores PER process) oversubscribes 32x32 and thrashes
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to Python workers (spark-submit --py-files
    semantics): local-mode workers don't inherit the driver's cwd, so
    mapInPandas closures referencing the package would fail to unpickle
    without it."""
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_base = os.path.join(
        tempfile.gettempdir(), f"hcs_pyfiles_{os.getpid()}", "housing_crawler_spark"
    )
    if not os.path.exists(zip_base + ".zip"):
        os.makedirs(os.path.dirname(zip_base), exist_ok=True)
        shutil.make_archive(zip_base, "zip", os.path.dirname(pkg_dir), "housing_crawler_spark")
    try:
        spark.sparkContext.addPyFile(zip_base + ".zip")
    except Exception:
        pass  # already added in this context
