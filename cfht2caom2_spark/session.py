"""SparkSession factory tuned for the web-text quality-filter workload.

Scale posture (the settings that matter at 100 TB, set here so local tests run
the same plan shape a 1000-executor cluster would):

  * AQE on — runtime coalescing of the (single) wide stage, skew-join splitting
    for the MinHash band self-join.
  * Arrow on — every Python crossing is a vectorized batch (north_rule:
    "no per-row Python").  ``maxRecordsPerBatch`` bounds extraction-UDF memory:
    html payloads can be ~100 KB each, so 2k rows/batch ≈ 200 MB ceiling.
  * shuffle partitions default to 2×cores locally; on a real cluster this is
    overridden to ~2-3× total executor cores (AQE coalesces down afterwards).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cfht2caom2_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession with the engine's standard conf.

    ``cores=None`` -> ``local[*]``.  Tests pass explicit small values; the
    scaling bench passes 8 vs 32 to evidence the N->4N efficiency gate.
    """
    master = f"local[{cores}]" if cores else "local[*]"
    n = cores or (os.cpu_count() or 4)
    # JVM logging goes to a FILE, never the console (VERDICT r5 item 6):
    # the driver's bench-tail capture must see exactly one JSON line on
    # stdout, and log4j's console appender has raced it three rounds
    # running.  Only effective for the first session of a JVM (extra
    # JavaOptions are launch-time), which is exactly the bench/driver case.
    _log4j = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "conf", "log4j2.properties")
    _jvm_opts = (f"-Dlog4j.configurationFile=file:{_log4j}"
                 if os.path.exists(_log4j) else "")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 2 * n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # stage-progress \r spam interleaves with stdout consumers (the
        # driver's bench-tail capture lost round 3's result line to it) and
        # buys nothing headless — off everywhere
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if _jvm_opts:
        builder = (builder
                   .config("spark.driver.extraJavaOptions", _jvm_opts)
                   .config("spark.executor.extraJavaOptions", _jvm_opts))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
