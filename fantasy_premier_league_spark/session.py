"""SparkSession factory.

Local test profile runs on ``local[N]`` (one JVM); the config below is
written so the same code is correct on a 1000-executor cluster:

- ``spark.sql.adaptive.enabled`` — AQE re-plans joins/shuffles at runtime
  (broadcast small sides discovered late, coalesce tiny partitions, split
  skewed ones). This is the main scale knob; everything else is declarative.
- ``spark.sql.shuffle.partitions`` — sized for the local profile; on a real
  cluster AQE coalescing makes the static number mostly irrelevant.
- Arrow enabled — all pandas_udf/mapInPandas paths are Arrow-batched.
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle (naive parquet timestamps) byte-for-byte.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(app_name: str = "fantasy_premier_league_spark", *, cpus: int | None = None) -> SparkSession:
    """Build (or reuse) the session with the engine's standard config."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    # -XX:-ZUncommit: the round-10 spike hunt (SCALE.md "Iterative-family
    # tail spikes") root-caused the 2.5-11x p95 outliers to KERNEL time —
    # a spike run executes the identical 564 tasks but burns 525 s of sys
    # CPU vs ~30 s steady (event-log task metrics: same input/shuffle
    # records, GC pauses < 0.3 ms, zero allocation stalls, code cache 43%,
    # no deopt storm). ZGC's idle-heap uncommit makes the next heavy run
    # recommit/remap hundreds of MB under the process-wide mmap lock with
    # all 32 task threads faulting into it. Keeping the heap committed
    # (+AlwaysPreTouch, measured free at startup) cut q48's 10-run p95
    # from 15-40 s worst cases to <= 1.7x the floor.
    _java_opts = os.environ.get(
        "SPARK_GRAFT_JAVA_OPTS",
        "-Djava.net.preferIPv4Stack=true -XX:+UseZGC -XX:-ZUncommit -XX:+AlwaysPreTouch",
    )
    # Shuffle/scratch dir: this box's / (and /tmp) is ext4 mounted with
    # inline `discard`, so every shuffle-file delete issues synchronous
    # TRIM in the kernel — measured ~25s of sys CPU per q48 run against
    # ~2-5s with a tmpfs local dir (SCALE.md spike section). Prefer
    # /dev/shm when present (50% of the 128 GiB profile; per-query
    # shuffle footprints here are <= a few GB and released between
    # queries). On a real cluster spark.local.dir comes from the cluster
    # manager's fast local disks — same escape hatch shape:
    # SPARK_GRAFT_LOCAL_DIR overrides, empty string disables.
    _local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if _local_dir is None and os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        _local_dir = "/dev/shm/spark-local"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet carries TIMESTAMP(NANOS); read as long, catalog
        # converts to micros (matching DuckDB's truncation semantics)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local mode runs everything in the driver JVM, so this IS the
        # engine heap: 8g showed GC-driven 2-3x per-query variance across
        # a 141-query bench run; 24g (of the 128 GiB profile) settles it
        # (measured medians: 199s @ 8g -> 178s @ 24g for the full sf0.1
        # inventory). On a real cluster this knob moves to executor.memory.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # ZGC: G1's multi-second full-heap pauses landed on random queries
        # (measured 14-22s single-query spikes across 141-query bench runs
        # with no code change); ZGC's sub-ms pauses bound the tail — worst
        # query 5.4s vs 22.3s, full-inventory total 149-192s vs 161-239s
        # over repeated runs. Throughput cost is within run-to-run noise.
        # ZGC is production-quality on JDK >= 15 only, so the flag is an
        # overridable default, not baked in: SPARK_GRAFT_JAVA_OPTS replaces
        # the whole option string (set it to "-Djava.net.preferIPv4Stack=true"
        # — or "" — on a cluster whose executors run an older JDK, the same
        # escape hatch SPARK_GRAFT_DRIVER_MEM provides for the 24g heap).
        .config("spark.driver.extraJavaOptions", _java_opts)
        .config("spark.executor.extraJavaOptions", _java_opts)
    )
    if _local_dir:
        builder = builder.config("spark.local.dir", _local_dir)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
