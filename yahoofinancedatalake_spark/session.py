"""SparkSession factory with scale-oriented defaults.

The reference leaves every Spark knob at its default and pins only a
legacy time parser and FileOutputCommitter v2
(reference: scripts/formatting/format_to_parquet.py:36-45). We instead
set the configs that matter at scale — AQE (runtime coalescing + skew
join), Arrow for the Pandas-UDF path, UTC session timezone as the
single timestamp truth, and shuffle partitions sized to the
parallelism at hand rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "yahoofinancedatalake_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Defaults are chosen for correctness-at-scale:

    - ``spark.sql.session.timeZone=UTC``: all timestamps are UTC
      (reference normalizes with ``to_utc_timestamp(c, "UTC")``,
      format_to_parquet.py:74 — we make it session-wide).
    - AQE on with partition coalescing and skew-join handling: at
      100 TB, static shuffle partitioning is always wrong for some
      stage; AQE re-plans from runtime statistics.
    - Arrow on: every applyInPandas/pandas_udf crosses the JVM↔Python
      boundary in columnar batches, not pickled rows.
    - shuffle partitions default to the local core count for tests;
      a real cluster deployment overrides via ``extra_conf`` or
      ``spark-submit --conf`` (rule of thumb: 2-3× total cores, or
      let AQE coalesce from a high initial number).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # Spark still defaults timestamp output to deprecated INT96,
        # which parquet writes WITHOUT column statistics — no footer
        # min/max, no row-group pruning, no manifest skipping on any
        # timestamp column. INT64 micros is the modern type every
        # reader (pyarrow, DuckDB, Trino) stats-prunes.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        # The whole-stage-codegen class cache defaults to 100 entries
        # (static conf). A ~200-query session generates far more units
        # than that, so a big generated join/filter class can be
        # evicted and recompiled mid-run — janino + C2 on a large unit
        # costs seconds (measured: prefix_filter_jaccard 2.6-3.3s warm
        # vs 8-13s on runs where its units were evicted). 1000 entries
        # keeps every unit of the full pack resident.
        .config("spark.sql.codegen.cache.maxEntries", "1000")
        # 40g, deliberately NOT most of the box: an oversized heap lets
        # garbage pile up until multi-second collections hit whatever
        # query runs next (measured: the same 36-query bench takes 110s
        # with a 90g heap, 32s with 40g on a 125G host — the python
        # UDF workers and OS page cache need the rest).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "40g"))
    )
    if master is not None:
        builder = builder.master(master)
    elif not SparkSession.getActiveSession():
        builder = builder.master(f"local[{cpus}]")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stage_boundary(df):
    """Materialize an intermediate DataFrame at a stage boundary and
    truncate its lineage — the engine's one place to choose HOW.

    Default: ``localCheckpoint()`` (eager) — blocks live on executors
    with NO lineage fallback. That is the right trade on ``local[*]``
    and on clusters where a lost executor may simply rerun the query,
    but on a long-running 100 TB job an executor loss mid-query kills
    the job instead of recomputing the boundary (a documented Spark
    caveat of the API). Set ``SPARK_GRAFT_RELIABLE_CHECKPOINT=1`` to
    switch every boundary to reliable ``checkpoint()`` — blocks land
    under the checkpoint dir (``SPARK_GRAFT_CHECKPOINT_DIR``, or a
    per-session temp dir), surviving executor loss at the cost of a
    write+read per boundary. The boundaries the engine materializes
    are model-/key-/candidate-bounded by convention, so the reliable
    form's extra I/O is bounded too; production deployments should
    point the dir at the cluster's durable scratch (HDFS/object
    store).
    """
    if os.environ.get("SPARK_GRAFT_RELIABLE_CHECKPOINT") == "1":
        sc = df.sparkSession.sparkContext
        if sc._jsc.sc().getCheckpointDir().isEmpty():
            import tempfile  # noqa: PLC0415

            sc.setCheckpointDir(
                os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
                or tempfile.mkdtemp(prefix="spark_graft_ckpt_")
            )
        return df.checkpoint()
    return df.localCheckpoint()


def heap_used_fraction(spark: SparkSession) -> float:
    """Fraction of the driver JVM heap currently holding live+garbage
    objects. One py4j round-trip (~1 ms) — cheap enough per query."""
    rt = spark.sparkContext._jvm.Runtime.getRuntime()
    return float(rt.totalMemory() - rt.freeMemory()) / float(rt.maxMemory())


def drain_if_pressured(
    spark: SparkSession,
    frac: float = 0.35,
    every: int = 25,
    force: bool = False,
) -> bool:
    """``System.gc()`` the driver when used heap exceeds ``frac`` of
    max, and in any case every ``every``-th call.

    Long single-JVM sessions over ~200 queries accumulate
    localCheckpoint blocks and broadcast remnants that the
    ContextCleaner can only free after a driver GC; left alone, the
    old-gen collection lands as a 3-7s pause on whatever heavy query
    runs next (r6: simhash 2.7s warm → 20.3s mid-bench). Two triggers
    because each misses alone: the heap fraction is measured against
    MAX heap while the JVM grows committed heap lazily, so a run can
    stay under any fraction threshold yet still take organic full-GC
    pauses mid-query (r7 run 3: zero fraction-triggered drains, one
    13s transient on a 2.6s-warm query); the fixed cadence (r6's fix,
    measured 321s → 228s) bounds that backlog but can lag a genuine
    pressure spike between drains. Callers invoke this OUTSIDE any
    query's clock.

    ``force=True`` drains unconditionally — callers pass it before the
    pack's highest-allocation-RATE queries (the shingle-explosion
    dedup family): in local mode the executors share the driver JVM,
    so those queries' young-gen burst rides on whatever old-gen
    occupancy ~190 prior queries left, and whether the G1 IHOP
    threshold trips MID-QUERY is what made the same 2.6-3.3s-warm
    query read 8-19s in half the otherwise-identical runs. A forced
    compact immediately before gives the burst maximal headroom.
    """
    n = _DRAIN_STATE["calls"] = _DRAIN_STATE["calls"] + 1
    if force or heap_used_fraction(spark) > frac or n % every == 0:
        spark.sparkContext._jvm.System.gc()
        return True
    return False


_DRAIN_STATE = {"calls": 0}


def tmpfs_scratch(prefix: str = "spark_graft_") -> str | None:
    """Route scratch I/O (streaming checkpoints, replay sources,
    shuffle spill) to tmpfs for benchmark runs.

    Creates a fresh dir under ``/dev/shm`` and makes it the default
    for ``tempfile.mkdtemp`` — every streaming gate query allocates
    its checkpoint/source dirs through ``tempfile``, so this one hook
    moves their I/O off disk (r6: checkpoint-heavy rungs showed 2-3×
    run-to-run variance from /tmp disk latency; stream_upsert ranged
    2.8-9.6s across identical-code runs). Callers that create the
    session AFTER this may also export ``SPARK_LOCAL_DIRS`` to move
    shuffle spill. Returns the scratch dir, or None without tmpfs.
    Benchmark tooling only — correctness runs don't care where
    checkpoints live, and real deployments need durable storage.
    """
    import tempfile  # noqa: PLC0415

    if not os.path.isdir("/dev/shm"):
        return None
    d = tempfile.mkdtemp(prefix=prefix, dir="/dev/shm")
    # keyed by scratch path, not a single slot: two scratches without
    # an interleaved release must each restore THEIR prior default —
    # a single slot restored the first (already-deleted) scratch as
    # tempfile.tempdir when releasing the second
    _TMPFS_STATE[d] = tempfile.tempdir
    tempfile.tempdir = d
    return d


#: scratch dir -> the tempfile.tempdir it displaced
_TMPFS_STATE: dict = {}


def tmpfs_release(scratch: str | None) -> None:
    """Delete a ``tmpfs_scratch`` dir and restore ``tempfile.tempdir``.

    The scratch dir becomes the process-global tempfile default, so
    deleting it without restoring the default leaves every later
    ``tempfile`` call in the process pointing at a removed path
    (FileNotFoundError). Always pair ``tmpfs_scratch`` with this on
    every exit path; passing None (no tmpfs) is a no-op.
    """
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    if scratch is None:
        return
    # Restore first: rmtree may raise despite ignore_errors on weird
    # mounts, and a stale tempdir is worse than a leaked dir.
    prior = _TMPFS_STATE.pop(scratch, None)
    if prior is not None and not os.path.isdir(prior):
        # the matching prior was itself a scratch released out of
        # order — fall back to tempfile's platform default
        prior = None
    if tempfile.tempdir == scratch:
        tempfile.tempdir = prior
    shutil.rmtree(scratch, ignore_errors=True)
