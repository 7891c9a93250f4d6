"""Streaming re-expression tests (SURVEY §2.10).

The contract: the streaming plans compute the SAME answers as their
batch twins over the same files (availableNow trigger), and custom
state survives across restarts via the checkpoint.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yahoofinancedatalake_spark.catalog import load_table
from yahoofinancedatalake_spark.streaming import (
    running_last_state,
    stream_daily_avg,
    stream_dedup_by_id,
    stream_enrich,
    stream_last_value_per_group,
    stream_sessions,
    stream_stream_attribution,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def few_state_stores(spark):
    """Stateful queries allocate one state store per shuffle partition
    per operator — 4 is plenty for fixture-sized streams and ~10x
    faster than the suite-wide 32."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.fixture(scope="module")
def event_files(spark, tmp_path_factory):
    """Testdata events re-landed as micro-batch-able parquet files."""
    path = str(tmp_path_factory.mktemp("events_stream"))
    df = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    df.repartition(4).write.mode("overwrite").parquet(path)
    return path, df


def _run_to_memory(stream_df, name: str, mode: str, checkpoint: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream timed out"
    return q


def test_stream_daily_avg_matches_batch(spark, event_files, tmp_path):
    path, batch_df = event_files
    stream = spark.readStream.schema(batch_df.schema).parquet(path)
    _run_to_memory(
        stream_daily_avg(stream), "s_daily_avg", "complete",
        str(tmp_path / "ck1"),
    )
    got = {
        (r.day, r.event_type): (r.avg_value, r.n)
        for r in spark.table("s_daily_avg").collect()
    }
    from yahoofinancedatalake_spark.functions.scalars import dround

    expect = {
        (r.day, r.event_type): (r.avg_value, r.n)
        for r in batch_df.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .agg(
            (dround(F.sum("value"), 2) / F.count("*")).alias("avg_value"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert got == expect  # streaming plan ≡ batch plan, bit-equal


def test_stream_last_value_matches_batch(spark, event_files, tmp_path):
    path, batch_df = event_files
    stream = spark.readStream.schema(batch_df.schema).parquet(path)
    _run_to_memory(
        stream_last_value_per_group(stream), "s_last", "complete",
        str(tmp_path / "ck2"),
    )
    got = {
        r.user_id: (r.last_value, r.last_ts)
        for r in spark.table("s_last").collect()
    }
    expect = {
        r.user_id: (r.value, r.ts)
        for r in batch_df.groupBy("user_id")
        .agg(F.max_by("value", "ts").alias("value"), F.max("ts").alias("ts"))
        .collect()
    }
    assert got == expect


def test_stream_dedup_and_sessions_match_batch(spark, event_files, tmp_path):
    """One availableNow pass for the two bounded-state extensions:
    watermarked dedup keeps exactly one row per event_id, and
    streaming session_window (append mode) emits exactly the batch
    sessions the final watermark has closed."""
    path, batch_df = event_files
    # plant duplicate event_ids by unioning the stream dir with itself
    stream = spark.readStream.schema(batch_df.schema).parquet(path)
    _run_to_memory(
        stream_dedup_by_id(stream.union(stream), ["event_id"]),
        "s_dedup", "append", str(tmp_path / "ckd"),
    )
    assert (
        spark.table("s_dedup").count() == batch_df.count()
    )  # every duplicate dropped
    assert (
        spark.table("s_dedup").groupBy("event_id").count()
        .filter(F.col("count") > 1).count() == 0
    )

    _run_to_memory(
        stream_sessions(stream), "s_sessions", "append",
        str(tmp_path / "cks"),
    )
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events,
         r.session_value)
        for r in spark.table("s_sessions").collect()
    }
    from yahoofinancedatalake_spark.functions.scalars import dround

    max_ts = batch_df.agg(F.max("ts")).collect()[0][0]
    expect_all = (
        batch_df.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(
            F.count("*").alias("n_events"),
            dround(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )
    # append mode only emits sessions the final watermark closed
    import datetime as dt

    horizon = max_ts - dt.timedelta(days=2)
    expect = {
        tuple(r)
        for r in expect_all.filter(F.col("session_end") < F.lit(horizon))
        .collect()
    }
    assert expect  # non-degenerate: most sessions are closed
    assert expect.issubset(got)
    # nothing emitted that batch doesn't have
    allb = {tuple(r) for r in expect_all.collect()}
    assert got.issubset(allb)

    # stream-static enrichment: broadcast dim join matches batch join
    dim = spark.createDataFrame(
        [(t,  f"label_{t}") for t in
         ("click", "error", "purchase", "signup", "view")],
        "event_type string, label string",
    )
    _run_to_memory(
        stream_enrich(stream, dim, ["event_type"])
        .groupBy("label").count(),
        "s_enrich", "complete", str(tmp_path / "cke"),
    )
    got_e = {
        r.label: r["count"] for r in spark.table("s_enrich").collect()
    }
    expect_e = {
        r.label: r["count"]
        for r in batch_df.join(dim, "event_type").groupBy("label")
        .count().collect()
    }
    assert got_e == expect_e


def test_stream_stream_join_matches_batch(spark, event_files, tmp_path):
    """Stream-stream click→purchase attribution (time-bounded inner
    join, watermarks both sides) must emit exactly the batch join's
    matches when the whole history arrives in one availableNow pass."""
    path, batch_df = event_files
    stream = spark.readStream.schema(batch_df.schema).parquet(path)
    clicks = stream.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    _run_to_memory(
        stream_stream_attribution(clicks, purchases, within="INTERVAL 6 HOURS"),
        "s_attr", "append", str(tmp_path / "ckj"),
    )
    got = {
        (r.click_id, r.purchase_id) for r in spark.table("s_attr").collect()
    }
    bc = batch_df.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("l_key"), F.col("ts").alias("l_ts"),
        F.col("event_id").alias("click_id"),
    )
    bp = batch_df.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("r_key"), F.col("ts").alias("r_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    expect = {
        (r.click_id, r.purchase_id)
        for r in bc.join(
            bp,
            F.expr(
                "l_key = r_key AND r_ts <= l_ts "
                "AND r_ts >= l_ts - INTERVAL 6 HOURS"
            ),
        ).collect()
    }
    assert expect  # non-degenerate fixture
    assert got == expect


def test_running_last_state_accumulates_across_restarts(spark, tmp_path):
    import datetime as dt

    src = tmp_path / "src"
    ck = str(tmp_path / "ck3")
    schema = "user_id long, ts timestamp, value double"

    def t(s):
        return dt.datetime.fromisoformat(s)

    def land(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    land([(1, t("2024-01-01 10:00:00"), 5.0),
          (2, t("2024-01-01 11:00:00"), 7.0)], "a")

    got: dict[int, tuple] = {}

    def sink(batch_df, _bid):
        for r in batch_df.collect():
            got[r.user_id] = (r.last_value, r.n_events)

    def run_once():
        # memory sink can't recover a checkpoint; foreachBatch can.
        # evict_idle=False: restart semantics are identical (state
        # lives in the checkpoint either way), and an armed
        # processing-time timer makes the availableNow run spin empty
        # batches until awaitTermination expires (~120 s per run);
        # the timeout-eviction branch is unit-tested directly in
        # test_timed_out_state_is_removed.
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            running_last_state(stream, evict_idle=False)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream timed out"

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")  # 4 state stores
    try:
        run_once()
        assert got == {1: (5.0, 1), 2: (7.0, 1)}
        # batch 2: a newer value for key 1 and an OLDER (late) one for
        # key 2 — state keeps the max-ts value while counting both
        land([(1, t("2024-01-02 09:00:00"), 9.0),
              (2, t("2024-01-01 08:00:00"), 3.0)], "b")
        got.clear()
        run_once()
        assert got == {1: (9.0, 2), 2: (7.0, 2)}  # checkpointed state reused
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_stream_contingency_accumulates_across_restarts(spark, tmp_path):
    """The chi2 drift monitor's sufficient statistics: counts must
    accumulate through the checkpoint across restarts and equal a
    full batch recompute of the contingency."""
    import datetime as dt

    from yahoofinancedatalake_spark.streaming.ops import (
        stream_value_contingency,
    )

    src = tmp_path / "src"
    ck = str(tmp_path / "ck_chi2")
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    t0 = dt.datetime(2024, 1, 1)

    def land(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    got: dict = {}

    def sink(batch_df, _bid):
        got.clear()
        for r in batch_df.collect():
            got[(r.event_type, r.vb)] = r.obs

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            stream_value_contingency(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream timed out"

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        land([(1, t0, 1, "click", 10.0), (2, t0, 2, "click", 60.0),
              (3, t0, 3, "error", 480.0)])
        run_once()
        assert got == {("click", 0): 1, ("click", 1): 1, ("error", 9): 1}
        # second landing: same cells increment, a new cell appears,
        # and the >domain value clamps into the top bucket
        land([(4, t0, 4, "click", 12.0), (5, t0, 5, "view", 9999.0)])
        run_once()
        assert got == {
            ("click", 0): 2,
            ("click", 1): 1,
            ("error", 9): 1,
            ("view", 9): 1,
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_timed_out_state_is_removed():
    """The ProcessingTimeTimeout branch of _running_last_fn: a timed-out
    key removes its state and emits nothing (driver-side unit test —
    arming a real 24 h timer in an integration test would spin the
    availableNow run forever)."""
    from yahoofinancedatalake_spark.streaming.ops import _running_last_fn

    class FakeState:
        hasTimedOut = True
        exists = False
        removed = False

        def remove(self):
            self.removed = True

        def update(self, v):  # pragma: no cover - must not be called
            raise AssertionError("timed-out key must not update state")

    st = FakeState()
    out = list(_running_last_fn((1,), iter([]), st))
    assert out == []
    assert st.removed


def test_ttl_eviction_boundary_end_to_end(spark, tmp_path):
    """VERDICT r5 #5: the state-bound argument must be TESTED, not
    asserted. Two continuous queries decouple the two sides of the
    boundary so neither races the microbatch engine's latency under a
    loaded test host (the original single-query form used one 10 s
    TTL for both and flaked when a 'within-TTL' re-activation took
    >10 s wall-clock to process):

    - retention query, TTL = 10 min: a key re-activated well within
      its TTL keeps its state (count accumulates) — no sleep can
      plausibly cross the TTL;
    - eviction query, TTL = 4 s: after a sleep safely past the TTL
      the key restarts fresh (count resets to 1) — the sweep runs on
      the engine's own armed-timer microbatches, no new data needed.

    Both poll a foreachBatch dict sink: with armed processing-time
    timers the engine never settles, so processAllAvailable (and
    availableNow) would hang — polling is the only non-hanging drive.
    """
    import datetime as dt
    import time

    schema = "user_id long, ts timestamp, value double"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")

    def t(s):
        return dt.datetime.fromisoformat(s)

    def start(tag: str, ttl_ms: int, first_rows):
        src = tmp_path / f"ttl_src_{tag}"
        got: dict[int, tuple] = {}

        def land(rows):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(str(src))

        def sink(batch_df, _bid):
            for r in batch_df.collect():
                got[r.user_id] = (r.last_value, r.n_events)

        land(first_rows)
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            running_last_state(
                stream, evict_idle=True, idle_timeout_ms=ttl_ms
            )
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option(
                "checkpointLocation", str(tmp_path / f"ttl_ck_{tag}")
            )
            .start()
        )
        return q, got, land

    def wait_for(got, cond, desc, timeout=120.0):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if cond():
                return
            time.sleep(0.2)
        raise AssertionError(f"timed out waiting for {desc}: got={got}")

    # --- retention: TTL far larger than any test-host latency -------
    qk, gotk, landk = start(
        "keep", 600_000, [(1, t("2024-01-01 10:00:00"), 5.0)]
    )
    try:
        wait_for(gotk, lambda: gotk.get(1) == (5.0, 1), "keep: initial")
        landk([(1, t("2024-01-01 11:00:00"), 8.0)])
        wait_for(
            gotk,
            lambda: gotk.get(1) == (8.0, 2),
            "keep: within-TTL accumulation",
        )
    finally:
        qk.stop()

    # --- eviction: idle past a short TTL, then reappear -------------
    qe, gote, lande = start(
        "evict", 4_000, [(2, t("2024-01-01 10:00:00"), 7.0)]
    )
    try:
        wait_for(gote, lambda: gote.get(2) == (7.0, 1), "evict: initial")
        # Idle past the TTL. No data needed for the sweep: while
        # timers are armed the engine keeps scheduling microbatches,
        # so the expired key evicts on its own.
        time.sleep(8.0)
        # The key reappears: state must have been evicted -> a fresh
        # count ((9.0, 2) would mean idle state survived the TTL).
        lande([(2, t("2024-01-02 11:00:00"), 9.0)])
        wait_for(
            gote,
            lambda: gote.get(2) == (9.0, 1),
            "evict: post-TTL fresh state",
        )
    finally:
        qe.stop()
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_transform_with_state_v2_matches_v1_and_batch(
    spark, event_files, tmp_path
):
    """running_last_state_v2 (transformWithStateInPandas) must agree
    with both the v1 applyInPandasWithState operator and the batch
    arg-max over the same files — same contract, newer API.

    transformWithState's state-server protocol speaks protobuf; the
    container has no google.protobuf, so the operator is import-gated
    the same way the SARIMAX backend is (the API usage itself is the
    artifact under test where the dependency exists)."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state server requires protobuf",
    )
    from yahoofinancedatalake_spark.streaming.ops import (
        running_last_state_v2,
    )

    path, batch_df = event_files
    stream = spark.readStream.schema(batch_df.schema).parquet(path)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    oldprov = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", ""
    )
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    # transformWithState requires the RocksDB state store provider
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        _run_to_memory(
            running_last_state_v2(stream),
            "tws_v2",
            "update",
            str(tmp_path / "ck_v2"),
        )
        got = {
            r.user_id: (r.last_value, r.last_ts, r.n_events)
            for r in spark.sql(
                "SELECT * FROM tws_v2"
            ).collect()
        }
        want = {
            r.user_id: (r.last_value, r.last_ts, r.n_events)
            for r in batch_df.filter(F.col("ts").isNotNull())
            .groupBy("user_id")
            .agg(
                F.max_by(
                    "value", F.struct("ts", "value")
                ).alias("last_value"),
                F.max("ts").alias("last_ts"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .collect()
        }
        # v2 ties on equal ts resolve by arrival order (>=), like v1;
        # compare on (last_ts, n_events) strictly and value when the
        # max ts is unique per key
        assert set(got) == set(want)
        for k in want:
            assert got[k][1] == want[k][1], k  # same last_ts
            assert got[k][2] == want[k][2], k  # same n_events
        n_exact = sum(1 for k in want if got[k][0] == want[k][0])
        assert n_exact >= len(want) * 0.95  # ties are rare in testdata
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        if oldprov:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", oldprov
            )
        else:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )


def test_stream_sliding_distinct_matches_batch(spark, event_files, tmp_path):
    """Rung 9: trailing-7-day sliding distinct users — the stateless
    expand-then-single-dedup plan must equal a batch
    dedup-then-expand-then-distinct-count over the same history."""
    from yahoofinancedatalake_spark.streaming.ops import (
        stream_sliding_distinct,
    )

    path, batch_df = event_files
    stream = spark.readStream.schema(batch_df.schema).parquet(path)
    _run_to_memory(
        stream_sliding_distinct(stream),
        "s_slide", "complete", str(tmp_path / "cks"),
    )
    got = {
        (r.event_type, r.window_start, r.n_users)
        for r in spark.table("s_slide").collect()
    }
    day = F.date_trunc("day", "ts")
    contrib = (
        batch_df.select(
            "event_type",
            "user_id",
            F.explode(
                F.sequence(
                    day - F.expr("INTERVAL 6 DAYS"),
                    day,
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("window_start"),
        )
        .dropDuplicates(["event_type", "user_id", "window_start"])
        .groupBy("event_type", "window_start")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    want = {
        (r.event_type, r.window_start, r.n_users) for r in contrib.collect()
    }
    assert got == want and got
