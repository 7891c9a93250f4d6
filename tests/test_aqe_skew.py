"""Pin AQE's runtime skew-join splitting — the automatic lever next
to the explicit salted_join (operators/skew.py).

The session enables spark.sql.adaptive.skewJoin; this test proves the
rule actually fires on a skewed shuffle by dropping the size
thresholds to test scale and checking the final adaptive plan carries
``skew=true`` on the join and a ``skewed`` AQEShuffleRead. Gotcha
worth pinning: skew detection runs on COMPRESSED map-output sizes —
constant/sequential columns compress below any realistic threshold
and silently disable the rule (the first version of this test failed
that way), so the fixture uses incompressible values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.shuffle.partitions": "16",
}


def test_aqe_splits_skewed_join_partition(spark):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    try:
        # one hot key holding ~99% of rows; pseudo-random payload so
        # compressed partition size reflects real volume
        left = spark.range(0, 500_000).select(
            F.lit(0).alias("k"),
            (F.col("id") * 7919 % 1_000_003).alias("v"),
        ).union(
            spark.range(0, 5_000).select(
                (F.col("id") % 100 + 1).alias("k"),
                F.col("id").alias("v"),
            )
        )
        right = spark.range(0, 101).select(
            F.col("id").alias("k"), F.lit("x").alias("name")
        )
        j = left.join(right, "k").select(F.sum("v").alias("s"))
        [row] = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        assert "skewed" in plan  # AQEShuffleRead marks the split read
        # and the split join still computes the exact answer
        expected = (
            sum(i * 7919 % 1_000_003 for i in range(500_000))
            + sum(range(5_000))
        )
        assert row.s == expected
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


class TestMisraGries:
    def test_planted_heavy_keys_survive_aggressive_pruning(self, spark):
        """k=8 counters over a 10k-key domain: every key with global
        count > N/(k+1) must appear in the candidate union no matter
        how the rows are partitioned (the mergeable-MG guarantee the
        heavy_hitters_2pass query rests on)."""
        from yahoofinancedatalake_spark.operators.skew import (
            misra_gries_candidates,
        )

        # 100k background rows over 10k distinct keys + 3 hot keys
        # planted at ~20k rows each: N=160k, N/(k+1)=N/9~17.8k.
        bg = spark.range(0, 100_000).select(
            (F.col("id") % 10_000 + 100).alias("k")
        )
        hot = spark.range(0, 60_000).select((F.col("id") % 3).alias("k"))
        df = bg.union(hot).repartition(16)  # adversarial mix
        cands = set(
            r.k for r in misra_gries_candidates(df, "k", 8).collect()
        )
        assert {0, 1, 2} <= cands
        # and the candidate set is bounded by k x partitions
        assert len(cands) <= 8 * 16

    def test_exact_when_domain_fits(self, spark):
        """k >= domain size: MG degenerates to exact distinct keys."""
        from yahoofinancedatalake_spark.operators.skew import (
            misra_gries_candidates,
        )

        df = spark.range(0, 1_000).select((F.col("id") % 37).alias("k"))
        cands = set(
            r.k for r in misra_gries_candidates(df, "k", 50).collect()
        )
        assert cands == set(range(37))
