"""Pin Spark's runtime bloom-filter join pruning.

The third join-pruning lever next to broadcast (plan-time) and AQE
skew splitting (runtime repartitioning): when a shuffle join's build
side is selective, the optimizer injects a bloom_filter_agg on the
dim side and a BloomFilterMightContain predicate into the FACT scan,
so most fact rows die at the scan instead of riding the shuffle. At
100 TB this is the difference between shuffling the whole fact table
and shuffling the ~join-selectivity fraction of it. Thresholds are
lowered to test scale; correctness of the filtered join is asserted
alongside the plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def test_runtime_bloom_filter_prunes_fact_scan(spark, tmp_path):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    try:
        fact_p, dim_p = str(tmp_path / "fact"), str(tmp_path / "dim")
        spark.range(0, 200_000).select(
            F.col("id").alias("k"),
            (F.col("id") * 7919 % 1_000_003).alias("v"),
        ).write.mode("overwrite").parquet(fact_p)
        spark.range(0, 10_000).select(
            F.col("id").alias("k"), F.lit("x").alias("name")
        ).write.mode("overwrite").parquet(dim_p)
        fact = spark.read.parquet(fact_p)
        dim = spark.read.parquet(dim_p).filter(F.col("k") % 100 == 0)
        j = fact.join(dim, "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # one side builds the filter (bloom_filter_agg subquery), the
        # other probes it inside its scan Filter, pre-shuffle
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
        # pruned join still computes the exact answer
        assert j.count() == 100  # k in {0, 100, ..., 9900}
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
