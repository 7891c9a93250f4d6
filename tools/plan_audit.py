"""Physical-plan audit: one row of scale-relevant stats per query.

Dumps PLANS.md — for every registered query, counts of the plan
features that decide 100 TB behavior: exchanges (shuffles), broadcast
vs sort-merge joins, whole-stage-codegen coverage, pushed filters,
Expand, and the scale-killer operators (CartesianProduct /
BroadcastNestedLoopJoin). The table makes plan regressions reviewable
in a diff the same way CORRECTNESS_r*.json makes answer regressions
reviewable; tests/test_plans.py pins the hard rules, this shows the
whole surface.

Usage: python tools/plan_audit.py [sf_dir] [out_md]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from yahoofinancedatalake_spark.queries.pack import QUERIES  # noqa: E402
from yahoofinancedatalake_spark.session import get_spark  # noqa: E402

#: queries that execute work at plan-build time (streaming memory-sink
#: materialization, on-disk upsert round-trips) — the physical plan of
#: the returned frame is a memory/local scan, not the interesting part
MATERIALIZING = {
    "stream_daily_avg_batch_eq",
    "stream_sessions_batch_eq",
    "stream_dedup_batch_eq",
    "stream_attribution_batch_eq",
    "stream_custom_state_batch_eq",
    "stream_enrich_batch_eq",
    "upsert_rows_eq",
}


def audit_one(spark, name: str) -> dict | None:
    if name in MATERIALIZING:
        return None
    df = QUERIES[name].spark(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "query": name,
        "exchanges": plan.count("Exchange"),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "codegen": plan.count("WholeStageCodegen"),
        "pushed": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "expand": plan.count("Expand"),
        "killers": plan.count("CartesianProduct")
        + plan.count("BroadcastNestedLoopJoin"),
        "take_ordered": plan.count("TakeOrderedAndProject"),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "PLANS.md"
    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name in QUERIES:
        try:
            r = audit_one(spark, name)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            return 1
        if r:
            rows.append(r)
            print(f"{name}: x={r['exchanges']} bhj={r['bhj']} "
                  f"smj={r['smj']} killers={r['killers']}")
    with open(out, "w") as f:
        f.write(
            "# Physical-plan audit\n\n"
            f"Per-query scale-relevant plan stats at `{sf_dir}` "
            "(driver-shaped session). Regenerate: "
            "`python tools/plan_audit.py`.\n\n"
            "Columns: shuffles (Exchange), broadcast joins, sort-merge "
            "joins, whole-stage-codegen spans, parquet pushdown, "
            "Expand ops, scale-killers (CartesianProduct+BNLJ — "
            "nonzero only for the documented brute-force kernels), "
            "TakeOrderedAndProject top-k.\n\n"
            "| query | shuffles | BHJ | SMJ | codegen | pushdown "
            "| expand | killers | topk |\n"
            "|---|---|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write(
                f"| {r['query']} | {r['exchanges']} | {r['bhj']} "
                f"| {r['smj']} | {r['codegen']} "
                f"| {'y' if r['pushed'] else ''} | {r['expand']} "
                f"| {r['killers']} | {r['take_ordered']} |\n"
            )
        n_killer = sum(1 for r in rows if r["killers"])
        f.write(
            f"\n{len(rows)} queries audited "
            f"({len(MATERIALIZING)} materializing entries skipped — "
            "streaming memory-sink/upsert round-trips whose returned "
            "frame is a memory scan); "
            f"{n_killer} with scale-killer operators (all documented "
            "brute-force baselines / recall-gate ground truth).\n"
        )
    print(f"wrote {out} ({len(rows)} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
