"""Zero-cost pipeline observability via ``Dataset.observe``.

The reference has no data-quality telemetry at all — failures surface
as missing Kibana panels. The engine-native answer is
``df.observe(Observation, ...aggregates)``: named aggregate metrics
accumulated ON THE SAME PASS as whatever action materializes the
frame (a sink write, a count), so row counts and null tallies for
every pipeline stage cost zero extra scans — at 100 TB an extra
``.count()`` per stage is another full pass over the stage's input;
an observation is free.

Metrics land driver-side after the action completes
(``Observation.get`` blocks until the action finishes) and are
returned as a plain dict, ready for a metrics sink / alerting rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_contract(
    df: DataFrame, not_null_cols: list[str], name: str = "contract"
) -> tuple[DataFrame, Observation]:
    """Attach row-count + per-column null-count metrics to ``df``.

    Returns the observed frame (use it in place of ``df`` for the
    downstream action) and the :class:`Observation` handle — read
    ``obs.get`` AFTER the action to receive
    ``{"rows": n, "nulls_<col>": n, ...}`` computed on that action's
    single pass.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("rows")]
    for c in not_null_cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        )
    return df.observe(obs, *metrics), obs


def assert_contract(metrics: dict, stage: str) -> None:
    """Fail loudly when a stage emits zero rows or any nulls in its
    key columns — the minimal always-on gate a scheduled pipeline
    wants on every run (a silent empty gold table is the worst
    failure mode a dashboard-backed lake has)."""
    if metrics.get("rows", 0) == 0:
        raise ValueError(f"{stage}: produced 0 rows")
    bad = {
        k: v for k, v in metrics.items()
        if k.startswith("nulls_") and v
    }
    if bad:
        raise ValueError(f"{stage}: null key columns {bad}")
