"""Capture .explain("formatted") output for named queries.

Usage: python tools/capture_plans.py <outdir> <suffix> name [name ...]

Writes ``<outdir>/<name>_<suffix>.txt`` per query. Only meaningful for
queries whose registered function RETURNS the full lazy plan (the
imperative multi-action gates collapse to a local result table — for
those, capture the intermediate frames by hand and note it in the
optimization log).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yahoofinancedatalake_spark.queries.pack import QUERIES  # noqa: E402
from yahoofinancedatalake_spark.session import get_spark  # noqa: E402


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name].spark(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
