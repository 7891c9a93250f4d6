"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compares row count,
column names, and an order-insensitive value hash (columns sorted by
name, rows sorted, floats rounded to 6 significant places — a
slightly *stricter* mimic than the driver so passing here should pass
there).

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from datetime import date, datetime

import duckdb

sys.path.insert(0, "/root/repo")

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from yahoofinancedatalake_spark.schemas import TESTDATA_TABLES  # noqa: E402
from yahoofinancedatalake_spark.session import drain_if_pressured, get_spark  # noqa: E402


def _norm(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        if v == 0:
            return "0"
        return f"{v:.6g}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d") + " 00:00:00.000000"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, oracles = queries(), oracle_sql()
    failed = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        # run each query against cold storage, like the driver does —
        # persisted intermediates from earlier queries must not leak
        spark.catalog.clearCache()
        # drain the ContextCleaner backlog (localCheckpoint blocks,
        # broadcast remnants) whenever driver-heap pressure builds —
        # same hygiene as bench.py, fired on measured pressure rather
        # than a fixed cadence
        drain_if_pressured(spark)
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            if not srows:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = list(rel.columns)
            otypes = [str(t) for t in rel.types]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failed.append(name)
            continue
        problems = []
        # the driver's value hash renders DuckDB INT128/DECIMAL
        # differently from Spark's long — an un-cast SUM(BIGINT) is a
        # guaranteed driver hash-mismatch even when values are equal
        # (the round-4 13-query failure class). Hard-fail it here.
        widetyped = [
            f"{c}:{t}"
            for c, t in zip(ocols, otypes)
            if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL")
        ]
        if widetyped:
            problems.append(
                "oracle emits driver-unsafe column types "
                f"{widetyped} — wrap the aggregate in "
                "CAST(... AS BIGINT/DOUBLE)"
            )
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema {sorted(scols)} != {sorted(ocols)}")
        if not problems:
            sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
            if sh != oh:
                problems.append(f"value hash {sh} != {oh}")
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = sorted("|".join(_norm(r[i]) for i in order) for r in srows)
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                oset = sorted("|".join(_norm(r[i]) for i in oorder) for r in orows)
                for a, b in zip(sset, oset):
                    if a != b:
                        problems.append(f"  first diff:\n  spark : {a}\n  oracle: {b}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"ok    {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
    # denominator = queries actually executed, so a filtered run can't
    # read as a clean full pass
    print(f"\n{n_run - len(failed)}/{n_run} passed"
          + ("" if n_run == len(qs) else f" (of {len(qs)} registered)"))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
