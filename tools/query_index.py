"""Generate QUERIES.md — the registry as a reviewable index.

One row per registered query: oracle status (hash-gated vs rows-only)
and the first sentence of its doc. Regenerate after adding queries:
``python tools/query_index.py``. The full doc text lives on each
query in ``queries/pack.py``; this is the table of contents the
driver's CORRECTNESS_r*.json rows map onto.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from yahoofinancedatalake_spark.queries.pack import QUERIES  # noqa: E402


def first_sentence(doc: str, limit: int = 160) -> str:
    s = " ".join(doc.split())
    for end in (". ", " — ", ": "):
        i = s.find(end)
        if 20 <= i <= limit:
            return s[: i + (1 if end == ". " else 0)]
    return s[:limit] + ("…" if len(s) > limit else "")


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "QUERIES.md"
    n_oracle = sum(1 for q in QUERIES.values() if q.oracle)
    with open(out, "w") as f:
        f.write(
            "# Query registry index\n\n"
            f"{len(QUERIES)} queries; {n_oracle} hash-gated against the "
            "DuckDB oracle (rows + schema + order-insensitive value "
            f"hash), {len(QUERIES) - n_oracle} rows-only by construction "
            "(non-SQL-expressible hash families / codecs — each ANN "
            "index additionally carries an oracle-gated recall row). "
            "Listed in registry order — the driver checks from the "
            "top, so the freshest queries come first. Regenerate: "
            "`python tools/query_index.py`.\n\n"
            "| # | query | oracle | what it covers |\n"
            "|---|---|---|---|\n"
        )
        for i, (name, q) in enumerate(QUERIES.items(), 1):
            kind = "hash" if q.oracle else "rows"
            f.write(
                f"| {i} | {name} | {kind} | {first_sentence(q.doc)} |\n"
            )
    print(f"wrote {out} ({len(QUERIES)} queries, {n_oracle} hash-gated)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
