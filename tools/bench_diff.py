"""Compare two bench.py JSON artifacts query-by-query.

Makes round-over-round performance review systematic instead of
eyeballed: prints every query whose warm time moved more than
``--ratio`` (default 2.0) between the two runs, plus totals for the
shared subset — the same adjudication the r5/r6 VERDICTs did by hand
(cold-start vs real regression vs GC transient).

Usage::

    python tools/bench_diff.py OLD.json NEW.json [--ratio 2.0]

Exit status 1 when any shared query regressed beyond the ratio
(improvements and new/removed queries are notes), so CI can gate on
it next to ``plan_audit.py --diff``.
"""

from __future__ import annotations

import json
import os
import re
import sys

#: ignore sub-second jitter: a 0.2s -> 0.5s move is scheduler noise,
#: not a regression worth failing a gate over
MIN_ABS_S = 1.0


def _registry_names() -> set[str] | None:
    """Query names from the repo's registry — the ALLOWLIST for the
    truncated-tail parse. A denylist of bench's scalar fields rots:
    any numeric scalar a future round adds to the bench line would
    silently be diffed as a query. Returns None when the registry
    can't import (standalone copy of this tool) — the caller falls
    back to the scalar denylist then."""
    try:
        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        from yahoofinancedatalake_spark.queries.pack import (  # noqa: PLC0415
            QUERIES,
        )

        return set(QUERIES)
    except Exception:
        return None


def load(path: str) -> dict:
    """Accept a raw bench line, a file that embeds it among logs, or
    a driver-truncated ``BENCH_r*.json`` artifact.

    The driver stores only the TAIL of the bench line (``{"n": ...,
    "tail": "...", "parsed": null}``), so a committed round artifact
    has no parseable JSON object — fall back to regex-extracting the
    ``"query": seconds`` pairs that survived truncation and diff the
    shared subset (the same partial-tail adjudication the r7 judge
    did by hand across round tails)."""
    with open(path) as f:
        text = f.read()
    m = re.search(r'\{"metric".*', text)
    if m:
        return json.loads(m.group(0))
    try:
        artifact = json.loads(text)
    except ValueError:
        artifact = None
    if isinstance(artifact, dict) and isinstance(artifact.get("tail"), str):
        pairs = re.findall(
            r'"([A-Za-z0-9_]+)":\s*([0-9]+(?:\.[0-9]+)?)', artifact["tail"]
        )
        # the tail is an arbitrary character cut, but a chopped first
        # name can never alias another query: the pattern requires
        # the OPENING quote, and a cut landing inside '"ivfpq_topk"'
        # leaves 'pq_topk":' with no opening quote — unmatched (the
        # committed r5 tail starts 'te_supplier": 1.433' and is
        # correctly skipped), so every captured name is complete
        known = _registry_names()
        if known is not None:
            queries = {k: float(v) for k, v in pairs if k in known}
        else:
            # standalone fallback: drop the bench line's own scalar
            # fields (everything the output JSON carried beside
            # per-query seconds as of r8) and the artifact's fields
            queries = {
                k: float(v)
                for k, v in pairs
                if k not in {
                    "value", "sf", "n", "rc", "cpus",
                    "ann_recall_at_5", "tpch_suite_s", "tpch_suite_n",
                    "operator_tier_s", "gate_tier_s", "gate_tier_n",
                    "gc_drains",
                }
            }
        if queries:
            print(
                f"note  {path}: driver-truncated artifact — diffing the "
                f"{len(queries)} queries visible in its tail"
            )
            return {"queries": queries, "_partial": True}
    raise SystemExit(f"no bench JSON line found in {path}")


#: the registry's gate-tier convention (_registry._GATE_SUFFIX) —
#: applied to the ARTIFACT's own names rather than via a registry
#: intersection, so an old artifact with since-renamed queries still
#: tiers its names the way its own bench run did
_GATE_PAT = re.compile(r"(_batch_eq|_eq|_gate|_accuracy|_recall|_ndcg)$")
_GATE_EXTRA = {
    "prep_stage_counts",
    "incremental_prep_counts",
    "prep_stage_counts_winnow",
    "prep_stage_counts_hybrid",
    "prep_stage_counts_paragraph",
}


def _gate_names(names: set[str]) -> set[str]:
    """Gate-tier subset of ``names`` (see _registry.gate_tier_names)."""
    return {n for n in names if _GATE_PAT.search(n)} | (names & _GATE_EXTRA)


def diff(old: dict, new: dict, ratio: float) -> tuple[list[str], list[str]]:
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    gates = _gate_names(set(shared))
    # bench.py's in-run stall adjudication (VERDICT r10 #2): a flag
    # whose fresh-subprocess solo probe came back in band is the
    # box's documented intermittent stall, not a plan regression —
    # the exoneration that used to take a manual re-run per flag.
    # Provenance guard (ADVICE r11): bench.py flags against the
    # committed bench_baseline.json, but THIS diff may compare a
    # different OLD artifact — so the verdict string is not trusted;
    # in-band-ness is re-derived from the recorded solo_s against
    # OUR old side with the same gate rule. (A query bench.py never
    # probed — in band vs baseline, >gate vs this OLD — has no
    # solo_s and stays a regression to re-run: conservative.)
    adj = new.get("adjudications") or {}
    regressions, notes = [], []
    for name in shared:
        a, b = oq[name], nq[name]
        tier = "gate" if name in gates else "operator"
        if b > a * ratio and b - a > MIN_ABS_S:
            verdict = adj.get(name, {})
            solo = verdict.get("solo_s")
            if solo is not None and not (
                solo > a * ratio and solo - a > MIN_ABS_S
            ):
                notes.append(
                    f"{name} [{tier}]: {a:.2f}s -> {b:.2f}s in-bench, "
                    f"ADJUDICATED host_stall (solo {solo:.2f}s in band "
                    f"vs this old side; probe baseline "
                    f"{verdict.get('baseline_src', 'unrecorded')})"
                )
            else:
                regressions.append(
                    f"{name} [{tier}]: {a:.2f}s -> {b:.2f}s ({b/a:.1f}x)"
                )
        elif a > b * ratio and a - b > MIN_ABS_S:
            notes.append(f"{name}: improved {a:.2f}s -> {b:.2f}s")
    # vs a driver-truncated side, "not present" just means "fell
    # outside the stored tail" — presence deltas are only meaningful
    # against the FULL line on the corresponding side
    if not old.get("_partial"):
        for name in sorted(set(nq) - set(oq)):
            notes.append(f"{name}: new ({nq[name]:.2f}s)")
    if not new.get("_partial"):
        for name in sorted(set(oq) - set(nq)):
            notes.append(f"{name}: REMOVED (was {oq[name]:.2f}s)")
    tot_o = sum(oq[n] for n in shared)
    tot_n = sum(nq[n] for n in shared)
    notes.append(
        f"shared subset ({len(shared)} queries): "
        f"{tot_o:.1f}s -> {tot_n:.1f}s"
    )
    # Tier totals (VERDICT r9 #2): the gate tier's composed harnesses
    # carry most of the absolute noise (±20% of a 30s gate = ±6s), so
    # the operator-tier total is the clean round-over-round operator
    # signal — review each on its own scale instead of one number.
    for tier, members in (
        ("operator tier", [n for n in shared if n not in gates]),
        ("gate tier", [n for n in shared if n in gates]),
    ):
        to = sum(oq[n] for n in members)
        tn = sum(nq[n] for n in members)
        notes.append(
            f"{tier} ({len(members)} queries): {to:.1f}s -> {tn:.1f}s"
        )
    return regressions, notes


def main() -> int:
    argv = sys.argv[1:]
    args: list[str] = []
    ratio = 2.0
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--ratio"):
            if "=" in a:
                ratio = float(a.split("=", 1)[1])
            elif i + 1 < len(argv):
                i += 1
                ratio = float(argv[i])
            else:
                print(__doc__)
                return 2
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        print(__doc__)
        return 2
    regressions, notes = diff(load(args[0]), load(args[1]), ratio)
    for n in notes:
        print(f"note  {n}")
    for r in regressions:
        print(f"REGRESSION  {r}")
    print(f"{len(regressions)} regressions beyond {ratio}x")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
