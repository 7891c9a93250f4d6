"""One-command round hygiene gate (VERDICT r7 #4).

Runs, in order, every check a round is supposed to open and close
with, and fails loud on the first red:

1. full oracle selfcheck at sf0.01 (the driver-gate mimic),
2. parity sweep at sf0.1 (10× the gate scale; writes
   PARITY_SWEEP.json),
3. ``plan_audit.py --diff`` against the committed PLANS.md (plan
   structure regression gate),
4. ``bench_diff.py`` of a fresh ``bench.py`` run against the newest
   committed ``BENCH_r*.json`` (per-query >2× regression gate).

Each step is a subprocess so one step's Spark session / GC state
can't contaminate the next's timings, and the transcript of every
step streams through (nothing is swallowed — a failure's context is
on screen). Exit status is nonzero if ANY step failed; steps after a
failure still run by default so one pass reports everything
(``--fail-fast`` stops at the first red).

Usage::

    python tools/round_gate.py [--fail-fast] [--skip bench] [--skip sweep]

``--skip X`` (repeatable; X in {selfcheck, sweep, plans, bench})
drops a step — e.g. ``--skip bench`` while the box is busy with
another JVM, since the bench gate is timing-sensitive.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _newest_bench_artifact() -> str | None:
    # prefer the committed FULL bench line (all queries) over the
    # driver's truncated BENCH_r*.json tails — bench_diff handles
    # both, but the full baseline covers the whole registry
    full = os.path.join(ROOT, "bench_baseline.json")
    if os.path.exists(full):
        return full

    def rnum(p: str) -> int:
        m = re.search(r"_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    paths = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")), key=rnum)
    return paths[-1] if paths else None


def _run(title: str, cmd: list[str]) -> bool:
    print(f"\n=== round_gate: {title}: {' '.join(cmd)}", flush=True)
    t0 = time.perf_counter()
    rc = subprocess.call(cmd, cwd=ROOT)
    dt = time.perf_counter() - t0
    status = "OK" if rc == 0 else f"FAILED rc={rc}"
    print(f"=== round_gate: {title}: {status} ({dt:.0f}s)", flush=True)
    return rc == 0


_VALID_SKIPS = {"selfcheck", "sweep", "plans", "bench"}


def main() -> int:
    args = sys.argv[1:]
    fail_fast = "--fail-fast" in args
    skips: set[str] = set()
    for i, a in enumerate(args):
        if a == "--skip":
            if i + 1 >= len(args) or args[i + 1].startswith("--"):
                print("usage: --skip {selfcheck|sweep|plans|bench}")
                return 2
            skips.add(args[i + 1])
    unknown = skips - _VALID_SKIPS
    if unknown:
        print(f"unknown --skip name(s) {sorted(unknown)}; "
              f"valid: {sorted(_VALID_SKIPS)}")
        return 2

    steps: list[tuple[str, list[str]]] = []
    if "selfcheck" not in skips:
        steps.append(
            (
                "selfcheck sf0.01",
                [sys.executable, "tools/selfcheck.py", "/root/testdata/sf0.01"],
            )
        )
    if "sweep" not in skips:
        steps.append(
            (
                "parity sweep sf0.1",
                [sys.executable, "tools/parity_sweep.py", "/root/testdata/sf0.1"],
            )
        )
    if "plans" not in skips:
        steps.append(
            (
                "plan audit --diff",
                [sys.executable, "tools/plan_audit.py", "--diff"],
            )
        )

    results: dict[str, bool] = {}
    for title, cmd in steps:
        results[title] = _run(title, cmd)
        if fail_fast and not results[title]:
            break

    if "bench" not in skips and (not fail_fast or all(results.values())):
        baseline = _newest_bench_artifact()
        if baseline is None:
            print("=== round_gate: bench diff: SKIPPED (no BENCH_r*.json)")
        else:
            # fresh bench into a temp file, then diff vs the committed
            # artifact — the same >2x adjudication the judge runs
            with tempfile.NamedTemporaryFile(
                "w", suffix=".json", prefix="bench_gate_", delete=False
            ) as tf:
                fresh = tf.name
            with open(fresh, "w") as out:
                print(f"\n=== round_gate: bench -> {fresh}", flush=True)
                rc = subprocess.call(
                    [sys.executable, "bench.py"], cwd=ROOT, stdout=out
                )
            if rc != 0:
                results["bench run"] = False
                print(f"=== round_gate: bench run: FAILED rc={rc}")
            else:
                results[f"bench diff vs {os.path.basename(baseline)}"] = _run(
                    "bench diff",
                    [
                        sys.executable,
                        "tools/bench_diff.py",
                        baseline,
                        fresh,
                    ],
                )
            # keep the fresh bench line only when the bench step
            # itself failed (the regression's evidence) — an
            # unrelated earlier red must not litter tempdir
            bench_ok = results.get("bench run", True) and all(
                ok for t, ok in results.items() if t.startswith("bench diff")
            )
            if bench_ok:
                os.unlink(fresh)
            else:
                print(f"=== round_gate: fresh bench kept at {fresh}")

    print("\n=== round_gate summary")
    if not results:
        print("  (no steps ran — everything skipped)")
    for title, ok in results.items():
        print(f"  {'ok  ' if ok else 'FAIL'} {title}")
    # exit contract (docstring): nonzero iff a step that ran failed
    all_ok = all(results.values())
    print(f"=== round_gate: {'ALL GREEN' if all_ok else 'RED'}")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
