"""Per-stage metrics from a Spark event log — the diagnosis tool.

Parses an event-log directory (rolling v2, zstd) or single file and
prints, for every completed stage: wall duration, task count, total
executor run time, task-attributed JVM GC time, and shuffle
read/write bytes. This is how the r7 prefix-filter bimodality was
root-caused (three concurrent explode stages showing up to 5.8 s of
task GC) — kept as a tool so the next "query X is sometimes 5x
slower" gets measured, not guessed.

Usage::

    # run the workload with an event log first:
    #   extra_conf={"spark.eventLog.enabled": "true",
    #               "spark.eventLog.dir": "file:///tmp/spark-events"}
    python tools/stage_metrics.py /tmp/spark-events/<app-dir-or-file> \
        [--top 20] [--sort dur|gc|shuffle]
"""

from __future__ import annotations

import glob
import json
import os
import sys


def _open_log(path: str):
    if path.endswith(".zst") or path.endswith(".zstd"):
        import io  # noqa: PLC0415
        import subprocess  # noqa: PLC0415

        p = subprocess.Popen(
            ["zstd", "-dc", path], stdout=subprocess.PIPE
        )
        return io.TextIOWrapper(p.stdout, encoding="utf-8")
    return open(path, encoding="utf-8")


def _log_files(path: str) -> list[str]:
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "events*")))
        if not files:
            # a standard (non-rolling) log dir holds files named by
            # app id — fall back to every regular file so the tool
            # never silently reports "0 stages" on a real log
            files = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if os.path.isfile(os.path.join(path, f))
                and not f.startswith(".")
                and not f.startswith("appstatus")
            )
        if not files:
            raise SystemExit(f"no event-log files found under {path}")
        return files
    return [path]


def stage_rows(path: str) -> list[dict]:
    """One dict per SparkListenerStageCompleted, submission-ordered."""
    rows = []
    for f in _log_files(path):
        with _open_log(f) as fh:
            for line in fh:
                try:
                    e = json.loads(line)
                except ValueError:
                    continue
                if e.get("Event") != "SparkListenerStageCompleted":
                    continue
                si = e["Stage Info"]
                acc = {
                    a["Name"]: a.get("Value")
                    for a in si.get("Accumulables", [])
                }
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                rows.append(
                    {
                        "stage": si["Stage ID"],
                        "attempt": si.get("Stage Attempt ID", 0),
                        "name": si.get("Stage Name", "")[:60],
                        "dur_s": round((comp - sub) / 1000.0, 2)
                        if sub and comp
                        else None,
                        "tasks": si.get("Number of Tasks"),
                        "run_s": round(
                            (acc.get("internal.metrics.executorRunTime") or 0)
                            / 1000.0,
                            2,
                        ),
                        "gc_s": round(
                            (acc.get("internal.metrics.jvmGCTime") or 0)
                            / 1000.0,
                            2,
                        ),
                        "shuf_r_mb": round(
                            (
                                acc.get(
                                    "internal.metrics.shuffle.read"
                                    ".remoteBytesRead"
                                )
                                or 0
                            )
                            / 1048576.0
                            + (
                                acc.get(
                                    "internal.metrics.shuffle.read"
                                    ".localBytesRead"
                                )
                                or 0
                            )
                            / 1048576.0,
                            2,
                        ),
                        "shuf_w_mb": round(
                            (
                                acc.get(
                                    "internal.metrics.shuffle.write"
                                    ".bytesWritten"
                                )
                                or 0
                            )
                            / 1048576.0,
                            2,
                        ),
                        "submitted": sub,
                    }
                )
    # rolling logs can repeat a completion across files — keep one row
    # per (stage, attempt), last occurrence wins (it has final metrics)
    dedup = {(r["stage"], r["attempt"]): r for r in rows}
    rows = sorted(dedup.values(), key=lambda r: r["submitted"] or 0)
    return rows


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        print(__doc__)
        return 2
    top = 20
    sort = "dur"
    for i, a in enumerate(sys.argv):
        if a == "--top":
            top = int(sys.argv[i + 1])
        elif a == "--sort":
            sort = sys.argv[i + 1]
    key = {"dur": "dur_s", "gc": "gc_s", "shuffle": "shuf_w_mb"}[sort]
    rows = stage_rows(args[0])
    rows_sorted = sorted(rows, key=lambda r: -(r[key] or 0))[:top]
    print(
        f"{'stage':>6} {'dur_s':>7} {'tasks':>5} {'run_s':>8} "
        f"{'gc_s':>6} {'shufR_MB':>9} {'shufW_MB':>9}  name"
    )
    for r in rows_sorted:
        print(
            f"{r['stage']:>6} {r['dur_s']!s:>7} {r['tasks']!s:>5} "
            f"{r['run_s']:>8} {r['gc_s']:>6} {r['shuf_r_mb']:>9} "
            f"{r['shuf_w_mb']:>9}  {r['name']}"
        )
    tot_gc = sum(r["gc_s"] for r in rows)
    tot_run = sum(r["run_s"] for r in rows)
    print(
        f"\n{len(rows)} stages; total executor run {tot_run:.1f}s, "
        f"task-attributed GC {tot_gc:.1f}s "
        f"({100 * tot_gc / tot_run if tot_run else 0:.1f}%)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
