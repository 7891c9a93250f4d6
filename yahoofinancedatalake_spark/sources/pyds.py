"""Python DataSource API ingestion (§2.1 S6-S8 as first-class formats).

The replayable REST sources in :mod:`.replay` are driver-side
callables; this module lifts them into Spark 4's Python DataSource
API so ingestion becomes a real ``spark.read.format(...)`` /
``spark.readStream.format(...)`` — planned, partitioned, and executed
by the engine like any other scan:

- :class:`StockHistoryDataSource` (``format("stock_history")``) —
  batch OHLCV ingestion with ONE INPUT PARTITION PER SYMBOL: the
  per-ticker fetch loop of the reference
  (scripts/ingestion/yahoo_stocks.py:18-44) becomes partition-parallel
  executor work instead of a serial driver loop. At real scale each
  partition is an independent rate-limit domain (one ticker's API
  budget), so symbol-partitioning is the natural unit of parallel
  ingestion, and a 5000-ticker universe fans out across the cluster.
- :class:`NewsWindowsDataSource` (``format("news_windows")``) — the
  month-paged Finnhub fetch (finnhub_news.py:139-188) as a STREAMING
  source: the pagination cursor IS the stream offset ({"window": i}
  walking backward from ``now``), so every micro-batch ingests one
  month window for every symbol, checkpoint/restart resumes from the
  last committed window, and the provider's duplicate-article quirk
  is handled downstream with ``dropDuplicates(["id"])`` — the A8
  cross-window dedup as engine semantics instead of a driver-side
  ``seen`` set.

Both read local JSONL fixtures (network fetches are
non-deterministic at source — SURVEY.md §7 hard part 3); a real REST
deployment swaps the fixture read in ``read()`` for the HTTP call
and keeps the partitioning/offset plan unchanged.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

STOCK_SCHEMA = (
    "symbol string, date string, open double, high double, low double, "
    "close double, volume long, fetched_at string"
)

NEWS_SCHEMA = (
    "id string, symbol string, title string, summary string, "
    "pub_date string, provider string, window_from string, "
    "window_to string"
)


def _load_jsonl(path: str) -> list[dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


class _SymbolPartition(InputPartition):
    def __init__(self, symbol: str):
        self.symbol = symbol


class _StockHistoryReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.symbols = options.get("symbols")
        self._pushed_symbols: "set[str] | None" = None

    def pushFilters(self, filters):  # noqa: N802
        """Planning-time filter pushdown (Spark 4.1 Python DataSource
        API): ``symbol = 'X'`` / ``symbol IN (...)`` predicates prune
        INPUT PARTITIONS before any executor starts — for a REST
        deployment that is the difference between calling the API for
        one ticker and calling it for the whole universe. Every
        filter is also returned for Spark to re-apply (pruning here
        is partition-level, and double-filtering is free)."""
        from pyspark.sql.datasource import EqualTo, In  # noqa: PLC0415

        pushed: set[str] = set()
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("symbol",):
                pushed.add(f.value)
            elif isinstance(f, In) and f.attribute == ("symbol",):
                pushed.update(f.value)
            else:
                continue
        if pushed:
            self._pushed_symbols = pushed
        return filters  # conservative: Spark re-checks everything

    def partitions(self):
        if self.symbols:
            syms = [s for s in self.symbols.split(",") if s]
        else:
            # planning-time metadata listing (the analog of file
            # listing for a file source): discover the symbol universe
            # driver-side, ship one partition per symbol
            syms = sorted({r["symbol"] for r in _load_jsonl(self.path)})
        if self._pushed_symbols is not None:
            syms = [s for s in syms if s in self._pushed_symbols]
        if not syms:
            # a filter can prune EVERY partition; PySpark substitutes
            # [None] for an empty partition list, so hand it one
            # explicit no-match partition instead of crashing in read()
            return [_SymbolPartition("")]
        return [_SymbolPartition(s) for s in syms]

    def read(self, partition: _SymbolPartition) -> Iterator[tuple]:
        if not partition.symbol:
            return  # no-match partition → empty result, not a crash
        # executor-side: one symbol's full history (the per-ticker
        # REST call in a real deployment)
        for r in _load_jsonl(self.path):
            if r["symbol"] == partition.symbol:
                yield (
                    r["symbol"], r["date"], float(r["open"]),
                    float(r["high"]), float(r["low"]), float(r["close"]),
                    int(r["volume"]), r["fetched_at"],
                )


class StockHistoryDataSource(DataSource):
    """``spark.read.format("stock_history").option("path", f).load()``."""

    @classmethod
    def name(cls) -> str:
        return "stock_history"

    def schema(self) -> str:
        return STOCK_SCHEMA

    def reader(self, schema) -> _StockHistoryReader:
        return _StockHistoryReader(self.options)


class _NewsWindowsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        from yahoofinancedatalake_spark.sources.replay import (  # noqa: PLC0415
            month_ranges,
        )

        self.path = options["path"]
        self.now = options["now"]
        self.months_back = int(options.get("months_back", "12"))
        self.windows = month_ranges(self.now, self.months_back)

    def initialOffset(self) -> dict:  # noqa: N802
        return {"window": 0}

    def _window_rows(self, i: int) -> list[tuple]:
        frm, to = self.windows[i]
        rows = _load_jsonl(self.path)
        hits = [r for r in rows if frm <= r["pub_date"][:10] <= to]
        if i == 0:
            # provider quirk replay (finnhub_news.py / replay.py):
            # stale epoch-zero timestamps are served in the newest
            # window; the silver >=2020 filter culls them downstream
            hits = hits + [
                r for r in rows if r["pub_date"][:10] < "2020-01-01"
            ]
        return [
            (
                str(r["id"]), r["symbol"], r["title"], r["summary"],
                r["pub_date"], r.get("provider"), frm, to,
            )
            for r in hits
        ]

    def read(self, start: dict) -> tuple:
        i = start["window"]
        if i >= len(self.windows):
            return iter([]), start  # pagination exhausted
        return iter(self._window_rows(i)), {"window": i + 1}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        # deterministic replay for recovery: re-serve the committed
        # window range from the fixture
        out: list[tuple] = []
        for i in range(start["window"], end["window"]):
            out.extend(self._window_rows(i))
        return iter(out)

    def commit(self, end: dict) -> None:
        pass  # fixture replay has nothing to clean up


class NewsWindowsDataSource(DataSource):
    """``spark.readStream.format("news_windows")`` — one micro-batch
    per pagination window."""

    @classmethod
    def name(cls) -> str:
        return "news_windows"

    def schema(self) -> str:
        return NEWS_SCHEMA

    def simpleStreamReader(self, schema) -> _NewsWindowsStreamReader:  # noqa: N802
        return _NewsWindowsStreamReader(self.options)


def register_python_sources(spark) -> None:
    """Register both formats on a session (idempotent). Also enables
    Python-source filter pushdown (off by default in Spark 4.1;
    without it a reader that implements ``pushFilters`` fails at
    planning rather than silently skipping pruning)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(StockHistoryDataSource)
    spark.dataSource.register(NewsWindowsDataSource)
    spark.dataSource.register(JsonlSinkDataSource)


# ---------------------------------------------------------------------------
# Batch writer — the commit-protocol half of the DataSource API
# ---------------------------------------------------------------------------


class _JsonlCommit(WriterCommitMessage):
    """One per write task: where the task's temp file landed and how
    many rows it holds. Only the DRIVER sees all of these together —
    that asymmetry is the whole two-phase-commit design."""

    def __init__(self, tmp_name: str, n_rows: int):
        self.tmp_name = tmp_name
        self.n_rows = n_rows


class _JsonlWriter(DataSourceWriter):
    """Task-side JSONL writer with a FileOutputCommitter-style
    protocol: every task writes to ``_temporary/`` under a unique
    name and reports it in its commit message; the driver's
    ``commit`` renames the complete set into place and drops a
    ``_SUCCESS`` marker, ``abort`` deletes the orphans. A reader
    therefore never observes a half-written table — the exact
    guarantee the reference leans on FileOutputCommitter v2 for
    (format_to_parquet.py:36-45), here implemented explicitly."""

    def __init__(self, options: dict):
        import uuid  # noqa: PLC0415

        self.path = options["path"]
        # per-JOB attempt dir (FileOutputCommitter's _temporary/<job>/
        # design): the id is minted driver-side and ships in the
        # closure, so every task of this job writes under one dir that
        # commit/abort can delete WHOLESALE — zombie files from task
        # attempts that died mid-write (whose names the driver never
        # learns) are cleaned up too, and concurrent jobs on the same
        # table never collide
        self.job_id = uuid.uuid4().hex

    def _job_dir(self) -> str:
        import os  # noqa: PLC0415

        return os.path.join(self.path, "_temporary", self.job_id)

    def write(self, iterator) -> _JsonlCommit:
        import os  # noqa: PLC0415
        import uuid  # noqa: PLC0415

        tmp_dir = self._job_dir()
        os.makedirs(tmp_dir, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(tmp_dir, name), "w") as f:
            for row in iterator:
                # recursive: a plain asDict leaves nested Rows intact
                # and default=str would stringify them into reprs —
                # silent corruption for struct columns
                f.write(
                    json.dumps(row.asDict(recursive=True), default=str)
                    + "\n"
                )
                n += 1
        return _JsonlCommit(name, n)

    def _cleanup_job_dir(self) -> None:
        import os  # noqa: PLC0415
        import shutil  # noqa: PLC0415

        shutil.rmtree(self._job_dir(), ignore_errors=True)
        try:  # remove _temporary itself once the last job leaves
            os.rmdir(os.path.join(self.path, "_temporary"))
        except OSError:
            pass

    def commit(self, messages) -> None:
        import os  # noqa: PLC0415

        tmp_dir = self._job_dir()
        total = 0
        for m in messages:
            if m is None:
                continue  # Spark passes None for failed tasks
            os.replace(
                os.path.join(tmp_dir, m.tmp_name),
                os.path.join(self.path, m.tmp_name),
            )
            total += m.n_rows
        self._cleanup_job_dir()
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(str(total))

    def abort(self, messages) -> None:
        # messages may contain None for failed tasks; the job-dir
        # rmtree removes every attempt file regardless of whether its
        # task ever reported a commit message
        self._cleanup_job_dir()


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonl_sink").option("path", p).save()`` —
    the writer leg of the Python DataSource API (reader, stream
    reader, filter pushdown, and now the two-phase-commit writer)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> _JsonlWriter:
        if overwrite:
            raise NotImplementedError(
                "jsonl_sink supports append mode only; full-refresh "
                "semantics live in parquet_io.write_parquet"
            )
        return _JsonlWriter(self.options)
