"""Repo-root entry point: ``python pipeline.py run --root /tmp/lake``.

Thin shim over :mod:`yahoofinancedatalake_spark.pipeline` (the Airflow-DAG
analog: ingest → format → combine → predict → serve).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from yahoofinancedatalake_spark.pipeline import main  # noqa: E402

if __name__ == "__main__":
    main()
