"""Named analytic query pack: the driver-checkable surface of the engine.

Every operator family from SURVEY.md §2 (plus the LLM-data-pipeline
extensions) has at least one named query here, each with a PySpark
implementation and — where SQL-expressible — a DuckDB oracle. The
driver contract in ``__spark_entry__.py`` re-exports this registry.
"""

from yahoofinancedatalake_spark.queries.pack import (  # noqa: F401
    QUERIES,
    Query,
    flagship,
)
