"""yahoofinancedatalake_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark implementation of the query and
data-processing capabilities of the reference data lake
``andranik7/YahooFinanceDataLake`` (medallion ETL, relational and
windowed analytic queries, per-group forecasting), extended with
large-scale training-data-pipeline operators (deduplication,
similarity search, text analysis, multimodal column plumbing).

Everything here is declarative DataFrame/SQL on Catalyst; Python UDFs
appear only as Arrow-batched Pandas UDFs where built-ins genuinely
cannot express the semantics (per-group model fitting, lexicon
scoring).
"""

__version__ = "0.1.0"

from yahoofinancedatalake_spark.session import get_spark  # noqa: F401
