"""PySpark-native analytics engine (spark-graft build).

A clean-room, Spark-first engine providing the declared capability surface of
SURVEY.md §2 (the reference snapshot at /root/reference is a 2-line README with
no code — /root/reference/README.md:1-2 — so the surface is the survey's
normative contract, not a port).

Layout:
    session.py    SparkSession construction + runtime config contract
    sources/      table schemas, parquet/csv/json load & sink helpers
    operators/    relational operators (§2.1-2.7) + LLM-pipeline ops (§2.11)
    functions/    scalar-function and UDF surface (§2.8, §2.10)
    streaming/    Structured Streaming operators + batch equivalents (§2.9)
    plans/        physical-plan introspection helpers (explain/pushdown checks)
    registry.py   query + oracle registry backing __spark_entry__.py
"""

from .session import configure, get_spark
from .sources.tables import load, table_names

__all__ = ["configure", "get_spark", "load", "table_names"]
