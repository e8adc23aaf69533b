"""Physical-plan introspection (SURVEY.md §4 — "don't defeat Catalyst").

The engine writes zero custom optimizer rules; its optimization contract
is that every query PRESERVES Catalyst's built-in rewrites. These helpers
read the formatted physical plan so tests can pin the properties that
matter at 100 TB:

  * PushedFilters reach the parquet scan (row-group skipping);
  * ReadSchema is pruned to referenced columns (column pruning);
  * dimension joins broadcast, fact-fact joins sort-merge;
  * top-k plans as TakeOrderedAndProject / WindowGroupLimit
    (no global sort, per-group pruning);
  * hot paths run inside WholeStageCodegen.

A plan regression (e.g. an accidental Python UDF swallowing a filter)
fails tests/test_plans.py before it ever hits the benchmark.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain() text, as a string (explain() itself only prints)."""
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter expressions pushed into the parquet scan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_string(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct bodies, one per file scan (column-pruning view)."""
    return [
        m.group(1)
        for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan_string(df))
    ]


def scan_columns(df: DataFrame) -> set[str]:
    cols: set[str] = set()
    for schema in read_schemas(df):
        for field in schema.split(","):
            if ":" in field:
                cols.add(field.split(":", 1)[0].strip())
    return cols


def join_strategies(df: DataFrame) -> list[str]:
    """Physical join operators in plan order."""
    pattern = (
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)"
    )
    return re.findall(pattern, plan_string(df))


def has_operator(df: DataFrame, name: str) -> bool:
    return name in plan_string(df)


def codegen_operator_count(df: DataFrame) -> int:
    """Operators running inside WholeStageCodegen.

    The formatted plan marks codegen'd operators with a ``*`` prefix
    (``* HashAggregate (9)``); under AQE the markers appear only in the
    final plan, i.e. after the query has run once.
    """
    return len(re.findall(r"[+:]- \* \w+", plan_string(df)))


def exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (the scale currency to minimize).

    Counts on the SIMPLE-mode plan, where shuffle exchanges print inline
    as ``Exchange hashpartitioning/rangepartitioning/SinglePartition``
    (formatted mode moves the partitioning to an ``Arguments:`` detail
    line, which silently made this regex count 0 for every plan — caught
    when a deliberately-1-shuffle contract read 0). BroadcastExchange is
    intentionally NOT counted: broadcasts move the small side only.
    """
    return len(
        re.findall(r"\bExchange (?:hash|range|Single)", plan_string(df, "simple"))
    )
