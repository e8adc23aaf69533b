"""Driver-gate mirror: every registered query vs its DuckDB oracle.

For SQL-oracled queries this is a STRICT exact-value comparison (see
oracle.compare_frames) — stronger than the driver's hash, so green here
implies green there. Rows-only queries must materialize with >0 rows and
be deterministic across two runs (seeded hashing contract, SURVEY.md §7).
"""

from __future__ import annotations

import pytest

from t_mobile_data_fnt_etl_pipeline_aws_spark.oracle import compare_frames
from t_mobile_data_fnt_etl_pipeline_aws_spark.registry import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()

#: keys allowed to return an empty frame at tiny SF (none so far — keep
#: the invariant "every query demonstrates real rows" explicit).
MAY_BE_EMPTY: set[str] = set()


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_query_matches_oracle(key, spark, sf_dir, duck):
    sdf = QUERIES[key](spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if key not in MAY_BE_EMPTY:
        assert len(spark_pdf) > 0, f"{key} returned no rows at {sf_dir}"
    if key in ORACLES:
        duck_pdf = duck.execute(ORACLES[key]).df()
        diff = compare_frames(spark_pdf, duck_pdf)
        assert diff is None, f"{key}: {diff}"
    else:
        # rows-only: re-run must reproduce the identical result (determinism
        # guards the driver's cross-run hashing of rows-only outputs).
        from t_mobile_data_fnt_etl_pipeline_aws_spark.oracle import canonicalize

        again = QUERIES[key](spark, sf_dir).toPandas()
        assert canonicalize(spark_pdf) == canonicalize(again), f"{key} nondeterministic"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.queries()).issuperset(set(e.oracle_sql()))
