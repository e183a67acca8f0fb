"""Oracle smoke: run a representative subset of the declared query set
against DuckDB at sf0.001 (the full gate is tools/check_oracle.py)."""

import duckdb
import pandas as pd
import pytest

from icebug_spark.catalog import TABLES
from icebug_spark.queries.registry import ALL

SUBSET = [
    "q02_groupagg_pricing",
    "q08_window_running_sum",
    "q17_events_sessionization",
    "q18_degrees",
    "q21_jaccard",
    "q24_triangle_count",
    "q28_connected_components",
    "q29_pagerank",
    "llm_dedup_exact",
    "llm_embedding_topk",
    "q115_graph_summary",
    "q121_compact_subgraph",
    "q122_partition_coarsening",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, sf_dir, oracle, name):
    fn, sql = ALL[name]
    sdf = _normalize(fn(spark, sf_dir).toPandas())
    odf = _normalize(oracle.sql(sql).df())
    assert list(sdf.columns) == list(odf.columns)
    pd.testing.assert_frame_equal(sdf, odf, check_dtype=False, check_exact=True)


def test_round_parity_varchar_decimal_hop(spark):
    """Cross-engine rounding pin (the q52 lesson): Spark's
    round(double, d) rounds the SHORTEST-REPR decimal of the double
    (BigDecimal.valueOf), so 41/640 — binary value just BELOW the
    0.0640625 tie but printed as the tie — rounds UP; DuckDB's plain
    ROUND on the exact binary value rounds DOWN. The
    VARCHAR->DECIMAL(38,25) hop reproduces Spark's semantics in DuckDB.
    Any future oracle that 6dp-rounds a quotient should use it."""
    import duckdb
    from pyspark.sql import functions as F

    spark_val = (
        spark.range(1)
        .select(F.round(F.lit(41.0) / F.sqrt(F.lit(409600.0)), 6).alias("v"))
        .collect()[0]["v"]
    )
    assert spark_val == 0.064063  # shortest-repr HALF_UP

    con = duckdb.connect()
    plain = con.sql("SELECT ROUND(41.0/SQRT(409600.0), 6)").fetchone()[0]
    hopped = con.sql(
        "SELECT CAST(ROUND(CAST(CAST(41.0/SQRT(409600.0) AS VARCHAR)"
        " AS DECIMAL(38,25)), 6) AS DOUBLE)"
    ).fetchone()[0]
    assert plain == 0.064062  # exact-binary rounding disagrees
    assert hopped == spark_val  # the hop restores parity
