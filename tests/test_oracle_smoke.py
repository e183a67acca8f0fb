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
