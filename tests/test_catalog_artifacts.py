"""Session-memoized derived artifacts (icebug_spark.catalog)."""

from icebug_spark.catalog import (
    build_derived_artifacts,
    derived_canonical_edges,
    derived_edges,
    derived_edges_undirected,
    derived_triangle_kernel,
    derived_weighted_edges,
)


def test_build_populates_all_memos_and_reuses(spark, sf_dir):
    build_derived_artifacts(spark, sf_dir)
    # every artifact call now returns the memoized object (identity, not
    # just equality — proves no rebuild after the concurrent warmup)
    assert derived_edges(spark, sf_dir, materialize=True) is derived_edges(
        spark, sf_dir, materialize=True
    )
    assert derived_edges_undirected(spark, sf_dir) is derived_edges_undirected(
        spark, sf_dir
    )
    assert derived_weighted_edges(spark, sf_dir) is derived_weighted_edges(
        spark, sf_dir
    )
    assert derived_canonical_edges(spark, sf_dir) is derived_canonical_edges(
        spark, sf_dir
    )
    assert derived_triangle_kernel(spark, sf_dir) is derived_triangle_kernel(
        spark, sf_dir
    )


def test_artifact_consistency(spark, sf_dir):
    build_derived_artifacts(spark, sf_dir)
    e = derived_edges(spark, sf_dir, materialize=True).count()
    eu = derived_edges_undirected(spark, sf_dir).count()
    c = derived_canonical_edges(spark, sf_dir).count()
    ew = derived_weighted_edges(spark, sf_dir).count()
    # EU = E u reverse(E): between E and 2E; C = loop-free canonical
    assert e <= eu <= 2 * e
    assert c <= eu // 2 + e  # canonical never exceeds one row per pair
    assert ew == e  # EW aggregates the same distinct (src, dst) pairs
