"""salted_join: result parity with the plain join, and genuine scatter
of the hot key across salt sub-partitions."""

from pyspark.sql import functions as F

from icebug_spark.plans.skew import salted_join


def test_salted_join_parity(spark):
    # hot key 7 dominates the big side
    big = spark.range(5000).select(
        F.when(F.col("id") % 10 < 8, 7).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(i, f"v{i}") for i in range(50)], "k BIGINT, val STRING"
    )
    plain = big.join(small, "k").select("k", "payload", "val")
    salted = salted_join(big, small, "k", salt=8).select("k", "payload", "val")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).isEmpty()
    assert salted.exceptAll(plain).isEmpty()


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], "k BIGINT, p STRING")
    small = spark.createDataFrame([(1, "x"), (2, "y")], "k BIGINT, v STRING")
    out = salted_join(big, small, "k", salt=4, how="left").collect()
    got = {(r["k"], r["p"], r["v"]) for r in out}
    assert got == {(1, "a", "x"), (2, "b", "y"), (99, "c", None)}


def test_salt_scatters_hot_key(spark):
    big = spark.range(4000).select(F.lit(7).alias("k"), F.col("id").alias("p"))
    bs = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("k"), F.col("p")), F.lit(8)).cast("int")
    )
    per_salt = [r["count"] for r in bs.groupBy("__salt").count().collect()]
    assert len(per_salt) == 8  # every sub-key used
    assert max(per_salt) < 4000 * 0.3  # no sub-key hogs the hot key


def test_salt_scatters_duplicate_rows(spark):
    # the degenerate-skew case: a key-only big side whose rows are all
    # IDENTICAL — a row-value hash alone would land every row in one salt
    # bucket; the per-row disambiguator must still scatter them.
    from icebug_spark.plans.skew import _with_salt

    big = spark.range(4000).select(F.lit(7).alias("k")).repartition(8)
    per_salt = [
        r["count"] for r in _with_salt(big, 8).groupBy("__salt").count().collect()
    ]
    assert len(per_salt) == 8
    assert max(per_salt) < 4000 * 0.3
    # and the join itself stays exact
    small = spark.createDataFrame([(7, "x")], "k BIGINT, v STRING")
    assert salted_join(big, small, "k", salt=8).count() == 4000


def _hot_adj(spark):
    # hub node 999 is a shared neighbor of 120 nodes (deg 120 ≫ threshold);
    # plus a cold fringe of small wedges
    rows = [(u, 999) for u in range(120)]
    rows += [(u, 500 + u % 7) for u in range(40)]
    return spark.createDataFrame(rows, "node BIGINT, nbr BIGINT")


def test_common_neighbors_salted_parity(spark):
    # wiring: spark.icebug.saltHotDegree routes hot middle nodes through
    # salted_join; results must equal the plain path row-for-row.
    from icebug_spark.operators.linkpred import common_neighbors

    adj = _hot_adj(spark)
    plain = common_neighbors(adj).collect()
    spark.conf.set("spark.icebug.saltHotDegree", "50")
    try:
        salted = common_neighbors(adj).collect()
    finally:
        spark.conf.unset("spark.icebug.saltHotDegree")
    key = lambda r: (r["u"], r["v"], r["common_neighbors"])
    assert sorted(map(key, salted)) == sorted(map(key, plain))
    assert len(plain) > 120 * 119 // 4  # the hub wedge block is present


def test_neighbor_pairs_hot_key_scatters_partitions(spark):
    # the point of the salt: the hub's d² wedge rows must land in >1
    # shuffle partition. AQE coalescing is disabled so tiny test shuffles
    # aren't merged back into one partition.
    from icebug_spark.operators.linkpred import _neighbor_pairs

    adj = _hot_adj(spark)
    prior_coalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.icebug.saltHotDegree", "50")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        pairs = _neighbor_pairs(adj).where(F.col("n") == 999)
        pids = (
            pairs.withColumn("pid", F.spark_partition_id())
            .select("pid")
            .distinct()
            .count()
        )
        assert pairs.count() == 120 * 119 // 2
        assert pids > 1, "hot key's wedges all in one partition — no scatter"
    finally:
        spark.conf.unset("spark.icebug.saltHotDegree")
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", prior_coalesce
        )


def test_neighbor_pairs_hot_set_guard_falls_back(spark):
    # a pathological threshold makes EVERY middle node "hot"; the guard
    # must refuse the force-broadcast and fall back to the plain join —
    # with identical results.
    from icebug_spark.operators.linkpred import common_neighbors

    adj = _hot_adj(spark)
    plain = common_neighbors(adj).collect()
    spark.conf.set("spark.icebug.saltHotDegree", "1")  # everything is hot
    spark.conf.set("spark.icebug.saltHotMaxKeys", "2")  # tiny cap → trip it
    try:
        guarded = common_neighbors(adj).collect()
    finally:
        spark.conf.unset("spark.icebug.saltHotDegree")
        spark.conf.unset("spark.icebug.saltHotMaxKeys")
    key = lambda r: (r["u"], r["v"], r["common_neighbors"])
    assert sorted(map(key, guarded)) == sorted(map(key, plain))


def test_salt_is_deterministic_across_layouts(spark):
    # cluster-retry safety: the (row, salt) assignment must be a pure
    # function of row values (+ duplicate ordinal), NOT physical layout —
    # a layout-dependent salt re-deals rows to different buckets when a
    # fetch-failure retry recomputes map output, duplicating/dropping
    # join rows (SPARK-23207 class). Same data through three different
    # layouts → identical per-(row, salt) multisets.
    from icebug_spark.plans.skew import _with_salt

    base = spark.range(2000).select(
        (F.col("id") % 5).alias("k"), (F.col("id") % 17).alias("p")
    )
    layouts = [base, base.repartition(3), base.repartition(13, "p").sortWithinPartitions("k")]

    def dist(df, **kw):
        return sorted(
            (r["k"], r["p"], r["__salt"], r["count"])
            for r in _with_salt(df, 8, **kw).groupBy("k", "p", "__salt").count().collect()
        )

    expect = dist(layouts[0])
    expect_nd = dist(layouts[0], disambiguate=False)
    for lay in layouts[1:]:
        assert dist(lay) == expect
        assert dist(lay, disambiguate=False) == expect_nd
