"""Jobs-per-round regression pins for the observed-metric fusion.

A loop round costs: one checkpoint job (which carries the convergence
metric via DataFrame.observe) plus the mirror() broadcast builds for its
joins. Before the fusion each round ALSO paid a separate count/aggregate
action (~1 extra job per round, ~4.5 jobs/level on BFS). These tests pin
the marginal jobs-per-level so a reintroduced per-round action fails CI.
"""


def _bfs_jobs(spark, depth: int) -> int:
    from icebug_spark.operators.traversal import bfs_distances

    sc = spark.sparkContext
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(depth)], "src BIGINT, dst BIGINT"
    ).localCheckpoint(eager=True)
    group = f"bfs_jobs_{depth}"
    sc.setJobGroup(group, "probe")
    n = bfs_distances(e, 0).count()
    sc.setJobGroup(None, None)
    assert n == depth + 1
    return len(sc.statusTracker().getJobIdsForGroup(group))


def test_bfs_marginal_jobs_per_level(spark):
    """Each extra BFS level must cost at most 4 extra jobs (1 fused
    checkpoint+metric, up to 2 broadcast builds, 1 slack). The pre-fusion
    shape cost ~4.5/level (separate frontier-count action per round)."""
    j4 = _bfs_jobs(spark, 4)
    j12 = _bfs_jobs(spark, 12)
    marginal = (j12 - j4) / 8.0
    assert marginal <= 4.0, f"jobs/level regressed: {marginal} (j4={j4}, j12={j12})"


def test_cc_marginal_jobs_per_round(spark):
    """Connected components: one fused checkpoint job + broadcast builds
    per min-label round; a path of length L converges in O(L) rounds."""
    from icebug_spark.operators.components import connected_components

    sc = spark.sparkContext

    def jobs(depth):
        eu = (
            spark.createDataFrame(
                [(i, i + 1) for i in range(depth)], "src BIGINT, dst BIGINT"
            )
            .union(
                spark.createDataFrame(
                    [(i + 1, i) for i in range(depth)], "src BIGINT, dst BIGINT"
                )
            )
            .localCheckpoint(eager=True)
        )
        group = f"cc_jobs_{depth}"
        sc.setJobGroup(group, "probe")
        n = connected_components(eu).where("component = 0").count()
        sc.setJobGroup(None, None)
        assert n == depth + 1
        return len(sc.statusTracker().getJobIdsForGroup(group))

    j4, j10 = jobs(4), jobs(10)
    marginal = (j10 - j4) / 6.0
    assert marginal <= 4.0, f"jobs/round regressed: {marginal} (j4={j4}, j10={j10})"
