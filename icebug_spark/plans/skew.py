"""Skew handling for power-law graph joins: salting + AQE notes.

Real graphs are degree-skewed (the derived customer–supplier graph's
supplier hubs touch ~3% of all edges each at every sf). Aggregations
are already safe — every groupBy in this package does map-side partial
aggregation — but a shuffle JOIN keyed on a hot node puts that node's
entire edge list in ONE task. Two remedies, in preference order:

1. **AQE skew-join** (``spark.sql.adaptive.skewJoin.enabled``, on by
   default): splits oversized partitions at runtime. Zero code. This is
   why the package leaves plain equi-joins alone — Catalyst + AQE fix
   the common case.
2. **Salting** (this module) for the cases AQE cannot rewrite: skewed
   keys feeding a join that must ALSO preserve partitioning for a later
   stage, broadcast-ineligible medium tables, or engines/configs with
   AQE off. ``salted_join`` replicates the small side ``salt`` times
   and scatters the big side's hot keys uniformly across the replicas —
   per-task work shrinks by ~salt× at the cost of a small-side ×salt
   blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
    disambiguate: bool = True,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side's rows
    scattered over ``salt`` sub-keys and the small side replicated
    ``salt`` times. The result equals ``big.join(small, key, how)``
    row-for-row; only the shuffle layout changes. Use when one ``key``
    value dominates the big side and the small side is too big to
    broadcast.

    The scatter is fully DETERMINISTIC — a pure function of the big
    side's row VALUES (plus, with ``disambiguate``, each duplicate's
    ordinal within its duplicate group). Determinism here is a cluster
    correctness requirement, not a nicety: a nondeterministic salt (e.g.
    one mixing ``spark_partition_id``/``monotonically_increasing_id``)
    lives in a projection, which does NOT mark the map stage
    indeterminate, so on a shuffle-fetch failure Spark recomputes map
    output WITHOUT rolling back already-committed reducers — recomputed
    rows can land in different salt buckets and rows get duplicated or
    dropped (the class of bug SPARK-23207 fixed for round-robin
    repartition). A value-derived salt replays identically on any retry.

    ``disambiguate=True`` (default) additionally scatters DUPLICATE
    big-side rows — and key-only frames, the degenerate-skew case —
    by counting each distinct row's multiplicity (map-side partial agg)
    and hashing the ordinal into the salt: deterministic because any
    assignment of ordinals 1..k to k identical rows yields the same
    output multiset. Costs one extra all-columns shuffle of the big
    side (duplicates collapse before it moves); pass
    ``disambiguate=False`` when big's rows are known distinct (e.g. an
    adjacency list) to skip it — distinct rows already scatter on the
    value hash alone."""
    if how not in ("inner", "left", "left_outer", "leftsemi", "left_semi", "left_anti"):
        # an unmatched small-side row exists once per salt replica, so
        # right/full joins would emit it `salt` times
        raise ValueError(
            f"salted_join supports inner/left-shaped joins, not {how!r} "
            "(unmatched small-side rows would duplicate per salt replica)"
        )
    bs = _with_salt(big, salt, disambiguate=disambiguate)
    ss = small.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(salt)]))
    )
    out = bs.join(ss, [key, "__salt"], how)
    return out.drop("__salt")


def _with_salt(big: DataFrame, salt: int, disambiguate: bool = True) -> DataFrame:
    """``big`` plus its ``__salt`` scatter column — deterministic (see
    ``salted_join``). With ``disambiguate``, duplicate rows get distinct
    ordinals via groupBy-count + ``sequence``/``explode`` (one partial-
    aggregating shuffle); without, the salt is the row-value hash alone."""
    cols = [F.col(c) for c in big.columns]
    if not disambiguate:
        return big.withColumn(
            "__salt", F.pmod(F.xxhash64(*cols), F.lit(salt)).cast("int")
        )
    counted = big.groupBy(*big.columns).agg(F.count(F.lit(1)).alias("__cnt"))
    return (
        counted.select(
            *big.columns,
            F.explode(F.sequence(F.lit(1), F.col("__cnt"))).alias("__rn"),
        )
        .withColumn(
            "__salt", F.pmod(F.xxhash64(F.col("__rn"), *cols), F.lit(salt)).cast("int")
        )
        .drop("__rn")
    )
