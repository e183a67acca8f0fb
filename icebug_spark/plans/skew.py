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
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side's rows
    scattered over ``salt`` sub-keys and the small side replicated
    ``salt`` times. The result equals ``big.join(small, key, how)``
    row-for-row; only the shuffle layout changes. Use when one ``key``
    value dominates the big side and the small side is too big to
    broadcast.

    The salt mixes a per-row disambiguator (partition id + row position)
    into the hash so that DUPLICATE big-side rows — and big sides whose
    only column is the join key — still scatter uniformly instead of
    collapsing into one salt bucket (the degenerate-skew case this
    helper exists for). The scatter is deterministic for a fixed
    physical layout of ``big``; a repartition may re-deal rows to salt
    buckets, which never changes the join result, only the layout."""
    if how not in ("inner", "left", "left_outer", "leftsemi", "left_semi", "left_anti"):
        # an unmatched small-side row exists once per salt replica, so
        # right/full joins would emit it `salt` times
        raise ValueError(
            f"salted_join supports inner/left-shaped joins, not {how!r} "
            "(unmatched small-side rows would duplicate per salt replica)"
        )
    bs = _with_salt(big, salt)
    ss = small.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(salt)]))
    )
    out = bs.join(ss, [key, "__salt"], how)
    return out.drop("__salt")


def _with_salt(big: DataFrame, salt: int) -> DataFrame:
    """``big`` plus its ``__salt`` scatter column. The per-row
    disambiguator (partition id + in-partition position) keeps duplicate
    rows and key-only frames scattering; row values are mixed in so the
    scatter stays deterministic for a fixed physical layout."""
    return big.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(
                F.spark_partition_id(),
                F.monotonically_increasing_id(),
                *[F.col(c) for c in big.columns],
            ),
            F.lit(salt),
        ).cast("int"),
    )
