"""Partition combination utilities: HashingOverlapper + ClusteringProjector.

Parity targets (reference):
- HashingOverlapper   ``overlap/HashingOverlapper.hpp:21`` — core
  clustering of an ensemble: nodes agree iff they share a cluster in
  EVERY input partition; implemented by hashing the label tuple.
- ClusteringProjector ``coarsening/ClusteringProjector.hpp`` —
  projectBack: zeta_fine(v) = zeta_coarse(fineToCoarse(v)), one join.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hashing_overlapper(partitions: list[DataFrame]) -> DataFrame:
    """Combine partitions (each (id, cluster)) into the overlap/core
    clustering: two nodes share an output cluster iff they share one in
    every input. The reference folds djb2 hashes of the cluster ids; the
    Spark equivalent hashes the full label tuple with xxhash64 (collision
    behavior is the same approximation the reference accepts), then
    dense-ranks for compact labels. → (id, cluster)."""
    if not partitions:
        raise ValueError("need at least one partition")
    joined = reduce(
        lambda a, b: a.join(b[1].select("id", F.col("cluster").alias(f"c{b[0]}")), "id"),
        enumerate(partitions[1:], start=1),
        partitions[0].select("id", F.col("cluster").alias("c0")),
    )
    cols = [f"c{i}" for i in range(len(partitions))]
    hashed = joined.select("id", F.xxhash64(*cols).alias("h"))
    # label table is cluster-count-sized but can still reach node scale
    # (singleton clusters) — dense-relabel via the two-pass zipWithIndex
    from icebug_spark.plans.zipindex import dense_index

    labels = dense_index(hashed, ["h"], out="cluster")
    return hashed.join(labels, "h").select("id", F.col("cluster").cast("long"))


def project_back(fine_to_coarse: DataFrame, zeta_coarse: DataFrame) -> DataFrame:
    """ClusteringProjector.projectBack: ``fine_to_coarse`` (id, super),
    ``zeta_coarse`` (id, cluster) over super-node ids → fine partition
    (id, cluster). Broadcast the coarse side — it is one row per
    super-node, always the small side after coarsening."""
    return (
        fine_to_coarse.join(
            F.broadcast(
                zeta_coarse.select(F.col("id").alias("super"), "cluster")
            ),
            "super",
        )
        .select("id", "cluster")
    )
