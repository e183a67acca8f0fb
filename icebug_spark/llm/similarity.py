"""Embedding similarity search over the ``embeddings`` table.

Pipeline extension (driver north-star): brute-force cosine top-k as the
exact baseline (oracle-checkable vs DuckDB list functions) and a
signed-random-projection LSH bucketing as the scale path.

Scale design: brute-force is a broadcast nested-loop of Q query vectors
against N corpus vectors — O(Q·N·d) but embarrassingly parallel and
shuffle-free when the query side is broadcast (exactly how you'd score
100 TB of embeddings against a small probe set). The SRP-LSH variant cuts
candidate generation to bucket collisions for large Q·N. All arithmetic is
JVM-side (zip_with/aggregate fold in array order — deterministic)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm2(a):
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    embeddings: DataFrame,
    query_filter,
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``query_filter``: Column predicate over vec_id selecting the probe set
    (kept small → broadcast). Returns (query_id, vec_id, cosine, rnk) with
    cosine rounded 6dp and rank ties broken by vec_id (deterministic).
    Self-matches are excluded."""
    from pyspark.sql import Window

    base = embeddings.select("vec_id", "embedding")
    q = base.where(query_filter(F.col("vec_id"))).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(base)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("qemb"), F.col("embedding"))
                / (
                    F.sqrt(_norm2(F.col("qemb")))
                    * F.sqrt(_norm2(F.col("embedding")))
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("query_id", "vec_id", "cosine", "rnk")
    )


def srp_buckets(embeddings: DataFrame, planes: int = 16) -> DataFrame:
    """Signed-random-projection LSH bucket per vector → (vec_id, bucket).

    Hyperplane p's component for dimension d is a deterministic ±1 derived
    from xxhash64(p, d) — reproducible across runs/partitions with no
    driver-side randomness. Bucket = packed sign bits of the p dot
    products. Vectors in the same bucket are near-dup / high-cosine
    candidates; verify with exact cosine."""
    emb = F.col("embedding")
    dims = F.size(emb)
    bits = []
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(
                emb,
                F.sequence(F.lit(0), dims - 1),
                lambda x, d: x.cast("double")
                * F.when(F.pmod(F.xxhash64(F.lit(p), d), 2) == 0, 1.0).otherwise(-1.0),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(
            F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return embeddings.select("vec_id", bucket.alias("bucket"))


def ivf_assign(embeddings: DataFrame, n_cells: int = 16) -> DataFrame:
    """IVF coarse quantizer: (vec_id, cell, cosine_to_centroid).

    Centroids are the ``n_cells`` corpus vectors whose vec_id hashes
    lowest (deterministic, no training pass — at 100 TB you'd swap in
    k-means centroids from ``pyspark.ml.clustering.KMeans`` on a sample;
    the assignment join below is unchanged). Assignment = argmax cosine
    against the broadcast centroid set: one broadcast nested loop, no
    shuffle of the big side."""
    from pyspark.sql import Window

    base = embeddings.select("vec_id", "embedding")
    cent = (
        base.withColumn("h", F.xxhash64("vec_id"))
        .orderBy("h", "vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("cemb"))
    )
    scored = (
        base.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "cell",
            (
                _dot(F.col("embedding"), F.col("cemb"))
                / (F.sqrt(_norm2(F.col("embedding"))) * F.sqrt(_norm2(F.col("cemb"))))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "cell", F.round("cos", 6).alias("cosine_to_centroid"))
    )


def ivf_topk(
    embeddings: DataFrame,
    query_filter,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` nearest cells per
    query, exact cosine only within probed cells → (query_id, vec_id,
    cosine, rnk). The scale path: candidate set shrinks by ~n_probe/
    n_cells vs brute force while the per-cell scan stays shuffle-free."""
    from pyspark.sql import Window

    assign = ivf_assign(embeddings, n_cells)
    base = embeddings.select("vec_id", "embedding").join(assign.select("vec_id", "cell"), "vec_id")
    # cell ids ARE centroid vec_ids (ivf_assign picks centroids by hash)
    cent = (
        embeddings.select("vec_id", "embedding")
        .withColumn("h", F.xxhash64("vec_id"))
        .orderBy("h", "vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("cemb"))
    )
    q = base.where(query_filter(F.col("vec_id"))).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb")
    )
    # nearest n_probe cells per query
    wq = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("cell"))
    probes = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "qemb",
            "cell",
            (
                _dot(F.col("qemb"), F.col("cemb"))
                / (F.sqrt(_norm2(F.col("qemb"))) * F.sqrt(_norm2(F.col("cemb"))))
            ).alias("qcos"),
        )
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "qemb", "cell")
    )
    scored = (
        base.join(F.broadcast(probes), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("qemb"), F.col("embedding"))
                / (F.sqrt(_norm2(F.col("qemb"))) * F.sqrt(_norm2(F.col("embedding")))),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("query_id", "vec_id", "cosine", "rnk")
    )


def embedding_near_duplicates(
    embeddings: DataFrame, min_cosine: float = 0.95, planes: int = 10
) -> DataFrame:
    """Embedding-cosine near-dup pairs (vec_a, vec_b, cosine ≥ t) — the
    semantic-dedup pass of a training pipeline. LSH-bucketed candidate
    generation + exact verify (ann_candidates) so the pair count stays
    ~linear instead of N²."""
    return ann_candidates(embeddings, planes=planes, min_cosine=min_cosine)


def ann_candidates(
    embeddings: DataFrame, planes: int = 12, min_cosine: float = 0.0
) -> DataFrame:
    """LSH candidate pairs verified with exact cosine →
    (vec_a, vec_b, cosine). The scale path for all-pairs similarity."""
    b = srp_buckets(embeddings, planes)
    a = b.select(F.col("vec_id").alias("vec_a"), "bucket")
    c = b.select(F.col("vec_id").alias("vec_b"), "bucket")
    pairs = (
        a.join(c, "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    base = embeddings.select("vec_id", "embedding")
    return (
        pairs.join(
            base.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")),
            "vec_a",
        )
        .join(
            base.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")),
            "vec_b",
        )
        .select(
            "vec_a",
            "vec_b",
            F.round(
                _dot(F.col("ea"), F.col("eb"))
                / (F.sqrt(_norm2(F.col("ea"))) * F.sqrt(_norm2(F.col("eb")))),
                6,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= min_cosine)
    )
