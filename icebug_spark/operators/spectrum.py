"""k-eigenpair utilities — the reference's ``networkit/algebraic.py``
spectrum surface:

- :func:`symmetric_eigenpairs` — ``algebraic.py:140``
  ``symmetricEigenvectors``: the ``cutoff+1`` algebraically-largest
  (``reverse=False``, eigsh mode "LA") or -smallest (``reverse=True``,
  "SA") eigenpairs of a symmetric matrix, returned sorted ASCENDING by
  algebraic eigenvalue (the reference re-sorts with
  ``sorted(zip(w, ...))`` after eigsh).
- :func:`adjacency_eigenvectors` / :func:`laplacian_eigenvectors` —
  ``algebraic.py:242,287`` graph-level wrappers (undirected →
  symmetric path; L = D − A via ``scipy.sparse.csgraph.laplacian``,
  ``algebraic.py:82``).
- :func:`laplacian_eigenvectors_power` — the distributed scale path
  beyond the dense guard: shifted power iteration with Gram-Schmidt
  deflation over the COO Laplacian (k ≤ 3), every matvec a single
  join+agg (``algebraic.mxv``), per-iteration scalar reductions the
  same 1-row-collect shape as the CG solver (``numerics.py``).

The dense helpers collect the adjacency behind the same guarded-collect
pattern as the other small-n exact solvers (``max_nodes``, default
4096); the guard names the distributed alternative.

Reference-cutoff note: with ``cutoff=-1`` the reference asks ARPACK for
``n−2`` eigenpairs (``eigsh(A, n-2)``) — an ARPACK k<n−1 artifact that
silently DROPS the two algebraically-smallest pairs of the full
spectrum. The dense path here keeps the exact semantics (take the k
largest/smallest, ascending) for any explicit ``cutoff``, and for
``cutoff=-1`` returns the FULL spectrum ascending — a documented
superset; callers that want the reference's dropped-pair quirk can pass
``cutoff=n-3`` explicitly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dense_adjacency(
    edges_undirected: DataFrame, max_nodes: int = 4096, weighted: bool = False
) -> tuple[list, np.ndarray]:
    """Guarded driver-side dense symmetric adjacency. Returns
    (sorted node ids, n×n matrix); raises past ``max_nodes`` naming the
    distributed alternative."""
    cols = ["src", "dst"] + (["weight"] if weighted else [])
    eu = edges_undirected.select(*cols).where(F.col("src") != F.col("dst"))
    nodes = sorted(
        r["id"]
        for r in eu.select(F.col("src").alias("id"))
        .union(eu.select(F.col("dst").alias("id")))
        .distinct()
        .collect()
    )
    if len(nodes) > max_nodes:
        raise ValueError(
            f"dense_adjacency collects the full matrix ({len(nodes)} nodes > "
            f"max_nodes={max_nodes}); use spectrum.laplacian_eigenvectors_power "
            "(distributed shifted power iteration) for big graphs"
        )
    idx = {v: i for i, v in enumerate(nodes)}
    a = np.zeros((len(nodes), len(nodes)))
    for r in eu.collect():
        i, j = idx[r["src"]], idx[r["dst"]]
        w = float(r["weight"]) if weighted else 1.0
        a[i, j] = a[j, i] = w
    return nodes, a


def symmetric_eigenpairs(
    a: np.ndarray, cutoff: int = -1, reverse: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """``symmetricEigenvectors`` (``algebraic.py:140``) on a dense
    symmetric matrix: k = cutoff+1 eigenpairs, largest-algebraic
    (reverse=False) or smallest-algebraic (reverse=True), sorted
    ASCENDING by algebraic eigenvalue. cutoff=-1 → the full spectrum
    (see module docstring re the reference's n−2 ARPACK cap).
    Returns (vals[k], vecs[n,k])."""
    vals, vecs = np.linalg.eigh(a)  # ascending algebraic
    n = a.shape[0]
    k = n if cutoff == -1 else min(cutoff + 1, n)
    if reverse:
        sel = slice(0, k)  # k smallest, already ascending
    else:
        sel = slice(n - k, n)  # k largest, already ascending
    return vals[sel], vecs[:, sel]


def _pairs_df(
    edges_undirected: DataFrame,
    nodes: list,
    vals: np.ndarray,
    vecs: np.ndarray,
) -> tuple[list[float], DataFrame]:
    spark = edges_undirected.sparkSession
    rows = [
        (int(nodes[i]), [float(x) for x in vecs[i, :]])
        for i in range(len(nodes))
    ]
    df = spark.createDataFrame(rows, "id BIGINT, vec ARRAY<DOUBLE>")
    return [float(v) for v in vals], df


def adjacency_eigenvectors(
    edges_undirected: DataFrame,
    cutoff: int = -1,
    reverse: bool = False,
    max_nodes: int = 4096,
    weighted: bool = False,
) -> tuple[list[float], DataFrame]:
    """``adjacencyEigenvectors`` (``algebraic.py:287``), undirected →
    symmetric path. Returns (eigenvalues ascending,
    DataFrame (id BIGINT, vec ARRAY<DOUBLE>)) where ``vec[k]`` is the
    node's entry in the k-th returned eigenvector."""
    nodes, a = dense_adjacency(edges_undirected, max_nodes, weighted)
    vals, vecs = symmetric_eigenpairs(a, cutoff, reverse)
    return _pairs_df(edges_undirected, nodes, vals, vecs)


def laplacian_eigenvectors(
    edges_undirected: DataFrame,
    cutoff: int = -1,
    reverse: bool = False,
    max_nodes: int = 4096,
    weighted: bool = False,
) -> tuple[list[float], DataFrame]:
    """``laplacianEigenvectors`` (``algebraic.py:242``): eigenpairs of
    L = D − A (``scipy.sparse.csgraph.laplacian``, ``algebraic.py:82``),
    same ordering contract as :func:`adjacency_eigenvectors`."""
    nodes, a = dense_adjacency(edges_undirected, max_nodes, weighted)
    lap = np.diag(a.sum(axis=1)) - a
    vals, vecs = symmetric_eigenpairs(lap, cutoff, reverse)
    return _pairs_df(edges_undirected, nodes, vals, vecs)


def laplacian_eigenvectors_power(
    edges_undirected: DataFrame,
    k: int = 2,
    reverse: bool = True,
    max_iter: int = 300,
    tol: float = 1e-9,
    weighted: bool = False,
) -> tuple[list[float], DataFrame]:
    """Distributed k-eigenpair path (k ≤ 3): shifted power iteration
    with Gram-Schmidt deflation over the COO Laplacian.

    reverse=True (the common ask — Fiedler vectors): iterate
    M = σI − L with σ = 2·max weighted degree ≥ λmax(L), whose dominant
    eigenvector is L's smallest; reverse=False iterates L itself (PSD,
    so largest magnitude = largest algebraic). Each matvec is ONE
    join+agg (``algebraic.mxv``); dot products are 1-row scalar
    reductions per iteration (the CG-solver shape, k·iters of them) —
    at 100 TB the vector stays a DataFrame end to end, nothing
    O(n) ever reaches the driver. Returns eigenvalues ascending and
    (id, vec ARRAY<DOUBLE>) like the dense path."""
    if k > 3:
        raise ValueError("laplacian_eigenvectors_power supports k <= 3; "
                         "use the dense path (laplacian_eigenvectors) or LAMG")
    wcol = (
        F.col("weight").cast("double") if weighted else F.lit(1.0)
    ).alias("value")
    eu = (
        edges_undirected.where(F.col("src") != F.col("dst"))
        .select(F.col("src").alias("row"), F.col("dst").alias("col"), wcol)
        .localCheckpoint(eager=True)
    )
    deg = eu.groupBy("row").agg(F.sum("value").alias("d"))
    sigma = 2.0 * (deg.agg(F.max("d")).collect()[0][0] or 1.0)
    # M = sigma*I - L = sigma*I - D + A  (reverse) | M = L = D - A  (forward)
    if reverse:
        diag = deg.select("row", (F.lit(sigma) - F.col("d")).alias("value"))
        off = eu
    else:
        diag = deg.select("row", F.col("d").alias("value"))
        off = eu.select("row", "col", (-F.col("value")).alias("value"))
    m = off.unionByName(
        diag.select("row", F.col("row").alias("col"), "value")
    ).localCheckpoint(eager=True)
    nodes = deg.select(F.col("row").alias("idx")).localCheckpoint(eager=True)
    n = nodes.count()
    spark = edges_undirected.sparkSession
    if n == 0:
        return [], spark.createDataFrame([], "id BIGINT, vec ARRAY<DOUBLE>")

    def dot(x: DataFrame, y: DataFrame) -> float:
        j = x.join(y.withColumnRenamed("value", "v2"), "idx")
        r = j.agg(F.sum(F.col("value") * F.col("v2"))).collect()[0][0]
        return float(r or 0.0)

    found_vecs: list[DataFrame] = []
    found_vals: list[float] = []
    for comp in range(k):
        # deterministic start, orthogonal-ish to previous components
        x = nodes.select(
            "idx",
            (
                F.pmod(F.xxhash64(F.col("idx"), F.lit(comp)), F.lit(1000003))
                .cast("double") / 1000003.0 + 0.1
            ).alias("value"),
        ).localCheckpoint(eager=True)
        lam = 0.0
        for it in range(max_iter):
            # deflate: x -= (x·v_j) v_j
            for vj in found_vecs:
                c = dot(x, vj)
                x = (
                    x.join(vj.withColumnRenamed("value", "vj"), "idx")
                    .select("idx", (F.col("value") - F.lit(c) * F.col("vj")).alias("value"))
                )
            # ONE job per iteration: the matvec y' = M·x carries x's own
            # value through the join — every row of M has a diagonal
            # entry (both operator modes build one per degree row), so
            # x(idx) rides the aggregation as max(xval where col==row) —
            # and both scalars the driver needs, ‖x‖² and x·y', are
            # observed DURING the checkpoint. The Rayleigh quotient of
            # the normalized vector is (x·Mx)/(x·x) exactly, so the
            # normalization folds into the two observed sums; the next
            # iterate y'/‖x‖ is a lazy projection of the checkpointed
            # result. The old shape paid four jobs here (nrm dot, mxv
            # checkpoint, reinstate checkpoint, Rayleigh dot).
            # NOTE the checkpointed x is referenced exactly ONCE in this
            # plan (inside the matvec join): a plan that scans the same
            # local-checkpoint chain twice per iteration degrades
            # exponentially past ~16 chain links on Spark 4.1 (measured:
            # 0.6 s/iter flat with one reference, 2.8×/iter growth with
            # two) — which is also why x is attached via the diagonal
            # instead of a second join.
            from icebug_spark.plans.iterate import checkpoint_observe

            j = m.join(
                x.select(F.col("idx").alias("col"), F.col("value").alias("xval")),
                "col",
            )
            y_plan = (
                j.groupBy(F.col("row").alias("idx"))
                .agg(
                    F.sum(F.col("value") * F.col("xval")).alias("value"),
                    F.max(
                        F.when(F.col("col") == F.col("row"), F.col("xval"))
                    ).alias("xv"),
                )
            )
            y_plan = nodes.join(y_plan, "idx", "left").select(
                "idx",
                F.coalesce("value", F.lit(0.0)).alias("value"),
                F.coalesce("xv", F.lit(0.0)).alias("xv"),
            )
            y, met = checkpoint_observe(
                y_plan,
                F.sum(F.col("xv") * F.col("xv")).alias("sxx"),
                F.sum(F.col("xv") * F.col("value")).alias("sxy"),
            )
            sxx = float(met["sxx"] or 0.0)
            nrm = np.sqrt(sxx)
            if nrm == 0.0:
                break
            new_lam = float(met["sxy"] or 0.0) / sxx
            x = y.select(
                "idx", (F.col("value") / F.lit(float(nrm))).alias("value")
            )
            if it > 2 and abs(new_lam - lam) <= tol * max(1.0, abs(new_lam)):
                lam = new_lam
                break
            lam = new_lam
        nrm = np.sqrt(dot(x, x))
        if nrm > 0:
            x = x.select("idx", (F.col("value") / F.lit(float(nrm))).alias("value"))
        x = x.localCheckpoint(eager=True)
        found_vecs.append(x)
        found_vals.append(sigma - lam if reverse else lam)

    order = np.argsort(found_vals)  # ascending algebraic, like the dense path
    vals = [float(found_vals[i]) for i in order]
    out = nodes.select(F.col("idx").alias("id"))
    for pos, i in enumerate(order):
        out = out.join(
            found_vecs[i].select(
                F.col("idx").alias("id"), F.col("value").alias(f"_c{pos}")
            ),
            "id",
        )
    out = out.select(
        "id", F.array(*[F.col(f"_c{p}") for p in range(len(order))]).alias("vec")
    )
    return vals, out


def spectral_partition(
    edges_undirected: DataFrame,
    count: int,
    balanced: bool = True,
    max_nodes: int = 4096,
    weighted: bool = False,
    eigenvectors: tuple[list[float], DataFrame] | None = None,
) -> DataFrame:
    """SpectralPartitioner (reference ``networkit/community.pyx:2083``):
    recursive spectral bisection of an undirected graph into ``count``
    parts over the smallest Laplacian eigenvectors
    (``laplacianEigenvectors(cutoff=ceil(log2(count))+1, reverse=True)``,
    community.pyx:2107).

    Reference recursion, reproduced exactly (community.pyx:2163-2213):
    a part with target t splits by the value of eigenvector[iteration]
    (depth starts at 1 — vector 0 is the constant vector) at the exact
    order statistic ``values[floor(len/2)]`` when ``balanced`` else at
    the mean (strictly-< goes left); t == 3 trisects at the 1/3 and 2/3
    order statistics using eigenvector[1] ALWAYS (the reference's
    ``_trisect`` never forwards ``iteration`` — quirk kept); even t
    recurses (t/2, t/2), odd t recurses ((t−1)/2, (t+1)/2).

    Spark shape: the recursion tree (O(count) entries) lives on the
    driver; vertex membership never does. All parts at the same depth
    split in ONE pass — a per-part window ranks the eigenvector values,
    a conditional aggregation picks each part's order statistics, and a
    broadcast join assigns children — so the whole partitioner is
    O(log count) shuffles over (id, part) rows regardless of count.
    Eigenvectors come from the guarded dense path by default; pass
    ``eigenvectors=laplacian_eigenvectors_power(...)`` (k ≤ 3 ⇒
    count ≤ 4) to stay fully distributed past the guard.

    → (id, subset): subset ids are dense and deterministic but
    level-ordered, not the reference's DFS counter — partitions are
    equal as groupings (pinned by the pytest golden vs a numpy
    transcription of the reference recursion)."""
    import math

    from pyspark.sql import Window

    from icebug_spark.plans.iterate import checkpoint

    if count < 1:
        raise ValueError("count must be >= 1")
    spark = edges_undirected.sparkSession
    if eigenvectors is None:
        cutoff = (int(math.ceil(math.log2(count))) + 1) if count > 1 else 1
        eigenvectors = laplacian_eigenvectors(
            edges_undirected, cutoff=cutoff, reverse=True,
            max_nodes=max_nodes, weighted=weighted,
        )
    vals, vecs = eigenvectors
    k_avail = len(vals)
    state = vecs.select("id", "vec", F.lit(0).cast("long").alias("part"))
    if count == 1 or k_avail < 2:
        return state.select("id", F.col("part").alias("subset"))
    state = checkpoint(state)
    active: dict[int, tuple[int, int]] = {0: (int(count), 1)}
    next_part = 1
    while any(t > 1 for t, _ in active.values()):
        metas: list[tuple[int, int, str, int, int, int]] = []
        new_active: dict[int, tuple[int, int]] = {}
        for p, (t, it) in sorted(active.items()):
            if t == 1:
                new_active[p] = (1, it)
                continue
            if t == 3:
                a, b, c = next_part, next_part + 1, next_part + 2
                next_part += 3
                metas.append((p, min(1, k_avail - 1), "tri", a, b, c))
                for ch in (a, b, c):
                    new_active[ch] = (1, it + 1)
            else:
                a, b = next_part, next_part + 1
                next_part += 2
                metas.append((p, min(it, k_avail - 1), "bi", a, b, -1))
                if t % 2 == 0:
                    ta = tb = t // 2
                else:
                    ta = (t - 1) // 2
                    tb = ta + 1
                new_active[a] = (ta, it + 1)
                new_active[b] = (tb, it + 1)
        active = new_active
        meta = spark.createDataFrame(
            metas, "part BIGINT, iu INT, mode STRING, pa BIGINT, pb BIGINT, pc BIGINT"
        )
        cur = state.join(F.broadcast(meta), "part", "left")
        keep = cur.where(F.col("mode").isNull()).select("id", "vec", "part")
        split = cur.where(F.col("mode").isNotNull()).withColumn(
            "x", F.get("vec", F.col("iu"))
        )
        wr = Window.partitionBy("part").orderBy("x", "id")
        ws = Window.partitionBy("part")
        ranked = (
            split.withColumn("rn", F.row_number().over(wr))
            .withColumn("cnt", F.count(F.lit(1)).over(ws))
        )
        # exact order statistics values[floor(len*i/sections)] per part
        # (community.pyx:2119) + the mean for the unbalanced bisect
        qs = ranked.groupBy("part").agg(
            F.min(
                F.when(F.col("rn") == F.floor(F.col("cnt") / 2) + 1, F.col("x"))
            ).alias("qb"),
            F.min(
                F.when(F.col("rn") == F.floor(F.col("cnt") / 3) + 1, F.col("x"))
            ).alias("q1"),
            F.min(
                F.when(
                    F.col("rn") == F.floor(F.col("cnt") * 2 / 3) + 1, F.col("x")
                )
            ).alias("q2"),
            F.avg("x").alias("mx"),
        )
        bi_split = F.col("qb") if balanced else F.col("mx")
        assigned = (
            ranked.join(F.broadcast(qs), "part")
            .withColumn(
                "part",
                F.when(
                    F.col("mode") == "tri",
                    F.when(F.col("x") < F.col("q1"), F.col("pa"))
                    .when(F.col("x") < F.col("q2"), F.col("pb"))
                    .otherwise(F.col("pc")),
                ).otherwise(
                    F.when(F.col("x") < bi_split, F.col("pa")).otherwise(
                        F.col("pb")
                    )
                ),
            )
            .select("id", "vec", "part")
        )
        state = checkpoint(keep.unionByName(assigned))
    # dense-relabel in part order so subset ids are 0..p-1 like the
    # reference's _generatePartition compaction; the leaf list is driver
    # state already, so the map is a broadcast literal (no window)
    lab = spark.createDataFrame(
        [(p, i) for i, p in enumerate(sorted(active))],
        "part BIGINT, subset BIGINT",
    )
    return state.join(F.broadcast(lab), "part").select("id", "subset")
