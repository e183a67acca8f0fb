"""Shared iterate-until-convergence runner for loop-shaped algorithms.

The reference's ~25 iterative kernels (PageRank, PLP/PLM, connected
components, BFS frontier, k-core peeling, Borůvka, Luby, suitor matching…)
are OpenMP loops over in-memory arrays. In Spark each round is a join +
aggregation; unbounded lineage growth and plan-explosion are the scale
hazards, so the runner truncates lineage with ``localCheckpoint`` every
few rounds. On a cluster you would use reliable ``checkpoint`` to HDFS for
fault tolerance at 1000-executor scale; localCheckpoint keeps the local
test path cheap.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def iterate(
    state: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    max_iter: int,
    converged: Callable[[DataFrame, DataFrame], bool] | None = None,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Run ``state = step(state, i)`` up to ``max_iter`` times.

    ``converged(old, new) -> bool`` is evaluated after each step (it may
    trigger Spark actions; for cheap convergence checks aggregate a single
    'changed' count). Checkpointing is eager so each round's work is done
    once and the plan stays O(1) deep.
    """
    state = state.localCheckpoint(eager=True)
    for i in range(max_iter):
        new = step(state, i)
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            new = new.localCheckpoint(eager=True)
        if converged is not None and converged(state, new):
            return new
        state = new
    return state
