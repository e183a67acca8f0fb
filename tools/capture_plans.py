"""Capture .explain("formatted") for headline (or named) queries into
plans/r10/<query>_<tag>.txt — the committed before/after plan evidence
for the optimization round.

Usage: python tools/capture_plans.py <tag> [query ...]
  tag: "before" / "after" (file suffix)
  query: registry names; default = the bench HEADLINE list.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from icebug_spark.queries.registry import ALL  # noqa: E402
from icebug_spark.session import get_spark  # noqa: E402

OUT_DIR = os.environ.get("SPARK_GRAFT_PLANS_DIR", "plans/r11")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("icebug-plans")
    os.makedirs(OUT_DIR, exist_ok=True)
    from icebug_spark import catalog
    from icebug_spark.plans import iterate

    catalog.build_derived_artifacts(spark, sf_dir)
    for name in names:
        fn = ALL[name][0]
        # iterative operators run their loop eagerly inside fn(); the
        # PLAN_CAPTURE hook records each round's executed physical plan
        # (which the eager checkpoints would otherwise discard)
        iterate.PLAN_CAPTURE = captured = []
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        iterate.PLAN_CAPTURE = None
        path = f"{OUT_DIR}/{name}_{tag}.txt"
        with open(path, "w") as f:
            f.write(plan)
            if captured:
                f.write(
                    f"\n\n=== per-round loop plans ({len(captured)} captured"
                    " via plans.iterate.PLAN_CAPTURE; the final plan above"
                    " only scans the checkpointed loop result) ===\n"
                )
                # first and last round are representative; all rounds share
                # the same shape modulo AQE sizing
                for i in (0, len(captured) - 1):
                    f.write(f"\n--- round-plan {i} ---\n{captured[i]}\n")
        n_exchange = plan.count("Exchange")
        n_loop = captured[0].count("Exchange") if captured else 0
        print(
            f"{name}: {n_exchange} Exchange (final), "
            f"{n_loop} Exchange (round 0 of {len(captured)}) -> {path}"
        )


if __name__ == "__main__":
    main()
