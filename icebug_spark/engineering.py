"""Engineering / benchmarking surface (reference ``networkit/engineering.pyx``).

Parity map:
- setNumberOfThreads / getCurrentNumberOfThreads / getMaxNumberOfThreads
  (``engineering.pyx:32,46,59``): the reference's parallelism knob is the
  OpenMP thread count; the per-session Spark analogue is
  ``spark.sql.shuffle.partitions`` (reducer-side parallelism you can vary
  on a live session), with ``sparkContext.defaultParallelism`` as the
  machine ceiling. Executor counts are cluster-level deploy config, not a
  session knob, so the scaling harnesses vary shuffle partitions.
- setLogLevel / getLogLevel (``engineering.pyx:79,92``) →
  ``sparkContext.setLogLevel``; the current level is tracked session-side
  (Spark exposes no getter).
- setSeed (``engineering.pyx:126``) → records the session seed in
  ``spark.icebug.seed``; the generators/randomization operators read their
  ``seed=`` argument — ``get_seed`` is the session default for callers
  that want one seed across a pipeline.
- strongScaling / weakScaling (``engineering.pyx:143,194``): identical
  protocol (sequence of parallelism levels; weak scaling zips inputs with
  levels; repetition loop; list-of-dict rows; optional TSV with the
  reference's ``algo,input,threads,time`` column header). Timing forces
  the DataFrame with a noop-sink write — full materialization without
  collecting rows to the driver (the reference times ``algorithm.run()``,
  which materializes result arrays in-process).
"""

from __future__ import annotations

import csv
import time
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

_LOG_LEVELS = ("ALL", "TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL", "OFF")


def set_number_of_threads(spark: SparkSession, n: int) -> None:
    """setNumberOfThreads (engineering.pyx:32): session parallelism knob."""
    spark.conf.set("spark.sql.shuffle.partitions", str(int(n)))


def get_current_number_of_threads(spark: SparkSession) -> int:
    """getCurrentNumberOfThreads (engineering.pyx:46)."""
    return int(spark.conf.get("spark.sql.shuffle.partitions"))


def get_max_number_of_threads(spark: SparkSession) -> int:
    """getMaxNumberOfThreads (engineering.pyx:59): machine/cluster ceiling."""
    return int(spark.sparkContext.defaultParallelism)


def set_log_level(spark: SparkSession, level: str) -> None:
    """setLogLevel (engineering.pyx:92)."""
    level = level.upper()
    if level not in _LOG_LEVELS:
        raise ValueError(f"unknown log level: {level}")
    spark.sparkContext.setLogLevel(level)
    spark.conf.set("spark.icebug.logLevel", level)


def get_log_level(spark: SparkSession) -> str:
    """getLogLevel (engineering.pyx:79) — last level set this session
    (Spark has no JVM-side getter)."""
    return spark.conf.get("spark.icebug.logLevel", "WARN")


def set_seed(spark: SparkSession, seed: int, use_thread_id: bool = False) -> None:
    """setSeed (engineering.pyx:126). ``use_thread_id`` has no Spark
    analogue (per-task determinism comes from seeding by partition id,
    which the operators already do); accepted for signature parity."""
    spark.conf.set("spark.icebug.seed", str(int(seed)))


def get_seed(spark: SparkSession, default: int = 42) -> int:
    return int(spark.conf.get("spark.icebug.seed", str(default)))


def _force(df: DataFrame) -> None:
    # noop sink: full distributed materialization, nothing to the driver
    df.write.format("noop").mode("overwrite").save()


def _write_tsv(out_path: str, data: list[dict]) -> None:
    # reference quirk preserved: the header declares an "algo" column the
    # rows never fill (engineering.pyx:188-193)
    with open(out_path, "w") as f:
        w = csv.DictWriter(
            f, fieldnames=["algo", "input", "threads", "time"],
            delimiter="\t", restval="",
        )
        w.writeheader()
        for row in data:
            w.writerow(row)


def strong_scaling(
    spark: SparkSession,
    algorithm: Callable[..., DataFrame],
    thread_sequence: Sequence[int],
    inargs: dict,
    input_title: str | None = None,
    repetitions: int = 1,
    out_path: str | None = None,
) -> list[dict]:
    """strongScaling (engineering.pyx:143): fixed input, varying
    parallelism. ``algorithm(spark, **inargs)`` must return a DataFrame;
    each run is timed end-to-end through a noop-sink materialization."""
    restore = get_current_number_of_threads(spark)
    data: list[dict] = []
    try:
        for n in thread_sequence:
            set_number_of_threads(spark, n)
            for _ in range(repetitions):
                t0 = time.perf_counter()
                _force(algorithm(spark, **inargs))
                data.append({
                    "input": input_title or "input",
                    "threads": n,
                    "time": time.perf_counter() - t0,
                })
    finally:
        set_number_of_threads(spark, restore)
    if out_path:
        _write_tsv(out_path, data)
    return data


def weak_scaling(
    spark: SparkSession,
    algorithm: Callable[..., DataFrame],
    inargs: dict,
    thread_sequence: Sequence[int],
    input_sequence: Sequence,
    input_titles: Sequence[str] | None = None,
    repetitions: int = 1,
    out_path: str | None = None,
) -> list[dict]:
    """weakScaling (engineering.pyx:194): inputs zipped with parallelism
    levels (input size per level is the caller's contract);
    ``algorithm(spark, input, **inargs)``."""
    restore = get_current_number_of_threads(spark)
    data: list[dict] = []
    try:
        for i, (inp, n) in enumerate(zip(input_sequence, thread_sequence)):
            set_number_of_threads(spark, n)
            for _ in range(repetitions):
                t0 = time.perf_counter()
                _force(algorithm(spark, inp, **inargs))
                data.append({
                    "input": input_titles[i] if input_titles else f"input{i}",
                    "threads": n,
                    "time": time.perf_counter() - t0,
                })
    finally:
        set_number_of_threads(spark, restore)
    if out_path:
        _write_tsv(out_path, data)
    return data
