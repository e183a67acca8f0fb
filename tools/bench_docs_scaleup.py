"""BENCH_DOCS_SCALEUP — scale-up evidence for the training-data-pipeline
operators (the LLM surface's analogue of BENCH_SCALEUP): synthetic
corpora at three sizes, one measurement per pipeline kernel, and the
doubling ratio per 4x corpus growth. The dedup/tokenizer kernels are all
shuffle-bounded by fine-grained keys (gram / band / word / doc_id), so
the design claim is near-linear scaling — a super-linear ratio means a
pair blow-up or a single-partition window crept in.

Corpus: 2^D documents, ~40-80 tokens each, Zipf-skewed vocabulary of
10k words (cube-skew on a uniform hash — hot words exist, like real
text), and every 20th document an exact copy of its predecessor so the
dedup kernels have real work. Everything derives from xxhash64(doc_id,
position) — deterministic, no driver-side data generation.

Writes BENCH_DOCS_SCALEUP.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from icebug_spark.llm.dedup import (  # noqa: E402
    duplicated_span_stats,
    exact_duplicates,
    minhash_lsh_duplicates,
    ngram_jaccard_pairs,
)
from icebug_spark.llm.mixing import pack_sequences  # noqa: E402
from icebug_spark.llm.textstats import lm_perplexity  # noqa: E402
from icebug_spark.llm.tokenize import bpe_learn  # noqa: E402
from icebug_spark.session import get_spark  # noqa: E402

SIZES = [int(s) for s in os.environ.get("SPARK_GRAFT_DOC_SCALES", "13,15,17").split(",")]
VOCAB = 10_000


def synth_docs(spark, log2_docs: int):
    """2^log2_docs deterministic documents (doc_id, text, lang, source,
    n_chars); every 20th doc duplicates its predecessor."""
    n = 1 << log2_docs
    base = F.when(
        (F.col("id") % 20 == 0) & (F.col("id") > 0), F.col("id") - 1
    ).otherwise(F.col("id"))
    n_toks = (40 + F.pmod(F.xxhash64(base), F.lit(41))).cast("int")

    def word(j):
        # cube-skew: u^3 maps uniform [0,1) onto a hot-head distribution
        u = F.pmod(F.xxhash64(base, j), F.lit(1_000_000)).cast("double") / 1_000_000.0
        return F.concat(F.lit("w"), (u * u * u * VOCAB).cast("long").cast("string"))

    return (
        spark.range(n)
        .withColumn(
            "text",
            F.array_join(F.transform(F.sequence(F.lit(1), n_toks), word), " "),
        )
        .select(
            F.col("id").alias("doc_id"),
            "text",
            F.lit("en").alias("lang"),
            F.concat(F.lit("src"), (F.col("id") % 8).cast("string")).alias("source"),
            F.length("text").alias("n_chars"),
        )
        .localCheckpoint(eager=True)
    )


KERNELS = {
    "exact_dedup": lambda d: exact_duplicates(d).count(),
    "minhash_lsh": lambda d: minhash_lsh_duplicates(
        d, n=3, num_hashes=16, bands=4, threshold=0.2
    ).count(),
    "substring_dedup": lambda d: duplicated_span_stats(d, 8, 2).agg(
        F.sum("dup_tokens")
    ).collect(),
    "ngram_jaccard_capped": lambda d: ngram_jaccard_pairs(
        d, n=3, threshold=0.2, max_doc_freq=100
    ).count(),
    "pack_sequences": lambda d: pack_sequences(d, 512).count(),
    "bpe_learn_4": lambda d: bpe_learn(d, 4).count(),
    "lm_perplexity": lambda d: lm_perplexity(d).agg(F.sum("n_bigrams")).collect(),
}


def main() -> None:
    spark = get_spark("bench-docs-scaleup")
    out: dict = {"metric": "docs_pipeline_scaleup", "unit": "sec", "sizes": {}}
    for d in SIZES:
        docs = synth_docs(spark, d)
        n = docs.count()
        toks = docs.agg(
            F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t")
        ).collect()[0]["t"]
        row = {"n_docs": n, "n_tokens": int(toks), "kernels": {}}
        for name, fn in KERNELS.items():
            t0 = time.time()
            fn(docs)
            row["kernels"][name] = round(time.time() - t0, 2)
            print(f"2^{d}: {name} {row['kernels'][name]}s", flush=True)
        out["sizes"][f"2^{d}"] = row
        docs.unpersist()
    # doubling ratios: secs(size_{i+1}) / secs(size_i) per kernel; corpus
    # grows 4x per step, so linear kernels should sit near 4 (minus the
    # fixed job-latency floor that dominates the small sizes)
    keys = [f"2^{d}" for d in SIZES]
    out["growth_ratios"] = {
        name: [
            round(
                out["sizes"][keys[i + 1]]["kernels"][name]
                / max(out["sizes"][keys[i]]["kernels"][name], 0.01),
                2,
            )
            for i in range(len(keys) - 1)
        ]
        for name in KERNELS
    }
    emb_main(spark, out)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_DOCS_SCALEUP.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out["growth_ratios"], sort_keys=True))
    spark.stop()



# --- embeddings-side kernels (appended section) ----------------------

EMB_SIZES = [int(s) for s in os.environ.get("SPARK_GRAFT_EMB_SCALES", "12,14,16").split(",")]
DIM = 32


def synth_embeddings(spark, log2_vecs: int):
    """2^log2_vecs deterministic embeddings (vec_id, embedding, label):
    DIM-dim vectors from hashed uniforms in [-0.5, 0.5), shifted by one
    of 8 planted cluster offsets so k-means has real structure."""
    n = 1 << log2_vecs
    centroid = (F.col("id") % 8).cast("double")

    def coord(d):
        u = F.pmod(F.xxhash64(F.col("id"), F.lit(int(d))), F.lit(1_000_000)).cast(
            "double"
        ) / 1_000_000.0 - 0.5
        off = F.when((F.lit(int(d)) % 8) == F.col("id") % 8, 1.5).otherwise(0.0)
        return (u + off).cast("float")

    return (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.array(*[coord(d) for d in range(DIM)]).alias("embedding"),
            centroid.cast("int").alias("label"),
        )
        .localCheckpoint(eager=True)
    )


def emb_kernels(n: int):
    from icebug_spark.llm.similarity import (
        cosine_topk,
        ivf_topk,
        kmeans_assign,
        semdedup_pairs,
        srp_buckets,
    )

    # SemDeDup practice: clusters grow with n so cell size stays bounded
    # (k = n/256) and the within-cell quadratic stays ~256·n total pairs
    k_sem = max(8, n // 256)
    return {
        "kmeans_k16_i2": lambda e: kmeans_assign(e, k=16, iters=2).count(),
        "semdedup_scaled_k": lambda e: semdedup_pairs(
            e, k=k_sem, iters=1, threshold_num=2, threshold_den=5
        ).count(),
        "srp_buckets": lambda e: srp_buckets(e, planes=16).count(),
        "cosine_topk_64probes": lambda e: cosine_topk(
            e, lambda v: v < 64, k=10
        ).count(),
        "ivf_topk_64probes": lambda e: ivf_topk(
            e, lambda v: v < 64, k=10, n_cells=16, n_probe=4
        ).count(),
    }


def emb_main(spark, out: dict) -> None:
    out["emb_sizes"] = {}
    for d in EMB_SIZES:
        emb = synth_embeddings(spark, d)
        n = emb.count()
        row = {"n_vecs": n, "kernels": {}}
        for name, fn in emb_kernels(n).items():
            t0 = time.time()
            fn(emb)
            row["kernels"][name] = round(time.time() - t0, 2)
            print(f"emb 2^{d}: {name} {row['kernels'][name]}s", flush=True)
        out["emb_sizes"][f"2^{d}"] = row
        emb.unpersist()
    keys = [f"2^{d}" for d in EMB_SIZES]
    names = list(out["emb_sizes"][keys[0]]["kernels"])
    out["emb_growth_ratios"] = {
        name: [
            round(
                out["emb_sizes"][keys[i + 1]]["kernels"][name]
                / max(out["emb_sizes"][keys[i]]["kernels"][name], 0.01),
                2,
            )
            for i in range(len(keys) - 1)
        ]
        for name in names
    }


if __name__ == "__main__":
    main()
