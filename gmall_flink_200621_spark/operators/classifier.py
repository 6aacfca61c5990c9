"""Distributed linear-classifier training — the gradient-aggregation
shape: the DRIVER holds the model (a handful of scalars), the DATA stays
distributed, and each training step is ONE map-side-combinable
aggregation that returns a model-sized vector to the driver. This is the
canonical way to train small models on Spark (the shape under
`spark.ml`'s LogisticRegression/treeAggregate) — demonstrated here as a
first-class engine operator for corpus curation: train a cheap quality /
language classifier over document features, score every document, filter.

Arithmetic is INTEGER end to end (features are counts, updates are the
batch-perceptron rule w += Σ_misclassified y·x with unit learning rate),
so — like operators/graph.pagerank — the result is partition-order
independent and the DuckDB oracle (same iterations unrolled as a CTE
chain from the same constants) certifies it hash-exactly. A sigmoid/
float-gradient variant would train "better" but could not be
hash-certified (libm exp differs across engines) — the engine posture is
the perceptron for certified correctness, with the identical aggregation
shape carrying any float model in production.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

PERC_ITERS = 5
PERC_POS_LANG = "en"  # the +1 class


def _features(docs: DataFrame) -> DataFrame:
    """Integer feature vector per doc: bias, bucketed length, token
    count, distinct-token count; label y=+1 iff lang == PERC_POS_LANG.
    All built-ins — the feature pass is a shuffle-free projection."""
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.when(F.col("lang") == PERC_POS_LANG, F.lit(1)).otherwise(F.lit(-1)).alias("y"),
        F.lit(1).cast("long").alias("x0"),
        F.expr("cast(n_chars div 64 as long)").alias("x1"),
        F.size(toks).cast("long").alias("x2"),
        F.size(F.array_distinct(toks)).cast("long").alias("x3"),
    )


def perceptron_lang(docs: DataFrame, iters: int = PERC_ITERS) -> DataFrame:
    """Train a batch perceptron separating lang==PERC_POS_LANG, then
    score every document with the final weights.

    Per iteration: margin = y·(w·x) with the CURRENT weights inlined as
    literals (the broadcast-model idiom — at real scale a large w would
    ship via `spark.sparkContext.broadcast`, the plan is identical), one
    filtered aggregation Σ_{margin≤0} y·x_j returns exactly 4 longs to
    the driver, w += that. The shuffle carries 4 numbers per partition —
    training cost is `iters` scans of the (persisted) feature frame,
    nothing else. Zero-init means iteration 1 treats every row as
    misclassified (margin 0), so w1 = Σ y·x — the class-difference
    direction."""
    feats = _features(docs).persist()
    w = [0, 0, 0, 0]
    xcols = ["x0", "x1", "x2", "x3"]
    try:
        for _ in range(iters):
            margin: Column = F.col("y") * sum(
                (F.lit(wj) * F.col(xj) for wj, xj in zip(w, xcols)), F.lit(0)
            )
            row = (
                feats.where(margin <= 0)
                .agg(*[F.sum(F.col("y") * F.col(xj)).alias(xj) for xj in xcols])
                .first()
            )
            w = [wj + (row[xj] or 0) for wj, xj in zip(w, xcols)]
        score = sum((F.lit(wj) * F.col(xj) for wj, xj in zip(w, xcols)), F.lit(0))
        return feats.select(
            "doc_id",
            F.col("y").alias("label"),
            score.cast("long").alias("score_units"),
            F.when(score > 0, F.lit(1)).otherwise(F.lit(-1)).alias("pred"),
            F.when((F.col("y") * score) > 0, F.lit(1)).otherwise(F.lit(0)).alias("correct"),
        )
    finally:
        feats.unpersist()
