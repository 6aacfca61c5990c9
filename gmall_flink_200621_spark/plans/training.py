"""Training-data pipeline queries: `(spark, sf_dir) -> DataFrame` wrappers
around operators/{dedup,similarity,textops}.py over the `documents` and
`embeddings` tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import dedup as D
from ..operators import similarity as V
from ..operators import textops as T
from ..sources.loaders import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.doc_fingerprints(_docs(spark, sf_dir))


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.dedup_exact(_docs(spark, sf_dir))


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.dedup_ngram_jaccard(_docs(spark, sf_dir))


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.dedup_minhash_lsh(_docs(spark, sf_dir))


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_signatures(_docs(spark, sf_dir))


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_fingerprints(_docs(spark, sf_dir))


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.dedup_simhash(_docs(spark, sf_dir))


def doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.doc_stats(_docs(spark, sf_dir))


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.lang_id(_docs(spark, sf_dir))


def rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.rolling_fingerprint(_docs(spark, sf_dir))


def knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    return V.knn_brute(_emb(spark, sf_dir))


def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return V.knn_lsh(_emb(spark, sf_dir))


def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return V.knn_ivf(_emb(spark, sf_dir))


def embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return V.embedding_dedup(_emb(spark, sf_dir))


TRAINING_QUERIES = {
    "doc_fingerprint": doc_fingerprint,
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "minhash_signatures": minhash_signatures,
    "simhash_fingerprints": simhash_fingerprints,
    "dedup_simhash": dedup_simhash,
    "doc_stats": doc_stats,
    "lang_id": lang_id,
    "rolling_fingerprint": rolling_fingerprint,
    "knn_brute": knn_brute,
    "knn_lsh": knn_lsh,
    "knn_ivf": knn_ivf,
    "embedding_dedup": embedding_dedup,
}
