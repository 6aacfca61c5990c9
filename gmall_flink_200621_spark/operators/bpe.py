"""BPE tokenizer-vocabulary induction on Spark — the merge-table training
step of byte-pair encoding (Sennrich et al. 2016), the second member of
the engine's iterative-algorithm class (with `dedup_clusters`' connected
components): a driver-orchestrated loop where each round is one
distributed aggregation plus one distributed map, and the driver sees only
the 1-row argmax.

Per merge round over the word-frequency table (NOT the corpus — the
corpus collapses once to distinct words × frequency, the standard BPE
trick that makes round cost O(|vocab|), not O(corpus)):

1. adjacent symbol pairs per word via two `slice`+`arrays_zip` (no
   explode of single characters — pairs only), weighted by word frequency;
2. global argmax pair = orderBy(count desc, pair asc).limit(1) — a 1-row
   collect, the same driver-sees-a-scalar shape as the CC loop's
   convergence probe;
3. apply the merge with a left-to-right fold (`aggregate`) over each
   word's symbol array — non-overlapping greedy, matching the canonical
   implementation — and `localCheckpoint` so the plan stays O(1) deep
   across rounds.

No SQL oracle: the loop's argmax feeds the next round's input, which a
single DuckDB statement cannot express — this is exactly the
"genuinely non-SQL-expressible iterative algorithm" carve-out of the
driver contract (rows-only check there); exactness is pinned instead by
`tests/test_operators.py::TestBpe` against a pure-Python reference BPE
on the same corpus, merge-for-merge."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

BPE_MERGES = 12


def _chars(word):
    """word → array of single-character symbols (split('', ...) is
    version-fragile around empty edges; substring indexing is not)."""
    return F.transform(F.sequence(F.lit(1), F.length(word)), lambda i: word.substr(i, F.lit(1)))


def _apply_merge(syms, a: str, b: str):
    """Left-to-right non-overlapping merge of adjacent (a, b) → a+b —
    the canonical greedy BPE application, as an array fold."""
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_merges(docs: DataFrame, n_merges: int = BPE_MERGES) -> DataFrame:
    """Train a BPE merge table on the corpus; returns
    (rank, left, right, pair_count) — rank 1 is the first (most frequent)
    merge. Deterministic: ties break on (left, right) ascending."""
    spark = docs.sparkSession
    wf = (
        docs.select(F.explode(tokens("text")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("freq", _chars(F.col("w")).alias("syms"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        n = F.size("syms")
        pairs = (
            wf.filter(n >= 2)
            .select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice("syms", 1, n - 1).alias("a"),
                        F.slice("syms", 2, n - 1).alias("b"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not top:
            break
        a, b, cnt = top[0].a, top[0].b, top[0].cnt
        merges.append((rank, a, b, int(cnt)))
        wf = wf.select("freq", _apply_merge(F.col("syms"), a, b).alias("syms")).localCheckpoint(
            eager=True
        )
    return spark.createDataFrame(merges, "rank int, left string, right string, pair_count long")


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a trained merge table: the ENCODE side of BPE, and the part
    that actually runs at corpus scale — a pure map. All merges compile
    into ONE chained column expression (merge k's fold consumes merge
    k-1's output array), so the whole vocabulary applies in a single
    scan-bound pass with zero shuffles and zero driver round-trips, token
    arrays never leaving the executor. Output: (doc_id, n_words,
    n_bpe_tokens, compression) — corpus token-budget accounting under the
    learned vocabulary.

    `merges` is the (left, right) list from `bpe_merges` in rank order —
    apply order IS rank order, as in the canonical encoder."""
    words = F.split(F.col("text"), " ")
    # per word: chars → fold each merge in rank order
    def encode_word(w):
        syms = F.transform(F.sequence(F.lit(1), F.length(w)), lambda i: w.substr(i, F.lit(1)))
        for a, b in merges:
            syms = _apply_merge(syms, a, b)
        return F.size(syms)

    n_bpe = F.aggregate(
        F.transform(words, encode_word), F.lit(0).cast("long"), lambda acc, n: acc + n
    )
    return docs.select(
        "doc_id",
        F.size(words).cast("int").alias("n_words"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(
            F.aggregate(words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)).cast(
                "double"
            )
            / n_bpe,
            6,
        ).alias("chars_per_token"),
    )
