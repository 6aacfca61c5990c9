"""Document deduplication operators (training-data pipeline surface).

Six strategies over the `documents` table, each scale-first:

- exact: md5-fingerprint groupBy — one shuffle on the 128-bit digest, never
  on the raw text (at 100 TB you shuffle 16-byte keys, not documents).
- ngram_jaccard: exact all-pairs Jaccard ≥ t via a shingle inverted index
  (explode distinct shingles → self-join on shingle → pair-count). No
  quadratic cross join: cost is Σ bucket², bounded by shingle frequency.
- minhash_lsh: MinHash signatures (universal hashing, `functions/text.py`)
  banded into buckets; candidate pairs from bucket collisions only, then
  exact-Jaccard verification of candidates. The scale path: signature is
  O(perms) per doc, candidates ≪ all-pairs.
- simhash: 60-bit SimHash fingerprint; near-dup pairs via 4×15-bit band
  bucketing + hamming ≤ k verification (bit_count(xor)).
- substring: doc pairs sharing ≥k exact 8-token runs via the Rabin-Karp
  window-fingerprint inverted index (integer keys) — the distributed form
  of suffix-array exact-substring dedup (Lee et al. 2022).
- embedding cosine: see `operators/similarity.py` (same candidate-then-
  verify shape over vectors).

Everything is deterministic and built-in-function-only, so each operator
has an exact DuckDB oracle (plans/training_oracle.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import h60, minhash_sig, shingles, tokens

SHINGLE_N = 3
MINHASH_PERMS = 16
LSH_BANDS = 4  # 4 bands × 4 rows: P(candidate | j=0.9) ≈ 0.986
JACCARD_THRESHOLD = 0.8
SIMHASH_BITS = 60
SIMHASH_BANDS = 4
HAMMING_MAX = 3
# Document-frequency cap: shingles occurring in more docs than this are
# dropped from the inverted index / signatures (see _doc_shingles). On the
# testdata max df is 9, so 50 changes nothing; at corpus scale it bounds
# the Σ df² bucket-join blowup. Mirrored in the DuckDB oracles.
DF_CAP = 50


from .partitioning import fan_out as _fan_out


def doc_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp): md5 of the raw text."""
    return docs.select("doc_id", F.md5("text").alias("fp"))


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact dedup: keep the lowest doc_id per fingerprint.
    Shuffles only (fp, doc_id) pairs; map-side partial min first."""
    return (
        doc_fingerprints(docs)
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _doc_shingles(docs: DataFrame, df_cap: int | None = DF_CAP) -> DataFrame:
    """(doc_id, shingle) — distinct word-3-gram shingles per doc, with
    hyper-frequent shingles (document frequency > df_cap) dropped.

    Why the cap is sound: a shingle present in >df_cap documents is
    boilerplate (stopword n-grams, licence headers) and contributes up to
    C(df, 2) rows to every inverted-index self-join — the one quadratic
    skew term in the pipeline (Σ df² over shingles). Dropping k such
    shingles from a pair's universe perturbs its Jaccard by at most
    k / (|A∪B| − k): numerator and denominator each shrink by at most k,
    so J' = (i−s)/(u−s) with s ≤ k stays within that bound of J = i/u.
    With df_cap chosen ≫ typical near-dup cluster size, true duplicates
    keep J ≈ 1 while the index stays skew-free. The frequent-shingle list
    is tiny by construction (> df_cap occurrences each), so the filter is
    a broadcast anti-join — no extra shuffle of the shingle frame.

    Tokens are materialized into a column before shingling: `shingles()`
    references its input array per element, and inlining the raw
    `split(text)` expression there would re-parse the text O(positions)
    times per row (measured 20×+ slowdown)."""
    toked = _fan_out(docs).select("doc_id", tokens("text").alias("toks"))
    sh = toked.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("toks"), SHINGLE_N))).alias("shingle"),
    ).filter(F.col("shingle") != "")
    if df_cap is None:
        return sh
    # persist the raw shingle frame: it feeds both the hot-shingle scan and
    # the anti-join probe — without this the tokenize+explode runs twice
    sh = sh.persist()
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > df_cap)
        .select("shingle")
    )
    return sh.join(F.broadcast(hot), "shingle", "left_anti").select("doc_id", "shingle")


def _shingle_pair_counts(docs: DataFrame, df_cap: int | None = DF_CAP) -> DataFrame:
    """(id_a, id_b, n_common, n_a, n_b) for every doc pair sharing ≥1
    shingle — the inverted-index core both set-similarity metrics
    (Jaccard, containment) divide differently.

    The self-join keys on the 60-bit shingle hash, not the string: the
    inverted-index shuffle carries 8-byte longs instead of ~20-byte
    3-gram strings (3× fewer shuffle bytes, integer comparisons) — the
    same hash-first move MinHash makes, with the same recipe (h60) on
    both engines so the oracle replicates any collision identically.
    n_sh counts rows of the distinct-shingle frame, so sizes are
    unaffected by hashing; a cross-shingle collision inside one pair
    would overcount n_common with probability ~pairs·shingles²/2^61 —
    negligible, deterministic, and engine-identical."""
    # the shingle frame feeds the self-join twice plus the size agg —
    # persist so the tokenize+explode runs once, not 3×
    sh = (
        _doc_shingles(docs, df_cap)
        .select("doc_id", h60(F.col("shingle")).alias("sh60"))
        .persist()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh60") == F.col("b.sh60")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return common.join(sa, "id_a").join(sb, "id_b")


def dedup_ngram_jaccard(
    docs: DataFrame, threshold: float = JACCARD_THRESHOLD, df_cap: int | None = DF_CAP
) -> DataFrame:
    """Exact all-pairs Jaccard via inverted index (df-capped shingles —
    see _doc_shingles for the skew/error-bound argument).

    explode shingles → self-join on shingle (the inverted-index bucket
    join) → |A∩B| per pair → Jaccard with per-doc sizes. Integer-exact, so
    the threshold compare is engine-independent; the float jaccard output
    is a ratio of exact ints (identical division both sides).
    """
    return (
        _shingle_pair_counts(docs, df_cap)
        .withColumn("jaccard", F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


CONTAINMENT_THRESHOLD = 0.9


def dedup_containment(
    docs: DataFrame, threshold: float = CONTAINMENT_THRESHOLD, df_cap: int | None = DF_CAP
) -> DataFrame:
    """Containment similarity |A∩B| / min(|A|,|B|) over the same
    inverted-index pair counts — the metric that catches SUB-document
    duplication (a doc wholly contained in a longer one scores ~1.0 here
    but low Jaccard, the classic boilerplate-wrapper miss)."""
    return (
        _shingle_pair_counts(docs, df_cap)
        .withColumn("containment", F.col("n_common") / F.least("n_a", "n_b"))
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


SPARSE_COS_THRESHOLD = 0.6


def sparse_cosine_pairs(
    docs: DataFrame, threshold: float = SPARSE_COS_THRESHOLD, df_cap: int | None = DF_CAP
) -> DataFrame:
    """Weighted sparse-vector all-pairs similarity join (the Bayardo et
    al. 2007 / WHIMP shape): documents as TF vectors over word-3-gram
    shingles, emit pairs with cosine ≥ threshold. Complements the SET
    metrics on the same index: Jaccard ignores multiplicity and
    containment ignores the non-shared mass — tf-cosine catches
    "same phrases, different proportions" near-dups (template spam with
    repeated blocks) that both set metrics under-score.

    Same inverted-index discipline as _shingle_pair_counts: the self-join
    keys on h60(shingle) (8-byte longs), hyper-frequent shingles are
    df-capped BEFORE norms are taken (so the cosine is consistently the
    capped-vector cosine — the cap bound argument from _doc_shingles
    applies per component), and the pair dot Σ tf_a·tf_b is an exact
    int64 sum — the only floats are two sqrt and one divide, identical
    cross-engine at round(6). Cost is Σ df² over surviving shingles,
    never N²."""
    toked = _fan_out(docs).select("doc_id", tokens("text").alias("toks"))
    tf = (
        toked.select("doc_id", F.explode(shingles(F.col("toks"), SHINGLE_N)).alias("shingle"))
        .filter(F.col("shingle") != "")
        .select("doc_id", h60(F.col("shingle")).alias("sh60"))
        .groupBy("doc_id", "sh60")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    hot = (
        tf.groupBy("sh60")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > df_cap)
        .select("sh60")
    )
    capped = tf.join(F.broadcast(hot), "sh60", "left_anti").persist()
    n2 = capped.groupBy("doc_id").agg(F.sum(F.col("tf") * F.col("tf")).alias("n2"))
    a = capped.alias("a")
    b = capped.alias("b")
    dots = (
        a.join(b, (F.col("a.sh60") == F.col("b.sh60")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.sum(F.col("a.tf") * F.col("b.tf")).alias("dot"))
    )
    na = n2.select(F.col("doc_id").alias("id_a"), F.col("n2").alias("na2"))
    nb = n2.select(F.col("doc_id").alias("id_b"), F.col("n2").alias("nb2"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "cosine",
            F.col("dot") / (F.sqrt(F.col("na2").cast("double")) * F.sqrt(F.col("nb2").cast("double"))),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


BENCH_PER_MILLE = 20  # 2% of docs act as the held-out eval set


def decontaminate(
    docs: DataFrame,
    bench_per_mille: int = BENCH_PER_MILLE,
    seed: str = "bench0",
    df_cap: int | None = DF_CAP,
) -> DataFrame:
    """Benchmark decontamination: per training doc, how many of its
    shingles also appear in the held-out eval set (the n-gram-overlap
    check every LLM training pipeline runs before training so eval
    numbers aren't memorization; cf. the GPT-3/Llama 13-gram procedure —
    here word-3-grams to match the corpus' shingle unit).

    The bench/train split is a pure function of (seed, doc_id) — the same
    md5 hash-bucket recipe as corpus_split, so NO join is needed to
    separate the sides: the predicate evaluates row-local on the shingle
    frame. The eval set is tiny by construction (bench_per_mille/1000 of
    docs), so its distinct-shingle frame broadcasts, and contamination
    scoring is one broadcast hash join + one doc_id groupBy — never a
    self-join, never a shuffle of the corpus text. That is the shape that
    survives 100 TB: cost is one linear pass over training shingles.

    Output: one row per training doc that has ≥1 shingle —
    (doc_id, n_shingles, n_hits, hit_frac, contaminated).
    hit_frac is a single IEEE division of exact ints (engine-identical).
    """
    from .textops import _hash_bucket

    is_bench = _hash_bucket(seed) < bench_per_mille
    # the shingle frame feeds both the bench side and the train side —
    # persist so tokenize+explode runs once
    sh = _doc_shingles(docs, df_cap).persist()
    bench_shingles = sh.filter(is_bench).select("shingle").distinct()
    hits = bench_shingles.withColumn("hit", F.lit(1))
    return (
        sh.filter(~is_bench)
        .join(F.broadcast(hits), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("hit").alias("n_hits"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_hits",
            (F.col("n_hits") / F.col("n_shingles")).alias("hit_frac"),
            (F.col("n_hits") > 0).alias("contaminated"),
        )
    )


def shingle_novelty(docs: DataFrame) -> DataFrame:
    """Per-doc novelty: the fraction of a doc's distinct shingles that are
    corpus-unique (document frequency 1) — a diversity/quality signal
    (low novelty ⇒ the doc is assembled from phrases the corpus already
    has; high ⇒ genuinely new text). Uses the UNcapped shingle set: df
    counting is a linear map-side-combinable aggregate, so the quadratic
    skew argument behind DF_CAP doesn't apply here.

    Shape at scale: one groupBy(shingle) with partial aggregation, one
    shuffle join back on shingle, one groupBy(doc_id) — all linear in
    corpus shingle count, no pair terms.
    """
    # feeds the df aggregate AND the join back — persist, run explode once
    sh = _doc_shingles(docs, None).persist()
    df = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(df, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.when(F.col("df") == 1, 1)).alias("n_unique"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_unique",
            (F.col("n_unique") / F.col("n_shingles")).alias("novelty"),
        )
    )


def minhash_signatures(
    docs: DataFrame,
    perms: int = MINHASH_PERMS,
    df_cap: int | None = DF_CAP,
    shingle_frame: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, sig_0..sig_{perms-1}): min over shingle hashes per permutation.
    One explode + one groupBy; signature width is constant per doc.
    Signatures are computed over the df-capped shingle set so they estimate
    the same capped Jaccard the verification step computes.

    `shingle_frame` lets a caller that ALSO needs the shingle set (the
    LSH verify stage) pass one shared, persisted frame instead of paying
    tokenize+explode+df-cap twice."""
    sh = shingle_frame if shingle_frame is not None else _doc_shingles(docs, df_cap)
    hashed = sh.select("doc_id", h60(F.col("shingle")).alias("h"))
    aggs = [F.min(minhash_sig(F.col("h"), i)).alias(f"sig_{i}") for i in range(perms)]
    return hashed.groupBy("doc_id").agg(*aggs)


def source_minhash_setops(
    docs: DataFrame, perms: int = MINHASH_PERMS, df_cap: int | None = DF_CAP
) -> DataFrame:
    """Sketch-based SET OPERATIONS between corpus sources: each source's
    shingle set is summarized by one MinHash signature (elementwise MIN
    over every member hash — the merge that makes MinHash a distributed
    sketch: per-partition partial mins combine associatively, so a
    source's signature costs one combinable aggregation no matter how
    many documents or executors), then every source pair reports the
    signature-estimated Jaccard NEXT TO the exact one — the
    estimate-error audit that tells you whether the 16-perm sketch is
    trustworthy before you rely on it where the exact computation is
    unaffordable.

    Scale shape: the exact path shuffles distinct (source, h60) longs
    (never text) once for the per-source sizes and once self-joined on h
    for intersections — Σ per-hash source-pair work, bounded by shingle
    sharing; the SKETCH path is O(sources · perms) after one combinable
    agg — the 100 TB survivor when sources × shingles explodes. Pairs
    with no shared shingles still emit (exact_jaccard 0). Integer counts
    + dyadic est division ⇒ oracle-exact."""
    src_h = (
        _doc_shingles(docs, df_cap)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", h60(F.col("shingle")).alias("h"))
        .distinct()
        .persist()
    )
    sigs = src_h.groupBy("source").agg(
        F.array(*[F.min(minhash_sig(F.col("h"), i)) for i in range(perms)]).alias("sig"),
        F.count(F.lit(1)).alias("n_sh"),
    )
    a = sigs.select(
        F.col("source").alias("source_a"), F.col("sig").alias("sig_a"), F.col("n_sh").alias("n_a")
    )
    b = sigs.select(
        F.col("source").alias("source_b"), F.col("sig").alias("sig_b"), F.col("n_sh").alias("n_b")
    )
    est = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
    pairs = a.join(F.broadcast(b), F.col("source_a") < F.col("source_b"))
    inter = (
        src_h.alias("x")
        .join(src_h.alias("y"), (F.col("x.h") == F.col("y.h")) & (F.col("x.source") < F.col("y.source")))
        .groupBy(F.col("x.source").alias("source_a"), F.col("y.source").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        pairs.join(inter, ["source_a", "source_b"], "left")
        .withColumn("n_common", F.coalesce("n_common", F.lit(0)))
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_common",
            (F.col("n_a") + F.col("n_b") - F.col("n_common")).alias("n_union"),
            (F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))).alias(
                "exact_jaccard"
            ),
            (est / F.lit(perms)).alias("est_jaccard"),
        )
    )


def stacked_band_frame(sigs: DataFrame, perms: int = MINHASH_PERMS, bands: int = LSH_BANDS) -> DataFrame:
    """(doc_id, bi, bv): LSH band values in STACKED long form, so the
    bucket join is ONE self-join keyed on (band_idx, value) — `bands`
    separate join branches would shuffle the signature frame 2·bands
    times and schedule bands× the stages; the stacked form shuffles 2
    frames of bands× rows once (same bytes, 1/bands the scheduling + a
    single distinct). Shared by the batch LSH and the incremental
    near-dup ingest (`streaming/ingest.py`), so both bucket identically."""
    rows = perms // bands
    band_cols = [
        F.concat_ws("_", *[F.col(f"sig_{b * rows + r}") for r in range(rows)]).alias(f"band_{b}")
        for b in range(bands)
    ]
    return (
        sigs.select("doc_id", *band_cols)
        .select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(b).alias("bi"), F.col(f"band_{b}").alias("bv"))
                        for b in range(bands)
                    ]
                )
            ).alias("s"),
        )
        .select("doc_id", F.col("s.bi").alias("bi"), F.col("s.bv").alias("bv"))
    )


def dedup_minhash_lsh(
    docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    perms: int = MINHASH_PERMS,
    bands: int = LSH_BANDS,
    df_cap: int | None = DF_CAP,
) -> DataFrame:
    """MinHash + LSH banding + exact-Jaccard verification, both over the
    df-capped shingle set (see _doc_shingles).

    Candidate generation never compares all pairs: docs collide only when
    one whole band of their signatures is equal. Verification recomputes
    exact Jaccard just for candidates (semi-joined shingle sets).
    """
    # ONE df-capped shingle frame feeds both the signature aggregate and
    # the exact-Jaccard verification below — tokenize+explode+df-cap is
    # the dominant linear cost and must not run twice per query
    sh = _doc_shingles(docs, df_cap).persist()
    sigs = minhash_signatures(docs, perms, df_cap, shingle_frame=sh)
    stacked = stacked_band_frame(sigs, perms, bands).persist()
    x = stacked.select(F.col("doc_id").alias("id_a"), "bi", "bv")
    y = stacked.select(F.col("doc_id").alias("id_b"), "bi", "bv")
    candidates = (
        x.join(y, ["bi", "bv"]).filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b").distinct()
    )

    # verify: exact jaccard restricted to candidate pairs (same sh frame)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b2 = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    common = (
        candidates.join(a, "id_a")
        .join(b2, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dedup_clusters(docs: DataFrame, pairs: DataFrame | None = None, max_iters: int = 20) -> DataFrame:
    """Connected components over the near-duplicate pair graph: every doc
    gets the min doc_id of its component as `canonical_id` (singletons map
    to themselves) — the step after pair detection in every corpus build
    (A~B and B~C must collapse to ONE canonical even when A~C was never
    emitted as a pair).

    The engine's iterative-algorithm surface: min-label propagation run as
    a driver-orchestrated loop of joins (the standard Pregel-style shape —
    per-iteration data stays fully distributed, the driver sees only the
    converged? scalar). Each round does a neighbor-min hop AND a pointer
    jump (labels follow their own label one step — path compression), so
    convergence needs O(log diameter) rounds, not O(diameter): a chain of
    2^k collapses in ~k rounds. Labels decrease monotonically, so
    zero-changes means fixpoint. The DuckDB oracle computes the same
    components with a recursive CTE — exact equality, not approximate
    clustering.

    Each iteration's label frame is `localCheckpoint(eager=True)`-ed, not
    merely persisted: persist caches the DATA but leaves the logical plan
    growing by one join layer per iteration, so Catalyst re-analyzes an
    O(iterations)-deep lineage every loop (driver-side planning time and
    memory grow without bound on deep components). Checkpointing truncates
    the plan to a leaf, making per-iteration planning cost constant — on a
    real cluster with lineage-loss concerns, swap for `checkpoint()` with
    a reliable checkpoint dir; semantics are identical.

    The loop runs over V(pair graph) ONLY: a doc with no near-dup pair can
    never change its label, so the iteration space is the dup-graph
    vertices (a small fraction of any real corpus — dedup rates are
    percent-scale, so at 100 TB the loop touches GBs, not TBs), and the
    full corpus is joined back exactly once at the end with
    coalesce(label, doc_id)."""
    if pairs is None:
        pairs = dedup_minhash_lsh(docs)
    # materialize the pair list before the symmetrizing union references
    # it twice — an expensive upstream builder (the LSH band join, or
    # knn_graph's banded matmul when components_knn passes similarity
    # edges) must run once, not once per union branch. pairs/labels are
    # LAZY (r13): the single eager barrier on `edges` materializes the
    # pair builder once and truncates it out of the loop's plans; labels
    # (a distinct over the edges leaf) materializes inside iteration 1's
    # probe job — one setup barrier instead of three
    pairs = pairs.select("id_a", "id_b").localCheckpoint(eager=False)
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # symmetrized edge list ⇒ src set == vertex set
    labels = (
        edges.select("src")
        .distinct()
        .select(F.col("src").alias("doc_id"), F.col("src").alias("canonical_id"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iters):
        nbr_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("canonical_id").alias("nbr_min"))
        )
        hopped = labels.join(nbr_min, labels.doc_id == nbr_min.src, "left").select(
            "doc_id",
            F.col("canonical_id").alias("old_label"),
            F.least(F.col("canonical_id"), F.coalesce("nbr_min", F.col("canonical_id"))).alias(
                "canonical_id"
            ),
        )
        # pointer jump: follow the label's own label one hop (labels are
        # always doc_ids within the component, so the self-join always
        # matches and the min-monotone invariant is preserved). The change
        # flag rides along so convergence detection is a scan of this
        # (checkpointed, tiny) frame — not a second old⋈new join job per
        # iteration (r05: 2 jobs/iter instead of 3).
        lab2 = hopped.select(
            F.col("doc_id").alias("j_id"), F.col("canonical_id").alias("j_canon")
        )
        new_labels = (
            hopped.join(lab2, hopped.canonical_id == lab2.j_id)
            .select(
                "doc_id",
                F.col("j_canon").alias("canonical_id"),
                (F.col("j_canon") != F.col("old_label")).alias("chg"),
            )
            .localCheckpoint(eager=False)
        )
        # any-change probe doubles as the checkpoint's materializing job
        # (ONE job per iteration, r13 — was eager-ckpt + probe, two).
        # Full count, NOT limit(1).count(): a limit can finish without
        # computing every partition, and the lazy checkpoint then runs a
        # BACKFILL job for the missed partitions before truncating — two
        # jobs again; the full count computes every partition in one.
        changed = new_labels.filter("chg").count()
        labels = new_labels.drop("chg")
        if changed == 0:
            break
    return docs.select("doc_id").join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("canonical_id", "doc_id").alias("canonical_id")
    )


def simhash_fingerprints(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash): 60-bit SimHash over distinct-token 60-bit hashes.

    Explodes (token × bit) — heavy but linear; at scale, prefer running it
    once and persisting. Bit j of the fingerprint is set iff more token
    hashes have bit j set than unset (strict majority, ties → 0)."""
    # Arrow-batched vectorized computation (mapInPandas), not a JVM
    # expression: a 60-conditional-sum aggregate compiles into a
    # pathologically large generated method (codegen-cache thrash measured
    # 4.6s → 57s in aged sessions), and a (token × bit) explode shuffles
    # 60× the rows. Per-doc numpy bit-count is O(tokens × bits) with zero
    # shuffle — the documented Pandas-UDF exception for operators the
    # built-in expression path can't express efficiently.
    #
    # The hash is the same md5-prefix integer the SQL oracle computes
    # (hashlib.md5 == Spark md5 == DuckDB md5), so results stay
    # bit-identical. Bit j is set iff a strict majority of distinct-token
    # hashes have it set. Docs with no tokens are omitted (matching the
    # aggregate formulation and the oracle).
    import hashlib
    from collections.abc import Iterator as _It

    import numpy as np

    def run(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        jrange = np.arange(bits, dtype=np.int64)
        for pdf in batches:
            ids, fps = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = {t for t in (text or "").split(" ") if t}
                if not toks:
                    continue
                hs = np.fromiter(
                    (int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in toks),
                    dtype=np.int64,
                    count=len(toks),
                )
                set_counts = ((hs[:, None] >> jrange[None, :]) & 1).sum(axis=0)
                fp = int(((2 * set_counts > len(toks)).astype(np.int64) << jrange).sum())
                ids.append(doc_id)
                fps.append(fp)
            yield pd.DataFrame({"doc_id": ids, "simhash": fps})

    return _fan_out(docs.select("doc_id", "text")).mapInPandas(run, "doc_id long, simhash long")


def dedup_simhash(docs: DataFrame, hamming_max: int = HAMMING_MAX) -> DataFrame:
    """Near-dup pairs by SimHash: band the 60 bits into 4×15-bit chunks
    (pigeonhole: hamming ≤ 3 ⇒ at least one chunk equal), bucket-join on
    chunks, verify hamming distance with bit_count(xor)."""
    fp = simhash_fingerprints(docs)
    chunk_cols = [
        (F.shiftright(F.col("simhash"), b * 15).bitwiseAND(F.lit((1 << 15) - 1))).alias(f"c_{b}")
        for b in range(SIMHASH_BANDS)
    ]
    # stacked long form (see dedup_minhash_lsh): ONE self-join on
    # (chunk_idx, chunk_value) instead of SIMHASH_BANDS join branches;
    # persisted because it feeds both sides and the fingerprint pipeline
    # (mapInPandas) is the expensive producer
    stacked = (
        fp.select("doc_id", "simhash", *chunk_cols)
        .select(
            "doc_id",
            "simhash",
            F.explode(
                F.array(
                    *[F.struct(F.lit(b).alias("ci"), F.col(f"c_{b}").alias("cv")) for b in range(SIMHASH_BANDS)]
                )
            ).alias("s"),
        )
        .select("doc_id", "simhash", F.col("s.ci").alias("ci"), F.col("s.cv").alias("cv"))
        .persist()
    )
    x = stacked.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"), "ci", "cv")
    y = stacked.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"), "ci", "cv")
    cands = (
        x.join(y, ["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
    )
    return (
        cands.distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= hamming_max)
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
    )


SUBSTR_MIN_WINDOWS = 25  # ≥25 shared 8-token windows ≈ ≥32 tokens of shared runs
SUBSTR_DF_CAP = 50  # window-fps present in more docs are boilerplate runs


def dedup_substring(
    docs: DataFrame,
    min_windows: int = SUBSTR_MIN_WINDOWS,
    df_cap: int | None = SUBSTR_DF_CAP,
) -> DataFrame:
    """Exact-substring duplication (the sixth dedup strategy — the
    distributed form of Lee et al. 2022's suffix-array exact-substring
    dedup): doc pairs sharing ≥ `min_windows` distinct 8-token window
    fingerprints. A shared token run of length L contributes L−7 window
    fps, so min_windows=25 ≈ 32 tokens of verbatim shared text — the
    signal Jaccard dilutes away when the rest of the docs differ (the
    copied-paragraph case) and shingle-containment only catches when one
    doc is mostly inside the other.

    Scale shape: same candidates-free inverted index as ngram_jaccard but
    keyed on 8-byte INTEGER fps — the self-join shuffles longs, never
    shingle strings; Σ df² is bounded by the same df-cap argument as
    _doc_shingles (a window shared by > df_cap docs is boilerplate, and
    dropping it perturbs a pair's shared count by at most the number of
    dropped fps). False positives require a 60-bit-hash collision inside
    an 8-token window — negligible and engine-identical (same integer
    recipe both sides)."""
    from .textops import RK_WINDOW, rk_token_hashes, rk_window_fps

    hashed = rk_token_hashes(docs)
    guarded = F.when(F.size("th") >= RK_WINDOW, F.array_distinct(rk_window_fps())).otherwise(
        F.array().cast("array<long>")
    )
    wfp = hashed.select("doc_id", F.explode(guarded).alias("wfp"))
    if df_cap is not None:
        # persist: feeds the hot-fp scan and the anti-join probe
        wfp = wfp.persist()
        hot = (
            wfp.groupBy("wfp")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > df_cap)
            .select("wfp")
        )
        wfp = wfp.join(F.broadcast(hot), "wfp", "left_anti")
    a = wfp.select(F.col("doc_id").alias("id_a"), "wfp")
    b = wfp.select(F.col("doc_id").alias("id_b"), "wfp")
    return (
        a.join(b, "wfp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_windows)
    )


def contamination_matrix(docs: DataFrame) -> DataFrame:
    """Cross-source contamination matrix: for every pair of corpus
    sources, the number of DISTINCT word-3-gram shingles they share and
    the overlap coefficient (n_common / min-source-vocabulary) — the
    audit that catches one crawl snapshot bleeding into another, or an
    eval set leaking into a training source, at the SOURCE granularity
    (decontaminate covers the per-document case).

    Scale shape: the corpus collapses to a distinct (source, h60) frame —
    one shuffle of 8-byte hashes keyed by shingle. The self-join fan-out
    per shingle is C(#sources-containing-it, 2), and the number of
    SOURCES is bounded (tens, not millions), so the blowup is ≤ C(S,2)
    per shingle regardless of corpus size — no df-cap needed, unlike the
    per-document inverted index. Output is C(S,2) rows."""
    sh = (
        _doc_shingles(docs, df_cap=None)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", h60(F.col("shingle")).alias("sh60"))
        .distinct()
        .persist()
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh60") == F.col("b.sh60")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            F.round(F.col("n_common") / F.least("n_a", "n_b"), 6).alias("overlap"),
        )
    )


def dedup_eval(docs: DataFrame) -> DataFrame:
    """Recall evaluation of the MinHash-LSH detector against the exact
    inverted-index Jaccard ground truth at the same threshold — the
    one-row report a pipeline owner checks before trusting LSH at a new
    banding/permutation setting. LSH emits only exact-verified pairs, so
    false positives are structurally zero (precision 1.0 — asserted by
    construction, still reported); the number that can move is RECALL:
    pairs whose signatures never collided in any band.

    Both pair sets are Σ-bucket²-bounded (shared df-capped shingle
    machinery); the comparison joins two candidate-pair frames — tiny
    relative to the corpus — and aggregates to a single row."""
    exact = dedup_ngram_jaccard(docs).select("id_a", "id_b")
    lsh = dedup_minhash_lsh(docs).select("id_a", "id_b")
    j = exact.withColumn("in_exact", F.lit(1)).join(
        lsh.withColumn("in_lsh", F.lit(1)), ["id_a", "id_b"], "full_outer"
    )
    return j.agg(
        F.sum(F.coalesce("in_exact", F.lit(0))).alias("n_exact"),
        F.sum(F.coalesce("in_lsh", F.lit(0))).alias("n_lsh"),
        F.sum(
            F.when(F.col("in_exact").isNotNull() & F.col("in_lsh").isNotNull(), 1).otherwise(0)
        ).alias("n_common"),
    ).select(
        "n_exact",
        "n_lsh",
        "n_common",
        F.round(
            F.when(F.col("n_lsh") > 0, F.col("n_common") / F.col("n_lsh")).otherwise(F.lit(1.0)), 6
        ).alias("precision"),
        F.round(
            F.when(F.col("n_exact") > 0, F.col("n_common") / F.col("n_exact")).otherwise(F.lit(1.0)),
            6,
        ).alias("recall"),
    )


def split_leakage_audit(docs: DataFrame) -> DataFrame:
    """Eval-leakage audit: near-duplicate pairs that STRADDLE the
    train/val/test split — the check that catches "the eval set scores
    great because its near-twins are in training" before anyone trains.
    Composes the LSH pair detector with the deterministic hash split
    (`textops.corpus_split`): one row per (split_a, split_b) with the
    crossing pair count; same-split rows are reported too (they're the
    harmless baseline the crossing counts are read against). The pair
    frame is tiny (dedup-rate-scale), so the split joins broadcast the
    ~9-byte (doc_id, split) assignment of pair members only at scale —
    the corpus itself never re-shuffles."""
    from .textops import corpus_split

    splits = corpus_split(docs)
    pairs = dedup_minhash_lsh(docs)
    a = splits.select(F.col("doc_id").alias("id_a"), F.col("split").alias("split_a"))
    b = splits.select(F.col("doc_id").alias("id_b"), F.col("split").alias("split_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .groupBy(
            F.least("split_a", "split_b").alias("split_a"),
            F.greatest("split_a", "split_b").alias("split_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .withColumn("leaks", (F.col("split_a") != F.col("split_b")).cast("int"))
    )


CAS_SEED = "casplit0"
CAS_VAL_PER_MILLE = 50
CAS_TEST_PER_MILLE = 50


def cluster_aware_split(
    docs: DataFrame,
    val_per_mille: int = CAS_VAL_PER_MILLE,
    test_per_mille: int = CAS_TEST_PER_MILLE,
    seed: str = CAS_SEED,
) -> DataFrame:
    """LEAK-FREE train/val/test assignment: hash-split by near-duplicate
    COMPONENT instead of by document, so a doc and all its near-twins
    land in the same split by construction — the fix for what
    `split_leakage_audit` measures (per-doc splitting strands ~half of
    every dup pair across the train/eval boundary and inflates eval
    scores). The split is a pure function of (seed, canonical_id):
    stable across engines and partitionings, and since canonical_id is
    the component's min doc_id, adding non-dup documents never moves an
    existing cluster's split.

    Shape: dedup_clusters' component labels (iterative loop over the
    dup-graph vertices only — see its docstring for the 100 TB posture)
    plus ONE row-local hash per doc; no additional shuffle beyond the
    clustering itself. Test-pinned invariant: zero near-dup pairs
    straddle splits (the audit's `leaks` column is 0 for every
    cross-split row)."""
    labels = dedup_clusters(docs)
    b = F.pmod(
        h60(F.concat(F.lit(seed), F.lit(":"), F.col("canonical_id").cast("string"))),
        F.lit(1000),
    )
    return labels.select(
        "doc_id",
        "canonical_id",
        F.when(b < val_per_mille, F.lit("val"))
        .when(b < val_per_mille + test_per_mille, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def duplicate_cluster_sizes(docs: DataFrame) -> DataFrame:
    """Cluster-size histogram over the near-dup components: how many
    clusters of each size exist (size ≥ 2 — singletons are the corpus) —
    the one-line health report for a dedup run (a fat tail here means
    boilerplate families or template spam, and predicts the dedup rate).
    Two tiny re-aggregations over dedup_clusters' output; the histogram
    frame is at most |distinct sizes| rows."""
    clusters = dedup_clusters(docs)
    sizes = clusters.groupBy("canonical_id").agg(F.count(F.lit(1)).alias("sz")).filter(
        F.col("sz") >= 2
    )
    return (
        sizes.groupBy(F.col("sz").alias("cluster_size"))
        .agg(F.count(F.lit(1)).alias("n_clusters"))
    )
