"""Text-analysis operators over `documents` (training-data pipeline surface).

All built-in functions, all with exact DuckDB oracles:
- doc_stats: token/char counts, uniq ratio, quality score
- lang_id: marker-stopword n-gram heuristic (deterministic; the corpus is
  synthetic word-bags, so the value is the operator shape + SQL parity,
  not linguistic accuracy)
- rolling fingerprints: Rabin-Karp polynomial hash over 8-token windows,
  min-selected per doc (winnowing-lite document signature)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import h60, shingles, tokens
from .partitioning import fan_out as _fan_out

# Rabin-Karp params — small enough that Σ(tok_mod·37^7) over 8 terms stays < 2^63
RK_WINDOW = 8
RK_BASE = 37
RK_TOKMOD = 1_000_003
RK_MOD = 1_000_000_007

# marker stopwords per language for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "la", "los", "que"),
    "de": ("der", "die", "und", "das"),
    "zh": ("的", "是", "了", "在"),
}


def doc_stats(docs: DataFrame) -> DataFrame:
    """Per-doc stats + a deterministic quality score in [0,1]:
    0.5·min(1, n_tokens/100) + 0.5·uniq_ratio — length and lexical
    diversity, the standard cheap quality gates."""
    # materialize the token array once — inlining split(text) into every
    # consumer re-parses the text per expression (same trap as _doc_shingles)
    out = docs.select("doc_id", F.length("text").alias("n_chars_actual"), tokens("text").alias("toks")).select(
        "doc_id",
        "n_chars_actual",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_uniq_tokens"),
    )
    return out.select(
        "doc_id",
        "n_chars_actual",
        "n_tokens",
        "n_uniq_tokens",
        F.round(F.col("n_uniq_tokens") / F.col("n_tokens"), 6).alias("uniq_ratio"),
        F.round(
            0.5 * F.least(F.lit(1.0), F.col("n_tokens") / 100.0)
            + 0.5 * (F.col("n_uniq_tokens") / F.col("n_tokens")),
            6,
        ).alias("quality_score"),
    )


SPLIT_BUCKETS = 1000


def _hash_bucket(seed: str) -> F.Column:
    """Deterministic per-doc bucket in [0, 1000): 60-bit md5 of
    seed||doc_id — the reproducibility property a training mixture needs
    (same seed ⇒ same sample on ANY engine/partitioning; both Spark and
    DuckDB compute the identical value, so splits are oracle-exact)."""
    return F.pmod(h60(F.concat(F.lit(seed), F.lit(":"), F.col("doc_id").cast("string"))), F.lit(SPLIT_BUCKETS))


def deterministic_sample(docs: DataFrame, rate_per_mille: int, seed: str = "s0") -> DataFrame:
    """Reproducible Bernoulli-style sampling: keep docs whose hash bucket
    falls below the rate. Unlike rand()/sampleBy, re-running (or running
    on a different engine or partitioning) selects the SAME documents."""
    return docs.filter(_hash_bucket(seed) < rate_per_mille)


# per-source BPE-token budgets for the mixture sampler: a handful of
# up-weighted sources, everything else at the base budget
MIXTURE_HI_SOURCES = ("src0", "src1", "src2", "src3", "src4")
MIXTURE_HI_BUDGET = 1200
MIXTURE_LO_BUDGET = 600


def corpus_mixture(
    docs: DataFrame,
    hi_sources: tuple[str, ...] = MIXTURE_HI_SOURCES,
    hi_budget: int = MIXTURE_HI_BUDGET,
    lo_budget: int = MIXTURE_LO_BUDGET,
    seed: str = "mix0",
) -> DataFrame:
    """Budgeted data-mixture construction: per source, keep documents in
    deterministic hash order until the source's BPE-token budget is
    reached — how a training mixture hits per-source token targets
    ("2 parts web, 1 part the rest") reproducibly. A doc is kept iff the
    budget was not yet exhausted when its turn came (running sum of
    PRIOR docs' tokens < budget), so the mixture is identical on any
    engine/partitioning and adding docs to one source never changes
    another source's selection.

    Shape: one tokenize pass for the BPE estimate (integer-exact,
    token_counts' formula), then ONE ordered window per source partition
    — the cumulative sum sorts each source's (hash, doc_id, n_bpe) rows,
    ~25 bytes/doc, never the text. At 100 TB the sort is per-source and
    spill-safe; sources are the natural partition and their doc counts
    the skew bound."""
    from pyspark.sql import Window

    bpe = F.aggregate(
        tokens("text"),
        F.lit(0).cast("long"),
        lambda acc, tk: acc
        + F.floor((F.length(tk) + BPE_CHARS_PER_TOKEN - 1) / BPE_CHARS_PER_TOKEN).cast("long"),
    )
    t = _fan_out(docs).select(
        "doc_id",
        "source",
        bpe.alias("n_bpe_est"),
        h60(F.concat(F.lit(seed), F.lit(":"), F.col("doc_id").cast("string"))).alias("hk"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("hk", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    budget = F.when(F.col("source").isin(*hi_sources), F.lit(hi_budget)).otherwise(
        F.lit(lo_budget)
    )
    return (
        t.withColumn("prior_bpe", F.coalesce(F.sum("n_bpe_est").over(w), F.lit(0)))
        .filter(F.col("prior_bpe") < budget)
        .select("doc_id", "source", "n_bpe_est")
    )


def corpus_split(docs: DataFrame, val_per_mille: int = 50, test_per_mille: int = 50, seed: str = "split0") -> DataFrame:
    """Deterministic train/val/test assignment by hash bucket
    (default 90/5/5). Same hash recipe as deterministic_sample: the split
    is a pure function of (seed, doc_id) — stable across reruns, engines,
    and cluster layouts, and disjoint by construction."""
    b = _hash_bucket(seed)
    return docs.select(
        "doc_id",
        F.when(b < val_per_mille, F.lit("val"))
        .when(b < val_per_mille + test_per_mille, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def doc_repetition(docs: DataFrame, n: int = 3) -> DataFrame:
    """Intra-document repetition (the Gopher/C4-style duplication quality
    gate): rep_ratio = 1 − distinct/total word n-grams — high values mean
    a doc repeats its own phrasing (boilerplate loops, generated spam).
    Linear explode of NON-distinct shingles, one groupBy; docs shorter
    than n tokens get (0, 0, 0.0)."""
    toked = _fan_out(docs).select("doc_id", tokens("text").alias("toks"))
    sh = toked.select(
        "doc_id", F.explode(shingles(F.col("toks"), n)).alias("shingle")
    ).filter(F.col("shingle") != "")
    per = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.countDistinct("shingle").alias("n_uniq_shingles"),
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_uniq_shingles", F.lit(0)).alias("n_uniq_shingles"),
            F.round(
                F.when(
                    F.col("n_shingles") > 0,
                    F.lit(1.0) - F.col("n_uniq_shingles") / F.col("n_shingles"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("rep_ratio"),
        )
    )


BPE_CHARS_PER_TOKEN = 4  # the standard ~4-chars/token planning heuristic
PIECE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"  # letters / digits / punct runs


def token_counts(docs: DataFrame) -> DataFrame:
    """Token counting three ways (the budget/planning numbers a training
    pipeline needs per document):

    - n_ws_tokens: whitespace tokens;
    - n_bpe_est:   BPE-ish subword estimate Σ ceil(len(tok)/4) — the
      ~4-chars-per-token rule, computed exactly in integers;
    - n_pieces:    regex pre-tokenizer pieces (letter runs | digit runs |
      single punctuation), the GPT-style pre-tok split shape.

    All built-ins (no UDF): one `aggregate` over the token array plus one
    `regexp_extract_all`; the regex avoids character-class shorthands so
    Java (Spark) and RE2 (DuckDB) agree symbol-for-symbol."""
    toked = _fan_out(docs).select("doc_id", "text", tokens("text").alias("toks"))
    bpe = F.aggregate(
        "toks",
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.floor((F.length(t) + BPE_CHARS_PER_TOKEN - 1) / BPE_CHARS_PER_TOKEN).cast("long"),
    )
    return toked.select(
        "doc_id",
        F.size("toks").alias("n_ws_tokens"),
        bpe.cast("long").alias("n_bpe_est"),
        F.size(F.regexp_extract_all("text", F.lit(PIECE_RE), F.lit(0))).alias("n_pieces"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-stopword language ID: score = count of marker-token hits per
    language; argmax with deterministic tie-break on language code;
    'unk' when nothing matches."""
    t = F.array_distinct(tokens("text"))
    scores = docs.select(
        "doc_id",
        *[
            F.size(F.array_intersect(t, F.array(*[F.lit(m) for m in markers]))).alias(f"s_{lang}")
            for lang, markers in LANG_MARKERS.items()
        ],
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANG_MARKERS])
    pred = F.lit("unk")
    # reverse-sorted so earlier languages win ties via later when() override
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when((F.col(f"s_{lang}") == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return scores.select("doc_id", pred.alias("lang_pred"))


CHUNK_TOKENS = 64  # tokens per chunk window
CHUNK_STRIDE = 48  # window start step — 16-token overlap between neighbors


def doc_chunks(
    docs: DataFrame, chunk_tokens: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Overlapping token-window chunking — the context-window prep step of
    RAG indexing and long-document training: each document yields windows
    of `chunk_tokens` whitespace tokens starting every `stride` tokens
    (so consecutive chunks overlap by chunk_tokens − stride); the final
    window is partial.

    Shape: tokenize once, `sequence` + `posexplode` + `slice` — entirely
    array-native built-ins, zero shuffles, embarrassingly parallel; the
    output is ~(chunk_tokens/stride)× the corpus and never passes through
    an aggregation. Chunk identity (doc_id, chunk_id) is derived from the
    token offsets, so re-runs and re-partitions are stable."""
    toked = _fan_out(docs).select("doc_id", tokens("text").alias("toks"))
    # sequence guard: an empty doc still yields one (empty) chunk rather
    # than a descending-sequence error
    starts = F.sequence(F.lit(1), F.greatest(F.lit(1), F.size("toks")), F.lit(stride))
    c = toked.select(
        "doc_id",
        "toks",
        F.posexplode(starts).alias("chunk_id", "start_tok"),
    )
    sliced = F.slice(F.col("toks"), F.col("start_tok"), chunk_tokens)
    return c.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("start_tok").cast("int").alias("start_tok"),
        F.size(sliced).alias("n_chunk_tokens"),
        F.array_join(sliced, " ").alias("chunk_text"),
    )


# PII patterns — explicit character classes only (no \d/\w shorthands, no
# lookarounds), so Java regex (Spark) and RE2 (DuckDB) match identically
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PII_PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_TOKEN = "<PII>"


def pii_scrub(docs: DataFrame) -> DataFrame:
    """PII redaction pass (the scrub gate every training corpus runs
    before packing): emails and phone-shaped numbers replaced with a
    sentinel token, with per-doc match counts for audit. Pure
    `regexp_extract_all`/`regexp_replace` built-ins — row-local, zero
    shuffles, scan-bandwidth-bound at 100 TB; the patterns avoid every
    regex construct Java and RE2 disagree on, so the redacted text is
    byte-identical cross-engine (emitted as md5 to keep the result frame
    small — the full text path is `regexp_replace` inline wherever the
    pipeline needs it)."""
    cleaned = F.regexp_replace(
        F.regexp_replace("text", PII_EMAIL_RE, PII_TOKEN), PII_PHONE_RE, PII_TOKEN
    )
    return _fan_out(docs).select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(PII_PHONE_RE), F.lit(0))).alias("n_phones"),
        F.md5(cleaned).alias("clean_fp"),
    )


BP_SEG_LEN = 4  # aligned segment length (tokens)
BP_DF_THRESHOLD = 2  # a segment is boilerplate iff it appears in >= T distinct docs


def boilerplate_scrub(
    docs: DataFrame, seg_len: int = BP_SEG_LEN, df_threshold: int = BP_DF_THRESHOLD
) -> DataFrame:
    """Corpus-frequent-segment removal — the RefinedWeb/CCNet "line
    dedup" pass re-expressed for newline-free word-bag documents: carve
    each doc into ALIGNED `seg_len`-token segments (the analog of lines;
    the <seg_len tail is never scrubbed), count each segment's document
    frequency corpus-wide, and strip every segment appearing in
    ≥ `df_threshold` distinct docs (nav menus / cookie banners /
    licence boilerplate in real crawls). Emits per-doc audit counts and
    the md5 of the scrubbed text (the pii_scrub convention — full text
    is one `array_join` away where the pipeline needs it).

    Shape: one tokenize pass; the corpus-wide df aggregate and the
    keep/strip anti-join both key on the 60-bit segment HASH, so the
    shuffles carry 8-byte longs, never segment text (the inverted-index
    discipline from ngram_jaccard). The hot-segment frame is
    data-dependent and potentially large (df ≥ T is a long tail), so the
    anti-join is left UNHINTED — Catalyst broadcasts it while its stats
    allow, and falls back to shuffle at real scale (the tfidf_terms df
    posture). Reassembly is one per-doc sort of kept (seg_idx, tokens)
    structs — bounded by doc length, embarrassingly parallel."""
    toked = _fan_out(docs).select("doc_id", tokens("text").alias("toks"))
    toked = toked.withColumn("n_seg", F.floor(F.size("toks") / seg_len).cast("int")).persist()
    seg = toked.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.col("n_seg") >= 1,
                F.transform(
                    F.sequence(F.lit(0), F.col("n_seg") - 1),
                    lambda i: F.slice(F.col("toks"), i * seg_len + 1, seg_len),
                ),
            ).otherwise(F.array().cast("array<array<string>>"))
        ).alias("seg_idx", "seg_toks"),
    ).withColumn("seg_h", h60(F.array_join("seg_toks", " ")))
    hot = (
        seg.groupBy("seg_h")
        .agg(F.count_distinct("doc_id").alias("seg_df"))
        .filter(F.col("seg_df") >= df_threshold)
        .select("seg_h")
    )
    kept = (
        seg.join(hot, "seg_h", "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg_idx", "seg_toks"))),
                    lambda s: s.seg_toks,
                )
            ).alias("kept_toks"),
        )
    )
    tail = F.slice(F.col("toks"), F.col("n_seg") * seg_len + 1, F.size("toks") - F.col("n_seg") * seg_len)
    clean = F.concat(F.coalesce("kept_toks", F.array().cast("array<string>")), tail)
    return (
        toked.join(kept, "doc_id", "left")
        .withColumn("clean_toks", clean)
        .select(
            "doc_id",
            F.col("n_seg").alias("n_segments"),
            (F.col("n_seg") - F.coalesce("n_kept", F.lit(0))).cast("int").alias("n_removed"),
            F.size("clean_toks").alias("n_tokens_clean"),
            F.md5(F.array_join("clean_toks", " ")).alias("clean_fp"),
        )
    )


TOP_TERMS_K = 5


def top_terms(docs: DataFrame, k: int = TOP_TERMS_K) -> DataFrame:
    """Top-k salient terms per document, scored by tf/df (term frequency
    over document frequency — for a per-doc ranking this is tf·idf with
    the monotone idf 1/df, minus the log that would make the score
    engine-float-fragile; tf/df is ONE IEEE division of two exact
    integers, so both engines produce bit-identical doubles).

    Shape: explode once → tf agg on (doc, term) → df agg on term (both
    map-side combinable) → shuffle join on term → per-doc rank. The rank
    partitions by doc_id (bounded by doc length), never by term, so a
    stop-word's huge posting list costs the join shuffle only."""
    tf = (
        _fan_out(docs).select("doc_id", F.explode(tokens("text")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "term").withColumn(
        "score", F.col("tf").cast("double") / F.col("df")
    )
    from .topn import top_n_per_group

    return top_n_per_group(
        scored, ["doc_id"], "score", k, tiebreak_cols=["term"], rank_alias="rank"
    ).select("doc_id", "term", "tf", "df", F.col("rank").cast("long").alias("rank"), "score")


STRATUM_TARGET = 100


def stratified_sample(docs: DataFrame, per_stratum: int = STRATUM_TARGET, seed: str = "strat0") -> DataFrame:
    """Equal-allocation stratified sampling with EXACT stratum sizes:
    rank each language's docs by the deterministic 60-bit hash (tie-break
    doc_id) and keep the first `per_stratum` — a pure function of
    (seed, doc_id, lang), identical on any engine or partitioning, unlike
    rand()/sampleBy. Strata smaller than the target are kept whole.

    Executed through the exact salted two-stage Top-N pre-prune
    (`top_n_per_group(prune_salts=8)`): a dominant stratum (en at 60% of
    a 100 TB corpus) is sorted as 8 bounded sub-sorts + one n·8-row final
    sort, never as a single giant partition."""
    h = h60(F.concat(F.lit(seed), F.lit(":"), F.col("doc_id").cast("string")))
    from .topn import top_n_per_group

    ranked = top_n_per_group(
        # rank ASCENDING in h via the negated column (top_n orders desc)
        docs.select("doc_id", "lang", h.alias("h")).withColumn("neg_h", -F.col("h")),
        ["lang"],
        "neg_h",
        per_stratum,
        tiebreak_cols=["doc_id"],
        rank_alias="rank_in_stratum",
        prune_salts=8,
    )
    return ranked.select(
        "doc_id", "lang", F.col("rank_in_stratum").cast("long").alias("rank_in_stratum")
    )


def rk_window_fps() -> "F.Column":
    """Rabin-Karp fingerprint of EVERY 8-token window, as an array column
    over a materialized per-token hash column `th`:

    fp(w) = Σ_{d<8} (h60(tok_{w+d}) mod 1000003) · 37^(7-d)  mod 1e9+7

    — pure integer math, bit-identical in any engine; all per-row JVM
    expressions (nested transform/aggregate), ZERO explode and ZERO
    shuffle. Max window sum is 8·(10⁶·37⁷) ≈ 7.6e17 < 2⁶³, so the long
    accumulator never overflows. Shared by rolling_fingerprint (min over
    the array) and dedup_substring (inverted index over the array)."""
    weights = F.array(*[F.lit(RK_BASE ** (RK_WINDOW - 1 - i)) for i in range(RK_WINDOW)])
    return F.transform(
        F.sequence(F.lit(0), F.size("th") - RK_WINDOW),
        lambda w: F.aggregate(
            F.sequence(F.lit(0), F.lit(RK_WINDOW - 1)),
            F.lit(0).cast("long"),
            lambda acc, d: acc
            + F.element_at(F.col("th"), w + d + 1) * F.element_at(weights, d + 1),
        )
        % RK_MOD,
    )


def rk_token_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, th): the per-token RK hash array, materialized once —
    `rk_window_fps()` references it per window element, and inlining the
    split would re-parse the text O(positions) times per row."""
    return _fan_out(docs).select(
        "doc_id",
        F.transform(tokens("text"), lambda t: h60(t) % RK_TOKMOD).alias("th"),
    )


def rolling_fingerprint(docs: DataFrame) -> DataFrame:
    """Winnowing-lite signature: min Rabin-Karp hash over all 8-token
    windows (rk_window_fps). Docs shorter than the window get fp = -1.
    The previous formulation exploded token×8 rows through a two-level
    groupBy; the array form is embarrassingly parallel and was measured
    ~3× faster at sf0.1."""
    hashed = rk_token_hashes(docs)
    window_fps = rk_window_fps()
    return hashed.select(
        "doc_id",
        F.when(F.size("th") >= RK_WINDOW, F.array_min(window_fps))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("min_fp"),
    )


BIGRAM_TOP_K = 20


def bigram_stats(docs: DataFrame, k: int = BIGRAM_TOP_K) -> DataFrame:
    """Corpus-level top-k bigrams with term and document frequency — the
    n-gram language-statistics pass (phrase tables, collocation mining,
    boilerplate discovery) over the same shingle machinery as dedup, at
    n=2 and WITHOUT the per-doc distinct (a bigram counts once per
    occurrence, not once per doc).

    Shape at scale: explode → one map-side-combinable agg on bigram
    (count + approximate-free exact distinct via count(distinct doc_id),
    which Catalyst expands to a two-level agg) → global top-k via
    TakeOrdered (orderBy+limit never materializes a single-partition sort
    of the full aggregate; each partition keeps its local top-k and the
    driver merges k·P rows). Deterministic tie-break on the bigram string."""
    toked = _fan_out(docs).select("doc_id", tokens("text").alias("toks"))
    bg = toked.select("doc_id", F.explode(shingles(F.col("toks"), 2)).alias("bigram")).filter(
        F.col("bigram") != ""
    )
    return (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("doc_id").alias("df"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(k)
    )


SEQ_LEN = 2048  # training sequence length (tokens)
PACK_BUCKET = 100  # docs per prefix bucket → bucket frame is ndocs/100 rows


def sequence_pack(docs: DataFrame, seq_len: int = SEQ_LEN, bucket: int = PACK_BUCKET) -> DataFrame:
    """Concat-and-chunk sequence packing: concatenate all documents in
    doc_id order and cut the token stream into fixed `seq_len` training
    sequences; emit each doc's byte-position analog in token space —
    (start_off, first_seq, last_seq) — the map a pretraining loader needs
    to locate every document inside the packed batch files.

    A global ordered cumsum is the textbook single-partition-window trap,
    so this runs the two-level form: per-bucket token subtotals (one tiny
    hash agg), an exclusive prefix over the ~ndocs/`bucket` bucket rows
    via operators/ranking.global_prefix_sum (range-partitioned — even
    the bucket frame never funnels through one task), broadcast back,
    then an intra-bucket cumsum windowed per bucket. Every remaining
    single-task stage is bounded by the partition COUNT, not the data."""
    d = _fan_out(docs).select("doc_id", F.size(tokens("text")).alias("n_tokens"))
    # persisted: the bucket-subtotal frame feeds global_prefix_sum (which
    # reads it twice) AND the final join — one tokenize pass, not three
    d = d.withColumn("bucket", F.floor(F.col("doc_id") / bucket)).persist()
    from pyspark.sql import Window

    from .ranking import global_prefix_sum

    bsum = d.groupBy("bucket").agg(F.sum("n_tokens").alias("bt"))
    # exclusive prefix over the bucket frame, DISTRIBUTED (range
    # partition + P-row offsets) — the bucket frame is ndocs/`bucket`
    # rows, which still outgrows one task at corpus scale
    boff = global_prefix_sum(bsum, [F.col("bucket")], "bt", out="boff").select(
        "bucket", "boff"
    )
    wi = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    return (
        d.join(F.broadcast(boff), "bucket")
        .withColumn("start_off", F.col("boff") + F.coalesce(F.sum("n_tokens").over(wi), F.lit(0)))
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("start_off").cast("long").alias("start_off"),
            F.floor(F.col("start_off") / seq_len).cast("long").alias("first_seq"),
            F.floor((F.col("start_off") + F.col("n_tokens") - 1) / seq_len).cast("long").alias("last_seq"),
        )
    )


# ------------------------------------------------ Gopher-style rule filter

QG_MIN_WORDS = 20
QG_MAX_WORDS = 100_000
QG_MIN_MEAN_WLEN = 3.0
QG_MAX_MEAN_WLEN = 10.0
QG_STOPWORDS = ("the", "a", "of", "and", "that", "to")
QG_MIN_STOPWORDS = 2
QG_MAX_TOP_UNIGRAM = 0.15


def quality_gopher(docs: DataFrame) -> DataFrame:
    """Rule-based document quality filter in the Gopher/C4 style (Rae et
    al. 2021 §A1.1 adapted to a whitespace corpus): per-rule boolean flags
    plus the AND-combined keep decision, so downstream consumers can both
    filter and audit WHICH rule rejected each document.

    Rules (all row-local functions of the token array — single corpus
    scan, zero shuffle, the shape that stays scan-bound at 100 TB):
    - word count within [QG_MIN_WORDS, QG_MAX_WORDS];
    - mean word length within [3, 10];
    - at least QG_MIN_STOPWORDS stop-word occurrences;
    - most-frequent unigram ≤ QG_MAX_TOP_UNIGRAM of all tokens (the
      intra-doc repetition gate).

    The top-unigram count is computed as the longest run in the SORTED
    token array via one `aggregate` pass — O(n log n) row-local, instead
    of the O(uniq·n) count-per-distinct-token shape that degenerates on
    long documents. Flags are INTs (not booleans) for cross-engine hash
    stability. Thresholds on derived doubles compare the round(6) value
    so both engines gate on identical numbers."""
    t = _fan_out(docs).select("doc_id", tokens("text").alias("toks"))
    n = F.size("toks")
    sum_len = F.aggregate(
        "toks", F.lit(0).cast("long"), lambda acc, tk: acc + F.length(tk).cast("long")
    )
    mean_wlen = F.round(sum_len.cast("double") / n, 6)
    stop_count = F.size(F.filter("toks", lambda tk: tk.isin(*QG_STOPWORDS)))
    srt = F.array_sort("toks")
    top_cnt = F.aggregate(
        srt,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).cast("int").alias("run"), F.lit(0).cast("int").alias("best")
        ),
        lambda acc, tk: F.struct(
            tk.alias("prev"),
            F.when(tk == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"], F.when(tk == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    out = t.select(
        "doc_id",
        n.cast("int").alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        stop_count.cast("int").alias("stop_count"),
        F.round(top_cnt.cast("double") / n, 6).alias("top_unigram_ratio"),
    )
    f_len = (F.col("n_words") >= QG_MIN_WORDS) & (F.col("n_words") <= QG_MAX_WORDS)
    f_wlen = (F.col("mean_word_len") >= QG_MIN_MEAN_WLEN) & (
        F.col("mean_word_len") <= QG_MAX_MEAN_WLEN
    )
    f_stop = F.col("stop_count") >= QG_MIN_STOPWORDS
    f_rep = F.col("top_unigram_ratio") <= QG_MAX_TOP_UNIGRAM
    return out.select(
        "*",
        f_len.cast("int").alias("flag_word_count"),
        f_wlen.cast("int").alias("flag_mean_word_len"),
        f_stop.cast("int").alias("flag_stopwords"),
        f_rep.cast("int").alias("flag_repetition"),
        (f_len & f_wlen & f_stop & f_rep).cast("int").alias("keep"),
    )


# --------------------------------------- DSIR-style importance weights

DSIR_BUCKETS = 4096
DSIR_TARGET_LANG = "en"


def importance_weights(
    docs: DataFrame, buckets: int = DSIR_BUCKETS, target_lang: str = DSIR_TARGET_LANG
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023) weights:
    per-document mean log-likelihood ratio between a hashed-unigram model
    of the TARGET distribution (here: the `lang = target_lang` subset —
    in production, a high-quality seed corpus) and the raw corpus.
    Add-one smoothing over `buckets` hashed-feature buckets; weight > 0
    means the doc looks more target-like than corpus-average, the sort
    key for importance resampling of the training mixture.

    Scale shape: ONE collapse of the exploded tokens to per-(doc, bucket)
    counts — a frame of fixed-width ~25-byte rows, orders smaller than
    the text, persisted because both the bucket statistics and the final
    weights consume it (at 100 TB, swap the persist for a parquet stage
    write). The bucket-stats frame is ≤ `buckets` rows → the weight join
    is a broadcast; the only other shuffle is the per-doc re-agg of
    (doc_id, lr, cnt) triples. Hashing is the engine-portable md5-based
    h60, so the DuckDB oracle buckets identically."""
    tokb = (
        _fan_out(docs)
        .select(
            "doc_id",
            (F.col("lang") == target_lang).alias("tgt"),
            F.explode(tokens("text")).alias("tok"),
        )
        .withColumn("bucket", h60(F.col("tok")) % buckets)
        .groupBy("doc_id", "tgt", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    stats = tokb.groupBy("bucket").agg(
        F.sum("cnt").alias("raw_c"),
        F.sum(F.when(F.col("tgt"), F.col("cnt")).otherwise(F.lit(0))).alias("tgt_c"),
    )
    # totals as a 1-row agg broadcast back — never a partition-less
    # window node, so the no-single-partition-Window plan pin holds
    # with zero exemptions (the frame is ≤`buckets` rows either way)
    # totals straight off the PERSISTED tokb (not via stats — that would
    # recompute the bucket agg a second time): one cached pass each
    tots = tokb.agg(
        F.sum("cnt").alias("r_tot"),
        F.sum(F.when(F.col("tgt"), F.col("cnt")).otherwise(F.lit(0))).alias("t_tot"),
    )
    stats = stats.crossJoin(F.broadcast(tots))
    lr = stats.select(
        "bucket",
        (
            F.log((F.col("tgt_c") + 1).cast("double") / (F.col("t_tot") + buckets).cast("double"))
            - F.log((F.col("raw_c") + 1).cast("double") / (F.col("r_tot") + buckets).cast("double"))
        ).alias("lr"),
    )
    return (
        tokb.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("int").alias("n_tokens"),
            F.round(F.sum(F.col("lr") * F.col("cnt")) / F.sum("cnt"), 6).alias("weight"),
        )
        .select("doc_id", "n_tokens", "weight")
    )


# ------------------------------------- CCNet-style perplexity bucketing

PPL_TERCILES = 3  # head / middle / tail


def perplexity_buckets(docs: DataFrame, buckets: int = DSIR_BUCKETS) -> DataFrame:
    """CCNet-style language-model quality bucketing (Wenzek et al. 2019):
    score every document by its cross-entropy under a unigram LM fitted on
    the corpus itself, then split the corpus into head / middle / tail
    terciles (CCNet keeps `head` for training). The LM is hashed-unigram
    (same engine-portable h60 bucketing as `importance_weights`) with
    add-one smoothing — at 100 TB a raw-vocabulary LM is an unbounded
    dimension, the hashed form is a fixed `buckets`-row broadcast.

    cross_entropy = -mean over tokens of log2 p(bucket); lower = more
    corpus-typical. The tercile split is an exact ntile(3) over
    (cross_entropy, doc_id) computed DISTRIBUTED via
    operators/ranking.global_rank_ntile (range-partition + offsets;
    bit-identical to the window form) — the docs-count frame never
    funnels through one task."""
    tokb = (
        _fan_out(docs)
        .select("doc_id", F.explode(tokens("text")).alias("tok"))
        .withColumn("bucket", h60(F.col("tok")) % buckets)
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    lm = tokb.groupBy("bucket").agg(F.sum("cnt").alias("c"))
    # n_tot via 1-row agg + broadcast cross join (see importance_weights
    # — keeps the plan free of partition-less Window nodes); computed off
    # the persisted tokb so the LM agg isn't run twice
    lm = lm.crossJoin(F.broadcast(tokb.agg(F.sum("cnt").alias("n_tot"))))
    logp = lm.select(
        "bucket",
        (
            F.log2((F.col("c") + 1).cast("double") / (F.col("n_tot") + buckets).cast("double"))
        ).alias("lp"),
    )
    scored = (
        tokb.join(F.broadcast(logp), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("int").alias("n_tokens"),
            F.round(-F.sum(F.col("lp") * F.col("cnt")) / F.sum("cnt"), 6).alias("cross_entropy"),
        )
        # persisted: global_rank_ntile reads its input twice (range
        # partition + per-partition counts) — without this the whole
        # explode-join-agg lineage runs twice
        .persist()
    )
    from .ranking import global_rank_ntile

    tiled = global_rank_ntile(
        scored, [F.col("cross_entropy"), F.col("doc_id")], PPL_TERCILES
    )
    return tiled.select(
        "doc_id",
        "n_tokens",
        "cross_entropy",
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")), F.col("ntile")
        ).alias("ppl_bucket"),
    )


# --------------------------------------- hashed-bigram LM scoring

BIGRAM_BUCKETS = 256  # ctx × word bucket pairs ≤ 65k rows — broadcastable
LP_SCALE = 1 << 40  # fixed-point units per 1.0 of log2-prob (see bigram_lm_score)


def bigram_lm_score(docs: DataFrame, buckets: int = BIGRAM_BUCKETS) -> DataFrame:
    """Bigram-LM cross-entropy per document — the conditional-probability
    upgrade of `perplexity_buckets`' unigram CCNet scorer: p(w|ctx) with
    add-one smoothing over hashed (context, word) bucket pairs. A bigram
    model catches word-ORDER pathologies (shuffled text, keyword
    stuffing) that any unigram model scores as perfectly fluent; both
    belong in a curation stack.

    Hashing bounds the model: `buckets`² possible pairs (≤65k rows at
    256) regardless of vocabulary, so the conditional-count and
    context-count frames broadcast at any corpus size — the same
    fixed-dimension trick as DSIR's hashed features. Scale shape: one
    explode of consecutive token pairs, collapse to per-(doc, ctx, w)
    counts (~30-byte rows, the only doc-cardinality shuffle), model aggs
    over that collapsed frame, two broadcast joins back, one per-doc
    re-agg. Docs with < 2 tokens have no bigrams and score NULL (emitted,
    not dropped — the audit row survives).

    cross_entropy = -mean log2 (c(ctx,w)+1)/(c(ctx)+buckets); exact
    integer counts, log2/divide on doubles — engine-identical at
    round(6)."""
    toked = _fan_out(docs).select("doc_id", tokens("text").alias("toks"))
    big = toked.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("toks"), i).alias("prev"),
                        F.element_at(F.col("toks"), i + 1).alias("cur"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
        ).alias("bg"),
    ).select(
        "doc_id",
        (h60(F.col("bg.prev")) % buckets).alias("ctx"),
        (h60(F.col("bg.cur")) % buckets).alias("w"),
    )
    per_doc = big.groupBy("doc_id", "ctx", "w").agg(F.count(F.lit(1)).alias("cnt")).persist()
    c2 = per_doc.groupBy("ctx", "w").agg(F.sum("cnt").alias("c2"))
    c1 = per_doc.groupBy("ctx").agg(F.sum("cnt").alias("c1"))
    # log-prob quantized to fixed-point units: the per-doc Σ lp·cnt then
    # sums INTEGERS (partition-order independent ⇒ the DuckDB oracle
    # hash-matches); at 2^-40 resolution the quantization error on the
    # final cross-entropy is ≤ ~1e-9, invisible at the 6-dp output
    lp = (
        c2.join(c1, "ctx")
        .select(
            "ctx",
            "w",
            F.round(
                F.log2(
                    (F.col("c2") + 1).cast("double") / (F.col("c1") + buckets).cast("double")
                )
                * LP_SCALE
            )
            .cast("long")
            .alias("lpu"),
        )
    )
    scored = (
        per_doc.join(F.broadcast(lp), ["ctx", "w"])
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("int").alias("n_bigrams"),
            F.round(
                -((F.sum(F.col("lpu") * F.col("cnt")) / F.lit(LP_SCALE)) / F.sum("cnt")), 6
            ).alias("bigram_ce"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "bigram_ce",
        )
    )


# ----------------------------------------------------- per-doc tf-idf

TFIDF_K = 3


def tfidf_terms(docs: DataFrame, k: int = TFIDF_K) -> DataFrame:
    """Top-k terms per document by tf·idf (smooth idf = ln((N+1)/(df+1))+1,
    scikit-learn's convention) — the per-doc keyword surface that
    complements corpus-level `top_terms`.

    Scale shape: collapse to (doc, term, tf) counts (one explode + one
    shuffle), aggregate term→df from the SAME collapsed frame (persisted;
    at 100 TB stage it to parquet instead), then an equi-join on term —
    the df frame is vocabulary-sized, so this is a plain shuffled
    hash join, NOT a broadcast (vocabulary is unbounded; Σ per-term
    postings are what flow, never the text) — and one per-doc top-k
    window over ~30-byte rows. Ties break lexicographically for
    determinism."""
    from pyspark.sql import Window as W

    tf = (
        _fan_out(docs)
        .select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    # corpus size as a broadcast 1-row frame — no driver-side action
    nd = tf.agg(F.count_distinct("doc_id").alias("n_docs"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            "tf",
            F.col("df").cast("int").alias("df"),
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", F.col("tf").cast("int").alias("tf"), "df", "tfidf",
                F.col("rank").cast("int").alias("rank"))
    )


# ------------------------------------- deterministic weighted sampling

WS_PER_SOURCE = 15  # < docs-per-source at every test sf, so selection is real


def weighted_sample(docs: DataFrame, per_source: int = WS_PER_SOURCE, seed: str = "ws0") -> DataFrame:
    """Weighted sampling without replacement, Efraimidis–Spirakis A-ES:
    each doc draws u ∈ (0,1) and ranks by ln(u)/w — the top-k per source
    is a weighted-without-replacement sample with inclusion probability
    proportional to w (here w = n_chars, longer docs likelier). u is
    derived from the engine-portable md5 hash of (seed, doc_id), so the
    "random" draw is deterministic, reproducible, and identical in the
    DuckDB oracle — the property a training-data pipeline needs for
    auditable resamples.

    The sort key is rounded to 6 decimals BEFORE ranking with doc_id as
    tiebreak, so cross-engine 1-ulp double drift can never reorder the
    selection. One scan; the only shuffle is the per-source top-k window
    over (source, key, doc_id) triples — text never moves."""
    from pyspark.sql import Window as W

    # u in (0,1): 60-bit hash scaled; +1 on the numerator avoids ln(0)
    u = (h60(F.concat(F.lit(seed + ":"), F.col("doc_id").cast("string"))) + 1).cast("double") / float(
        (1 << 60) + 1
    )
    key = F.round(F.log(u) / F.col("n_chars"), 6)
    w = W.partitionBy("source").orderBy(F.desc("es_key"), F.asc("doc_id"))
    return (
        _fan_out(docs)
        .select("doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"), key.alias("es_key"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_source)
        .select("doc_id", "source", "n_chars", "es_key", F.col("rank").cast("int").alias("rank"))
    )


def token_entropy(docs: DataFrame) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (bits) —
    the information-theoretic quality signal: low entropy = repetitive/
    template docs, entropy ≈ log2(n_tokens) = fully diverse. Row-local
    single scan, zero shuffle; run lengths come from the same sorted-run
    fold `quality_gopher` uses (O(n log n) per row, never O(uniq·n))."""
    t = _fan_out(docs).select("doc_id", tokens("text").alias("toks"))
    srt = F.array_sort("toks")
    # fold → array of run lengths (token counts), order = sorted tokens
    runs = F.aggregate(
        srt,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("int").alias("run"),
            F.array().cast("array<int>").alias("acc"),
        ),
        lambda acc, tk: F.struct(
            tk.alias("prev"),
            F.when(tk == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.when(
                (tk != acc["prev"]) & (acc["run"] > 0), F.concat(acc["acc"], F.array(acc["run"]))
            )
            .otherwise(acc["acc"])
            .alias("acc"),
        ),
        lambda acc: F.when(acc["run"] > 0, F.concat(acc["acc"], F.array(acc["run"]))).otherwise(
            acc["acc"]
        ),
    )
    n = F.size("toks").cast("double")
    ent = F.aggregate(
        runs,
        F.lit(0.0),
        lambda acc, r: acc - (r.cast("double") / n) * F.log2(r.cast("double") / n),
    )
    return t.select(
        "doc_id",
        F.size("toks").cast("int").alias("n_tokens"),
        F.round(ent, 6).alias("entropy_bits"),
    )


def source_divergence(docs: DataFrame, buckets: int = DSIR_BUCKETS) -> DataFrame:
    """Per-source Jensen–Shannon divergence from the corpus-wide token
    distribution (hashed-unigram, add-one smoothed) — the drift monitor
    that flags a source whose language shifted (new crawl snapshot,
    pipeline bug) before it contaminates the mixture. Same machinery as
    `importance_weights`: one explode collapse to (source, bucket)
    counts, model frames ≤ `buckets` rows, output |sources| rows.

    JSD(P‖Q) = ½·KL(P‖M) + ½·KL(Q‖M), M = ½(P+Q), computed over the
    smoothed bucket distributions — bounded [0, 1] in bits, symmetric."""
    tokb = (
        _fan_out(docs)
        .select("source", F.explode(tokens("text")).alias("tok"))
        .withColumn("bucket", h60(F.col("tok")) % buckets)
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    src_tot = tokb.groupBy("source").agg(F.sum("cnt").alias("s_tot"))
    corpus = tokb.groupBy("bucket").agg(F.sum("cnt").alias("c_cnt"))
    # c_tot via 1-row agg + broadcast (the no-global-Window discipline),
    # off the persisted tokb so the bucket agg isn't run twice
    corpus = corpus.crossJoin(
        F.broadcast(tokb.agg(F.sum("cnt").alias("c_tot")))
    )
    # per (source, bucket): smoothed p (source) and q (corpus); buckets
    # absent from a source still contribute — generate the full grid from
    # the corpus frame (≤ buckets rows) × sources (tiny) so KL sums are
    # complete, then left-join the source counts
    grid = corpus.crossJoin(F.broadcast(src_tot))
    j = grid.join(tokb, ["source", "bucket"], "left").select(
        "source",
        (
            (F.coalesce(F.col("cnt"), F.lit(0)) + 1).cast("double")
            / (F.col("s_tot") + buckets).cast("double")
        ).alias("p"),
        ((F.col("c_cnt") + 1).cast("double") / (F.col("c_tot") + buckets).cast("double")).alias(
            "q"
        ),
    )
    m = (F.col("p") + F.col("q")) / 2
    term = (
        F.col("p") * F.log2(F.col("p") / m) / 2 + F.col("q") * F.log2(F.col("q") / m) / 2
    )
    return (
        j.groupBy("source")
        .agg(F.round(F.sum(term), 6).alias("jsd_bits"))
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("spark", "hash", "table")  # the fixed demo query
BM25_TOPK = 20


def bm25_search(
    docs: DataFrame,
    query_terms: tuple[str, ...] = BM25_QUERY,
    k1: float = BM25_K1,
    b: float = BM25_B,
    topk: int = BM25_TOPK,
) -> DataFrame:
    """Full-text retrieval: top-k documents for a query by BM25
    (Robertson/Sparck-Jones, the idf = ln(1 + (N−df+0.5)/(df+0.5))
    positive variant) — the ranking function under every classic search
    engine and the lexical half of hybrid (BM25 + vector) retrieval.

    Scale shape: tokens are filtered to the QUERY TERMS BEFORE the
    (doc, term) count shuffle — postings flow only for the handful of
    searched terms, never the whole vocabulary (the tfidf_terms frame is
    corpus-wide; a search touches ~|query| postings lists). Corpus stats
    (N, Σdl) ride a broadcast one-row frame; doc length joins on doc_id.

    Determinism: the per-doc score SUMS ≤|query| float contributions —
    a groupBy SUM would add them in shuffle order (nondeterministic last
    ulp), so contributions are PIVOTED to fixed columns and added in a
    fixed expression order; both engines then evaluate the identical
    IEEE expression tree. Rank ties break on doc_id. The final global
    top-k window runs over the CANDIDATE set only (docs containing ≥1
    query term — postings-sized, not corpus-sized); for a stop-word
    query at extreme scale, pre-prune per partition with the
    operators/topn two-stage shape first."""
    toked = _fan_out(docs).select("doc_id", tokens("text").alias("toks"))
    dl = toked.select("doc_id", F.size("toks").cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        toked.select("doc_id", F.explode("toks").alias("term"))
        .where(F.col("term").isin(*query_terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return bm25_rank(tf, dl, stats, query_terms, k1, b, topk)


def bm25_rank(
    tf: DataFrame,
    dl: DataFrame,
    stats: DataFrame,
    query_terms: tuple[str, ...],
    k1: float = BM25_K1,
    b: float = BM25_B,
    topk: int = BM25_TOPK,
) -> DataFrame:
    """The BM25 scoring tail, shared by the batch search and the
    stream-maintained index's search view so both evaluate the IDENTICAL
    IEEE expression tree (one source of truth for the hash gate). Inputs:
    `tf` (doc_id, term, tf) restricted to the query terms, `dl`
    (doc_id, dl), `stats` one row (n_docs, sum_dl); df is derived from
    `tf` — a doc counts once per term by construction."""
    from pyspark.sql import Window as W

    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("sum_dl") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl)
    contrib = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(stats))
        .join(dl, "doc_id")
        .select("doc_id", "dl", "term", (idf * F.col("tf") * (k1 + 1.0) / denom).alias("c"))
    )
    pivoted = contrib.groupBy("doc_id", "dl").agg(
        *[
            F.max(F.when(F.col("term") == t, F.col("c"))).alias(f"c{i}")
            for i, t in enumerate(query_terms)
        ]
    )
    score = sum(
        (F.coalesce(F.col(f"c{i}"), F.lit(0.0)) for i in range(len(query_terms))),
        F.lit(0.0),
    )
    w = W.partitionBy().orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        pivoted.withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("doc_id", "dl", F.round("score", 6).alias("bm25"), F.col("rank").cast("int").alias("rank"))
    )


# ------------------------------- temperature-scaled mixture sampling

MT_BUDGET_PCT = 50  # sample budget: 50% of corpus BPE tokens
# τ = 2 fixed: the share exponent 1/τ = 0.5 is IEEE sqrt — correctly
# rounded in every engine, so the whole operator stays hash-exact. A
# generic τ needs pow(), whose final ulp is libm-dependent; if one is
# ever added, guard the shares with an explicit round-before-compare.


def mixture_temperature(
    docs: DataFrame, budget_pct: int = MT_BUDGET_PCT, seed: str = "mt0"
) -> DataFrame:
    """Temperature-scaled source sampling (the mT5 / UniMax multilingual
    recipe, τ = 2): source s gets sampling share ∝ n_s^(1/τ) where n_s
    is its BPE-token mass — flattening the natural distribution so
    low-resource sources are upsampled relative to their share, capped
    at rate 1 (no replacement). Each doc is then kept by an independent
    deterministic Bernoulli draw: u = hash(seed, doc_id) ∈ (0,1) <
    rate(source) — reproducible on any engine/partitioning, and
    adding a source never flips another source's draws (u is per-doc,
    rates only shift with the global mass).

    Determinism of the one cross-row float reduction: Σ_s sqrt(n_s) is
    folded LEFT-TO-RIGHT over sources in sorted order (an explicit
    aggregate over a sorted collect_list; the DuckDB oracle mirrors it
    with list_reduce over list(... ORDER BY source)) — double addition
    is order-sensitive, and a free-order partial agg could drift a ulp
    across engines. Everything else is per-row arithmetic on identical
    doubles. Shape at 100 TB: one tokenize scan → one tiny per-source
    agg (map-side combined) → the ~|sources|-row rate table broadcast
    back; the corpus is scanned twice and shuffled never."""
    bpe = F.aggregate(
        tokens("text"),
        F.lit(0).cast("long"),
        lambda acc, tk: acc
        + F.floor(
            (F.length(tk) + BPE_CHARS_PER_TOKEN - 1) / BPE_CHARS_PER_TOKEN
        ).cast("long"),
    )
    d = _fan_out(docs).select("doc_id", "source", bpe.alias("n_bpe_est"))
    s = d.groupBy("source").agg(F.sum("n_bpe_est").alias("n_s"))
    stats = s.agg(
        F.sum("n_s").alias("n_tot"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "source", F.sqrt(F.col("n_s").cast("double")).alias("sq")
                        )
                    )
                ),
                lambda st: st.sq,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("z"),
    )
    rates = (
        s.crossJoin(F.broadcast(stats))
        .withColumn(
            "rate",
            F.least(
                F.lit(1.0),
                (F.col("n_tot").cast("double") * budget_pct / 100.0)
                * (F.sqrt(F.col("n_s").cast("double")) / F.col("z"))
                / F.col("n_s").cast("double"),
            ),
        )
        .select("source", "rate")
    )
    u = (h60(F.concat(F.lit(seed + ":"), F.col("doc_id").cast("string"))) + 1).cast(
        "double"
    ) / float((1 << 60) + 1)
    return (
        d.join(F.broadcast(rates), "source")
        .filter(u < F.col("rate"))
        .select("doc_id", "source", "n_bpe_est", F.round("rate", 6).alias("rate"))
    )
