"""DuckDB oracles for plans/training.py.

Where a formula must match the Spark implementation bit-for-bit (minhash
permutations, LSH hyperplanes, Rabin-Karp weights, fixed-point scale), the
SQL is *generated from the same Python constants* as the Spark side —
the two can't drift independently.
"""

from __future__ import annotations

from ..functions.text import MERSENNE31, minhash_sig_sql
from ..operators.dedup import (
    BENCH_PER_MILLE,
    CAS_SEED,
    CAS_TEST_PER_MILLE,
    CAS_VAL_PER_MILLE,
    SPARSE_COS_THRESHOLD,
    SUBSTR_DF_CAP,
    SUBSTR_MIN_WINDOWS,
    DF_CAP,
    HAMMING_MAX,
    JACCARD_THRESHOLD,
    LSH_BANDS,
    MINHASH_PERMS,
    SIMHASH_BANDS,
    SIMHASH_BITS,
)
from ..operators.classifier import PERC_ITERS, PERC_POS_LANG
from .training import (
    ORACLE_SIDECAR_DIR,
    RRF_K,
    RRF_QUERY_VEC,
    RRF_SEM_K,
    RRF_TOPK,
    SIDECAR_FP_MOD,
)

# sidecar-file match predicate: the oracle derives the full corpus
# fingerprint — (count, total chars, md5-sum content hash) — from its
# OWN documents view, so it reads exactly the file the Spark query
# (which the gate always runs first) wrote for this corpus, and a
# (n_docs, n_chars) collision between different corpora can't union a
# second vocab file into the CTE
_SIDECAR_MATCH = f"""n_docs = (SELECT count(*) FROM documents)
    AND n_chars = (SELECT sum(length(text)) FROM documents)
    AND n_fp = (SELECT CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT)
                            % {SIDECAR_FP_MOD} AS BIGINT) FROM documents)"""
from ..operators.graph import (
    LP_ITERS,
    LP_SEED_MOD,
    PR_DAMP_PCT,
    PR_ITERS,
    PR_SCALE,
    PR_TELEPORT,
)
from ..operators.similarity import (
    DIM,
    EMB_DEDUP_THRESHOLD,
    FILTERED_NPROBE,
    IVF_CENT_MOD,
    IVF_NPROBE,
    KM_CENT_MOD,
    KM_ITERS,
    KNN_GRAPH_K,
    KNN_K,
    LSH_PLANES,
    LSH_SIGN_BANDS,
    Q_SCALE,
    SEMDEDUP_THRESHOLD,
    _plane_coeff,
)
from ..operators.textops import (
    BIGRAM_BUCKETS,
    BM25_B,
    BM25_K1,
    BM25_QUERY,
    BM25_TOPK,
    BP_DF_THRESHOLD,
    BP_SEG_LEN,
    LANG_MARKERS,
    LP_SCALE,
    RK_BASE,
    RK_MOD,
    RK_TOKMOD,
    RK_WINDOW,
    SEQ_LEN,
)

H60 = "('0x' || substr(md5({c}), 1, 15))::BIGINT"

# ---------------------------------------------------------------- text / dedup

_SHINGLES_CTE = f"""
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh0 AS (
  SELECT doc_id, shingle FROM (
    SELECT doc_id, unnest(CASE WHEN len(t) >= 3 THEN list_distinct(
      list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
    ) ELSE [] END) AS shingle
    FROM toks
  ) WHERE shingle <> ''
),
-- df-cap mirror (operators/dedup.py DF_CAP): drop hyper-frequent shingles
sh AS (
  SELECT doc_id, shingle FROM sh0
  WHERE shingle IN (SELECT shingle FROM sh0 GROUP BY 1 HAVING count(*) <= {DF_CAP})
)
"""

DOC_FINGERPRINT = "SELECT doc_id, md5(text) AS fp FROM documents"

DEDUP_EXACT = """
SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY 1
"""

# the pair self-join keys on h60(shingle) — mirror of the Spark side's
# hashed inverted index (operators/dedup.py:_shingle_pair_counts)
DEDUP_NGRAM_JACCARD = f"""
WITH {_SHINGLES_CTE},
shh AS (SELECT doc_id, {H60.format(c="shingle")} AS sh60 FROM sh),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shh GROUP BY 1),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM shh a JOIN shh b ON a.sh60 = b.sh60 AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.id_a, c.id_b,
       c.n_common / (sa.n_sh + sb.n_sh - c.n_common) AS jaccard
FROM common c
JOIN sizes sa ON c.id_a = sa.doc_id
JOIN sizes sb ON c.id_b = sb.doc_id
WHERE c.n_common / (sa.n_sh + sb.n_sh - c.n_common) >= {JACCARD_THRESHOLD}
"""


def _minhash_sig_selects() -> str:
    h = H60.format(c="shingle")
    return ",\n       ".join(
        f"min({minhash_sig_sql(h, i)}) AS sig_{i}" for i in range(MINHASH_PERMS)
    )


MINHASH_SIGNATURES = f"""
WITH {_SHINGLES_CTE}
SELECT doc_id,
       {_minhash_sig_selects()}
FROM sh
GROUP BY doc_id
"""

SOURCE_MINHASH_SETOPS = f"""
WITH {_SHINGLES_CTE},
srch AS (
  SELECT DISTINCT d.source, {H60.format(c="shingle")} AS h
  FROM sh JOIN documents d USING (doc_id)
),
sigs AS (
  SELECT source,
         {", ".join(f"min({minhash_sig_sql('h', i)}) AS sig_{i}" for i in range(MINHASH_PERMS))},
         CAST(count(*) AS BIGINT) AS n_sh
  FROM srch GROUP BY source
),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b, CAST(count(*) AS BIGINT) AS n_common
  FROM srch a JOIN srch b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
),
pairs AS (
  SELECT sa.source AS source_a, sb.source AS source_b,
         sa.n_sh AS n_a, sb.n_sh AS n_b,
         ({" + ".join(f"CASE WHEN sa.sig_{i} = sb.sig_{i} THEN 1 ELSE 0 END" for i in range(MINHASH_PERMS))}) AS matches
  FROM sigs sa JOIN sigs sb ON sa.source < sb.source
)
SELECT p.source_a, p.source_b, p.n_a, p.n_b,
       CAST(COALESCE(i.n_common, 0) AS BIGINT) AS n_common,
       CAST(p.n_a + p.n_b - COALESCE(i.n_common, 0) AS BIGINT) AS n_union,
       COALESCE(i.n_common, 0) / (p.n_a + p.n_b - COALESCE(i.n_common, 0)) AS exact_jaccard,
       matches / {MINHASH_PERMS} AS est_jaccard
FROM pairs p LEFT JOIN inter i ON p.source_a = i.source_a AND p.source_b = i.source_b
"""

_ROWS_PER_BAND = MINHASH_PERMS // LSH_BANDS


def _band_expr(b: int) -> str:
    parts = [f"sig_{b * _ROWS_PER_BAND + r}::VARCHAR" for r in range(_ROWS_PER_BAND)]
    return " || '_' || ".join(parts)


DEDUP_MINHASH_LSH = f"""
WITH {_SHINGLES_CTE},
sigs AS (
  SELECT doc_id, {_minhash_sig_selects()}
  FROM sh GROUP BY doc_id
),
banded AS (
  SELECT doc_id, {", ".join(f"{_band_expr(b)} AS band_{b}" for b in range(LSH_BANDS))}
  FROM sigs
),
candidates AS (
  {" UNION ".join(
    f'''SELECT x.doc_id AS id_a, y.doc_id AS id_b
        FROM banded x JOIN banded y ON x.band_{b} = y.band_{b} AND x.doc_id < y.doc_id'''
    for b in range(LSH_BANDS)
  )}
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
common AS (
  SELECT c.id_a, c.id_b, count(*) AS n_common
  FROM candidates c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT c.id_a, c.id_b,
       c.n_common / (sa.n_sh + sb.n_sh - c.n_common) AS jaccard
FROM common c
JOIN sizes sa ON c.id_a = sa.doc_id
JOIN sizes sb ON c.id_b = sb.doc_id
WHERE c.n_common / (sa.n_sh + sb.n_sh - c.n_common) >= {JACCARD_THRESHOLD}
"""

# connected components over the LSH pair graph: recursive CTE computes, for
# every doc, the min doc_id reachable through dup edges — exact equality
# with the Spark min-label-propagation fixpoint
# the near-dup CDC twins: batch MinHash-LSH over SURVIVING documents
# (doc_id % 7 <> 0 — 7 is coprime to the 3 chunks, so the staged
# tombstones spread across all chunks and delete-before-insert occurs);
# deletes only lower shingle df, so the uncapped-stream == capped-batch
# identity carries over from the insert-only family
DEDUP_MINHASH_LSH_SURVIVORS = DEDUP_MINHASH_LSH.replace(
    "AS t FROM documents)", "AS t FROM documents WHERE doc_id % 7 <> 0)"
)


DEDUP_CLUSTERS = f"""
WITH RECURSIVE
pairs AS ({DEDUP_MINHASH_LSH}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(doc_id, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.doc_id = e.dst
)
SELECT doc_id, min(lab) AS canonical_id FROM reach GROUP BY 1
"""

CLUSTER_AWARE_SPLIT = f"""
WITH cc AS ({DEDUP_CLUSTERS}),
b AS (
  SELECT doc_id, canonical_id,
         {H60.format(c=f"'{CAS_SEED}:' || canonical_id::VARCHAR")} % 1000 AS bk
  FROM cc
)
SELECT doc_id, canonical_id,
       CASE WHEN bk < {CAS_VAL_PER_MILLE} THEN 'val'
            WHEN bk < {CAS_VAL_PER_MILLE + CAS_TEST_PER_MILLE} THEN 'test'
            ELSE 'train' END AS split
FROM b
"""

BOILERPLATE_SCRUB = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
base AS (SELECT doc_id, toks, CAST(floor(len(toks) / {BP_SEG_LEN}) AS INT) AS n_seg FROM t),
seg AS (
  SELECT doc_id, i AS seg_idx,
         toks[(i*{BP_SEG_LEN}+1):(i*{BP_SEG_LEN}+{BP_SEG_LEN})] AS seg_toks
  FROM base, UNNEST(range(CAST(n_seg AS BIGINT))) AS u(i)
),
segh AS (
  SELECT doc_id, seg_idx, seg_toks,
         {H60.format(c="array_to_string(seg_toks, ' ')")} AS seg_h
  FROM seg
),
hot AS (SELECT seg_h FROM segh GROUP BY 1 HAVING count(DISTINCT doc_id) >= {BP_DF_THRESHOLD}),
kept AS (SELECT * FROM segh WHERE seg_h NOT IN (SELECT seg_h FROM hot)),
agg AS (
  SELECT doc_id, count(*) AS n_kept,
         flatten(list(seg_toks ORDER BY seg_idx)) AS kept_toks
  FROM kept GROUP BY 1
),
clean AS (
  SELECT b.doc_id, b.n_seg, coalesce(a.n_kept, 0) AS n_kept,
         coalesce(a.kept_toks, CAST([] AS VARCHAR[])) || b.toks[(b.n_seg*{BP_SEG_LEN}+1):] AS clean_toks
  FROM base b LEFT JOIN agg a USING (doc_id)
)
SELECT doc_id,
       n_seg AS n_segments,
       CAST(n_seg - n_kept AS INT) AS n_removed,
       CAST(len(clean_toks) AS INT) AS n_tokens_clean,
       md5(coalesce(array_to_string(clean_toks, ' '), '')) AS clean_fp
FROM clean
"""

# NOTE: the certified BIGRAM_LM_SCORE / SPARSE_COSINE_PAIRS oracles live
# further down (round-5: the LM's per-doc log-prob sum is fixed-point
# quantized so the Σ is integer-exact — the float version here was
# never registrable because its Σ lp·cnt was shuffle-order dependent).

BIGRAM_LM_SCORE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bg AS (
  SELECT doc_id,
         ({H60.format(c="prev")}) % {BIGRAM_BUCKETS} AS ctx,
         ({H60.format(c="cur")}) % {BIGRAM_BUCKETS} AS w
  FROM (
    SELECT doc_id, t[i] AS prev, t[i + 1] AS cur
    FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i))
),
per_doc AS (SELECT doc_id, ctx, w, CAST(count(*) AS BIGINT) AS cnt FROM bg GROUP BY 1, 2, 3),
c2 AS (SELECT ctx, w, CAST(SUM(cnt) AS BIGINT) AS c2 FROM per_doc GROUP BY 1, 2),
c1 AS (SELECT ctx, CAST(SUM(cnt) AS BIGINT) AS c1 FROM per_doc GROUP BY 1),
lp AS (
  SELECT c2.ctx, c2.w,
         CAST(round(log2((c2.c2 + 1)::DOUBLE / (c1.c1 + {BIGRAM_BUCKETS})::DOUBLE)
                    * {LP_SCALE}) AS BIGINT) AS lpu
  FROM c2 JOIN c1 USING (ctx)
),
scored AS (
  SELECT p.doc_id, CAST(SUM(p.cnt) AS INT) AS n_bigrams,
         round(-((SUM(l.lpu * p.cnt) / {LP_SCALE}) / SUM(p.cnt)), 6) AS bigram_ce
  FROM per_doc p JOIN lp l ON l.ctx = p.ctx AND l.w = p.w
  GROUP BY 1
)
SELECT d.doc_id, CAST(COALESCE(s.n_bigrams, 0) AS INT) AS n_bigrams, s.bigram_ce
FROM documents d LEFT JOIN scored s USING (doc_id)
"""

_SIMHASH_CTE = f"""
tk AS (
  SELECT doc_id, {H60.format(c="tok")} AS h FROM (
    SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents
  ) WHERE tok <> ''
),
bitsum AS (
  SELECT doc_id, j, sum(((h >> j) & 1) * 2 - 1) AS s
  FROM tk, generate_series(0, {SIMHASH_BITS - 1}) AS gs(j)
  GROUP BY 1, 2
),
simhashes AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END) AS BIGINT) AS simhash
  FROM bitsum GROUP BY 1
)
"""

SIMHASH_FINGERPRINTS = f"WITH {_SIMHASH_CTE} SELECT doc_id, simhash FROM simhashes"

DEDUP_SIMHASH = f"""
WITH {_SIMHASH_CTE},
chunked AS (
  SELECT doc_id, simhash,
         {", ".join(f"(simhash >> {b * 15}) & {(1 << 15) - 1} AS c_{b}" for b in range(SIMHASH_BANDS))}
  FROM simhashes
),
cands AS (
  {" UNION ".join(
    f'''SELECT x.doc_id AS id_a, y.doc_id AS id_b, x.simhash AS sh_a, y.simhash AS sh_b
        FROM chunked x JOIN chunked y ON x.c_{b} = y.c_{b} AND x.doc_id < y.doc_id'''
    for b in range(SIMHASH_BANDS)
  )}
)
SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
FROM cands
WHERE bit_count(xor(sh_a, sh_b)) <= {HAMMING_MAX}
"""

DOC_STATS = """
WITH t AS (
  SELECT doc_id,
         length(text) AS n_chars_actual,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_uniq_tokens
  FROM documents
)
SELECT doc_id,
       CAST(n_chars_actual AS BIGINT) AS n_chars_actual,
       CAST(n_tokens AS INT) AS n_tokens,
       CAST(n_uniq_tokens AS INT) AS n_uniq_tokens,
       round(n_uniq_tokens / n_tokens, 6) AS uniq_ratio,
       round(0.5 * least(1.0, n_tokens / 100.0) + 0.5 * (n_uniq_tokens / n_tokens), 6) AS quality_score
FROM t
"""


def _lang_case() -> str:
    # exact twin of the Spark when-chain: built innermost-first over
    # reverse-sorted languages, so evaluation order (and tie-breaks) match
    expr = "'unk'"
    for lang in sorted(LANG_MARKERS, reverse=True):
        expr = f"CASE WHEN s_{lang} = best AND best > 0 THEN '{lang}' ELSE {expr} END"
    return expr


_LANG_ID_CTES = f"""scored AS (
  SELECT doc_id,
         {", ".join(
           f"len(list_intersect(list_distinct(string_split(text, ' ')), {list(m)})) AS s_{lang}"
           for lang, m in LANG_MARKERS.items()
         )}
  FROM documents
),
withbest AS (
  SELECT *, greatest({", ".join(f"s_{lang}" for lang in LANG_MARKERS)}) AS best FROM scored
)"""

LANG_ID = f"""
WITH {_LANG_ID_CTES}
SELECT doc_id, {_lang_case()} AS lang_pred FROM withbest
"""

LANG_CONFUSION = f"""
WITH {_LANG_ID_CTES},
pred AS (SELECT doc_id, {_lang_case()} AS lang_pred FROM withbest),
cm AS (
  SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n
  FROM documents d JOIN pred p USING (doc_id)
  GROUP BY 1, 2
)
SELECT lang, lang_pred, n,
       n / SUM(n) OVER (PARTITION BY lang) AS share_of_lang
FROM cm
"""

TOKEN_COUNTS = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
       CAST(list_sum(list_transform(string_split(text, ' '), t -> (length(t) + 3) // 4)) AS BIGINT) AS n_bpe_est,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS INT) AS n_pieces
FROM documents
"""

TOKENIZER_FERTILITY = f"""
WITH {_LANG_ID_CTES},
pred AS (SELECT doc_id, {_lang_case()} AS lang_pred FROM withbest),
tc AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
         CAST(list_sum(list_transform(string_split(text, ' '), t -> (length(t) + 3) // 4)) AS BIGINT) AS n_bpe_est,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS INT) AS n_pieces
  FROM documents
)
SELECT lang_pred,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_ws_tokens) AS BIGINT) AS ws_tokens,
       CAST(SUM(n_bpe_est) AS BIGINT) AS bpe_tokens,
       CAST(SUM(n_pieces) AS BIGINT) AS pieces,
       CAST(SUM(n_bpe_est) AS BIGINT) / CAST(SUM(n_ws_tokens) AS BIGINT) AS fertility,
       CAST(SUM(n_pieces) AS BIGINT) / CAST(SUM(n_ws_tokens) AS BIGINT) AS pieces_per_word
FROM tc JOIN pred USING (doc_id)
GROUP BY 1
"""

_LANG_SCORED = ", ".join(
    f"len(list_intersect(list_distinct(string_split(text, ' ')), {list(m)})) AS s_{lang}"
    for lang, m in LANG_MARKERS.items()
)


def _corpus_prep_sql() -> str:
    return f"""
WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
stats AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
         round(0.5 * least(1.0, len(string_split(text, ' ')) / 100.0)
               + 0.5 * (len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' '))), 6) AS quality_score
  FROM documents
),
scored AS (SELECT doc_id, {_LANG_SCORED} FROM documents),
withbest AS (
  SELECT *, greatest({", ".join(f"s_{lang}" for lang in LANG_MARKERS)}) AS best FROM scored
),
langs AS (SELECT doc_id, {_lang_case()} AS lang_pred FROM withbest),
toks AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(string_split(text, ' '), t -> (length(t) + 3) // 4)) AS BIGINT) AS n_bpe_est
  FROM documents
)
SELECT s.doc_id, s.n_tokens, t.n_bpe_est, s.quality_score
FROM stats s
JOIN keep k ON s.doc_id = k.doc_id
JOIN langs l ON s.doc_id = l.doc_id
JOIN toks t ON s.doc_id = t.doc_id
WHERE s.quality_score >= 0.5 AND l.lang_pred = 'en'
"""


_RK_POWERS = [RK_BASE ** (RK_WINDOW - 1 - i) for i in range(RK_WINDOW)]

ROLLING_FINGERPRINT = f"""
WITH toks0 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
pos AS (
  SELECT doc_id, i - 1 AS pos, ({H60.format(c="t[i]")}) % {RK_TOKMOD} AS th, len(t) AS n_tokens
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM toks0)
),
weighted AS (
  SELECT doc_id, pos - d AS wstart,
         th * ([{", ".join(str(p) for p in _RK_POWERS)}])[d + 1] AS term,
         n_tokens
  FROM pos, generate_series(0, {RK_WINDOW - 1}) AS gd(d)
),
fps AS (
  SELECT doc_id, wstart, CAST(sum(term) % {RK_MOD} AS BIGINT) AS wfp
  FROM weighted
  WHERE wstart >= 0 AND wstart <= n_tokens - {RK_WINDOW}
  GROUP BY 1, 2
),
minfp AS (SELECT doc_id, min(wfp) AS min_fp FROM fps GROUP BY 1)
SELECT d.doc_id, CAST(coalesce(m.min_fp, -1) AS BIGINT) AS min_fp
FROM documents d LEFT JOIN minfp m ON d.doc_id = m.doc_id
"""

DEDUP_SUBSTRING = f"""
WITH toks0 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
pos AS (
  SELECT doc_id, i - 1 AS pos, ({H60.format(c="t[i]")}) % {RK_TOKMOD} AS th, len(t) AS n_tokens
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM toks0)
),
weighted AS (
  SELECT doc_id, pos - d AS wstart,
         th * ([{", ".join(str(p) for p in _RK_POWERS)}])[d + 1] AS term,
         n_tokens
  FROM pos, generate_series(0, {RK_WINDOW - 1}) AS gd(d)
),
fps AS (
  SELECT doc_id, wstart, CAST(sum(term) % {RK_MOD} AS BIGINT) AS wfp
  FROM weighted
  WHERE wstart >= 0 AND wstart <= n_tokens - {RK_WINDOW}
  GROUP BY 1, 2
),
dfp0 AS (SELECT DISTINCT doc_id, wfp FROM fps),
-- df-cap mirror (operators/dedup.py SUBSTR_DF_CAP)
dfp AS (
  SELECT doc_id, wfp FROM dfp0
  WHERE wfp IN (SELECT wfp FROM dfp0 GROUP BY 1 HAVING count(*) <= {SUBSTR_DF_CAP})
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
FROM dfp a JOIN dfp b ON a.wfp = b.wfp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= {SUBSTR_MIN_WINDOWS}
"""

# ---------------------------------------------------------------- vectors

_QVEC = f"list_transform(embedding, x -> CAST(round(x::DOUBLE * {Q_SCALE}) AS BIGINT))"
_IDOT = "list_sum(list_transform(generate_series(1, {n}), i -> {a}[i] * {b}[i]))"


def _cosine_sql(a: str, b: str) -> str:
    dot = _IDOT.format(n=DIM, a=a, b=b)
    na = _IDOT.format(n=DIM, a=a, b=a)
    nb = _IDOT.format(n=DIM, a=b, b=b)
    return f"({dot}) / (sqrt(({na})::DOUBLE) * sqrt(({nb})::DOUBLE))"


KNN_BRUTE = f"""
WITH e AS (SELECT vec_id, {_QVEC} AS q FROM embeddings),
qs AS (SELECT vec_id AS query_id, q AS qq FROM e WHERE vec_id % 100 = 0),
scored AS (
  SELECT query_id, c.vec_id AS neighbor_id, {_cosine_sql("qq", "c.q")} AS cosine
  FROM qs, e c
  WHERE query_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= {KNN_K}
"""


# SQ8 mirrors operators/similarity.knn_sq8: _rdiv(n, d) = floor((2n+d)/(2d))
# round-half-up, code = clamp(_rdiv((q−mn)·255, step), 0, 255) — the clamp
# is a no-op for full-corpus training and load-bearing for the frozen
# stream index — x̂ = mn + _rdiv(code·step, 255).
_SQ8_CODE = (
    "LEAST(255, GREATEST(0, "
    "CAST(floor(((q[i] - mn[i]) * 510 + step[i])::DOUBLE / (2 * step[i])) AS BIGINT)))"
)
_SQ8_XHAT = (
    "mn[i] + CASE WHEN step[i] <= 0 THEN 0 "
    f"ELSE CAST(floor((2 * {_SQ8_CODE} * step[i] + 255)::DOUBLE / 510) AS BIGINT) END"
)


def _knn_sq8_sql(train_src: str = "e", cdc: bool = False, filtered: bool = False) -> str:
    """SQ8 oracle, parameterized by the quantizer's training source:
    the full corpus (`e`, batch knn_sq8), the first arrival chunk
    (`e_t`, the frozen stream index — `_knn_pq_index_sql`'s contract),
    or the CDC feed's chunk 0 (`cdc=True`: modulo chunks, train on
    vec_id % 4 == 0 — all of it, no chunk-0 key's tombstone routes to
    chunk 0, the `_knn_pq_index_cdc_sql` argument; scoring then
    excludes dead vectors on both sides). `filtered=True` adds the
    label conjunct on the scored pairs (candidate label == query
    label), mirroring `sq8_index_filtered_search`'s in-scan predicate
    on the stored label payload."""
    from ..operators.similarity import PQ_INDEX_CHUNKS

    extra = ""
    if cdc:
        extra = f"{train_src} AS (SELECT * FROM e WHERE vec_id % 4 = 0),\n"
    elif train_src != "e":
        extra = (
            f"{train_src} AS (SELECT * FROM e QUALIFY"
            f" row_number() OVER (ORDER BY vec_id)"
            f" <= count(*) OVER () // {PQ_INDEX_CHUNKS}),\n"
        )
    surv = (
        "\n    AND query_id % 9 <> 5 AND c.vec_id % 9 <> 5" if cdc else ""
    )
    lab_cte = (
        ",\nlab AS (SELECT vec_id, label FROM embeddings)" if filtered else ""
    )
    lab_src = "\n       , lab nl, lab ql" if filtered else ""
    lab_where = (
        "\n    AND nl.vec_id = c.vec_id AND ql.vec_id = query_id"
        "\n    AND ql.label = nl.label"
        if filtered
        else ""
    )
    return f"""
WITH e AS (SELECT vec_id, {_QVEC} AS q FROM embeddings){lab_cte},
{extra}dims AS (
  SELECT g.i AS pos, min(q[g.i]) AS mn, max(q[g.i]) - min(q[g.i]) AS st
  FROM {train_src}, generate_series(1, {DIM}) AS g(i)
  GROUP BY g.i
),
stats AS (SELECT list(mn ORDER BY pos) AS mn, list(st ORDER BY pos) AS step FROM dims),
enc AS (
  SELECT vec_id,
         list_transform(generate_series(1, {DIM}), i -> {_SQ8_XHAT}) AS xh
  FROM e, stats
),
recon AS (SELECT vec_id, xh, {_IDOT.format(n=DIM, a="xh", b="xh")} AS rn2 FROM enc),
qs AS (
  SELECT vec_id AS query_id, q AS qq, {_IDOT.format(n=DIM, a="q", b="q")} AS qn2
  FROM e WHERE vec_id % 100 = 0
),
scored AS (
  SELECT query_id, c.vec_id AS neighbor_id,
         ({_IDOT.format(n=DIM, a="qq", b="c.xh")})
           / (sqrt(qn2::DOUBLE) * sqrt(c.rn2::DOUBLE)) AS cosine_sq8
  FROM qs, recon c{lab_src}
  WHERE query_id <> c.vec_id{surv}{lab_where}
),
ranked AS (
  SELECT query_id, neighbor_id, cosine_sq8,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine_sq8 DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cosine_sq8, 6) AS cosine_sq8, rank
FROM ranked WHERE rank <= {KNN_K}
"""


KNN_SQ8 = _knn_sq8_sql()
KNN_SQ8_INDEX = _knn_sq8_sql(train_src="e_t")
KNN_SQ8_INDEX_CDC = _knn_sq8_sql(train_src="e_t", cdc=True)
KNN_SQ8_INDEX_CDC_FILTERED = _knn_sq8_sql(train_src="e_t", cdc=True, filtered=True)

# IVF-SQ8 composite: KNN_IVF's cents/assign/probes CTEs verbatim + the
# SQ8 dims/stats/enc block; scoring joins the dequantized recon frame
# instead of the exact vectors
KNN_IVFSQ8 = f"""
WITH e AS (SELECT vec_id, {_QVEC} AS q FROM embeddings),
dims AS (
  SELECT g.i AS pos, min(q[g.i]) AS mn, max(q[g.i]) - min(q[g.i]) AS st
  FROM e, generate_series(1, {DIM}) AS g(i)
  GROUP BY g.i
),
stats AS (SELECT list(mn ORDER BY pos) AS mn, list(st ORDER BY pos) AS step FROM dims),
recon AS (
  SELECT vec_id, xh, {_IDOT.format(n=DIM, a="xh", b="xh")} AS rn2 FROM (
    SELECT vec_id,
           list_transform(generate_series(1, {DIM}), i -> {_SQ8_XHAT}) AS xh
    FROM e, stats)
),
cents AS (SELECT vec_id AS cent_id, q AS cq FROM e WHERE vec_id % {IVF_CENT_MOD} = 1),
assign AS (
  SELECT vec_id, cent_id AS list_id FROM (
    SELECT e.vec_id, c.cent_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cosine_sql("e.q", "c.cq")} DESC, c.cent_id ASC) AS rn
    FROM e, cents c
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, cent_id AS list_id FROM (
    SELECT qs.vec_id AS query_id, c.cent_id,
           row_number() OVER (PARTITION BY qs.vec_id
                              ORDER BY {_cosine_sql("qs.q", "c.cq")} DESC, c.cent_id ASC) AS rn
    FROM e qs, cents c WHERE qs.vec_id % 100 = 0
  ) WHERE rn <= {IVF_NPROBE}
),
qs2 AS (
  SELECT vec_id AS query_id, q AS qq, {_IDOT.format(n=DIM, a="q", b="q")} AS qn2
  FROM e WHERE vec_id % 100 = 0
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         ({_IDOT.format(n=DIM, a="qv.qq", b="r.xh")})
           / (sqrt(qv.qn2::DOUBLE) * sqrt(r.rn2::DOUBLE)) AS cosine_sq8
  FROM probes p
  JOIN assign a ON p.list_id = a.list_id
  JOIN qs2 qv ON qv.query_id = p.query_id
  JOIN recon r ON r.vec_id = a.vec_id
  WHERE p.query_id <> a.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine_sq8,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine_sq8 DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cosine_sq8, 6) AS cosine_sq8, rank
FROM ranked WHERE rank <= {KNN_K}
"""

# filtered IVF-SQ8: the label predicate applied to candidates inside the
# probed lists before asymmetric-distance scoring, probes widened to
# FILTERED_NPROBE — KNN_IVFSQ8 with the label riding assign/probes
KNN_IVFSQ8_FILTERED = f"""
WITH e AS (SELECT vec_id, label, {_QVEC} AS q FROM embeddings),
dims AS (
  SELECT g.i AS pos, min(q[g.i]) AS mn, max(q[g.i]) - min(q[g.i]) AS st
  FROM e, generate_series(1, {DIM}) AS g(i)
  GROUP BY g.i
),
stats AS (SELECT list(mn ORDER BY pos) AS mn, list(st ORDER BY pos) AS step FROM dims),
recon AS (
  SELECT vec_id, xh, {_IDOT.format(n=DIM, a="xh", b="xh")} AS rn2 FROM (
    SELECT vec_id,
           list_transform(generate_series(1, {DIM}), i -> {_SQ8_XHAT}) AS xh
    FROM e, stats)
),
cents AS (SELECT vec_id AS cent_id, q AS cq FROM e WHERE vec_id % {IVF_CENT_MOD} = 1),
assign AS (
  SELECT vec_id, label, cent_id AS list_id FROM (
    SELECT e.vec_id, e.label, c.cent_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cosine_sql("e.q", "c.cq")} DESC, c.cent_id ASC) AS rn
    FROM e, cents c
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, qlabel, cent_id AS list_id FROM (
    SELECT qs.vec_id AS query_id, qs.label AS qlabel, c.cent_id,
           row_number() OVER (PARTITION BY qs.vec_id
                              ORDER BY {_cosine_sql("qs.q", "c.cq")} DESC, c.cent_id ASC) AS rn
    FROM e qs, cents c WHERE qs.vec_id % 100 = 0
  ) WHERE rn <= {FILTERED_NPROBE}
),
qs2 AS (
  SELECT vec_id AS query_id, q AS qq, {_IDOT.format(n=DIM, a="q", b="q")} AS qn2
  FROM e WHERE vec_id % 100 = 0
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         ({_IDOT.format(n=DIM, a="qv.qq", b="r.xh")})
           / (sqrt(qv.qn2::DOUBLE) * sqrt(r.rn2::DOUBLE)) AS cosine_sq8
  FROM probes p
  JOIN assign a ON p.list_id = a.list_id AND a.label = p.qlabel
  JOIN qs2 qv ON qv.query_id = p.query_id
  JOIN recon r ON r.vec_id = a.vec_id
  WHERE p.query_id <> a.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine_sq8,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine_sq8 DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cosine_sq8, 6) AS cosine_sq8, rank
FROM ranked WHERE rank <= {KNN_K}
"""


def _rp_proj_sql() -> str:
    """The 16 projected-and-downscaled components as a SQL list literal —
    coefficient lists generated from the SAME `_plane_coeff` stream
    (offset RP_PLANE_OFFSET) the Spark side uses; floor(x/4096.0) is
    exact (power-of-two division of ints < 2^53)."""
    from ..operators.similarity import RP_DIM, RP_PLANE_OFFSET, RP_SHIFT

    comps = []
    for p in range(RP_DIM):
        coeffs = ", ".join(str(_plane_coeff(RP_PLANE_OFFSET + p, d)) for d in range(DIM))
        proj = f"list_sum(list_transform(generate_series(1, {DIM}), i -> q[i] * ([{coeffs}])[i]))"
        comps.append(f"CAST(floor(({proj}) / {RP_SHIFT}.0) AS BIGINT)")
    return "[" + ", ".join(comps) + "]"


def _rp_dim() -> int:
    from ..operators.similarity import RP_DIM

    return RP_DIM


KNN_RP = f"""
WITH e AS (SELECT vec_id, {_QVEC} AS q FROM embeddings),
proj AS (SELECT vec_id, {_rp_proj_sql()} AS qp FROM e),
qs AS (SELECT vec_id AS query_id, qp AS qq FROM proj WHERE vec_id % 100 = 0),
scored AS (
  SELECT query_id, c.vec_id AS neighbor_id,
         {_IDOT.format(n=_rp_dim(), a="qq", b="c.qp")}
           / (sqrt({_IDOT.format(n=_rp_dim(), a="qq", b="qq")})
              * sqrt({_IDOT.format(n=_rp_dim(), a="c.qp", b="c.qp")})) AS cosine_rp
  FROM qs, proj c
  WHERE query_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine_rp,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine_rp DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cosine_rp, 6) AS cosine_rp, rank
FROM ranked WHERE rank <= {KNN_K}
"""


def _band_bucket_sql(q: str, band: int, rows: int) -> str:
    """Mirror of the Spark band_col: sign bits of the band's `rows`
    hyperplanes (plane index band*rows + r, bit 1 << r)."""
    terms = []
    for r in range(rows):
        p = band * rows + r
        coeffs = ", ".join(str(_plane_coeff(p, d)) for d in range(DIM))
        proj = f"list_sum(list_transform(generate_series(1, {DIM}), i -> {q}[i] * ([{coeffs}])[i]))"
        terms.append(f"CASE WHEN ({proj}) > 0 THEN {1 << r}::BIGINT ELSE 0::BIGINT END")
    return " + ".join(terms)


_LSH_ROWS = LSH_PLANES // 2
_LSH_BAND_COLS = ", ".join(
    f"({_band_bucket_sql('q', b, _LSH_ROWS)}) AS b{b}" for b in range(LSH_SIGN_BANDS)
)
_LSH_STACK = " UNION ALL ".join(
    f"SELECT vec_id, {b} AS bi, b{b} AS bv FROM eb" for b in range(LSH_SIGN_BANDS)
)

KNN_LSH = f"""
WITH e AS (SELECT vec_id, {_QVEC} AS q FROM embeddings),
eb AS (SELECT vec_id, q, {_LSH_BAND_COLS} FROM e),
stacked AS ({_LSH_STACK}),
qb AS (SELECT vec_id AS query_id, bi, bv FROM stacked WHERE vec_id % 100 = 0),
cands AS (
  SELECT DISTINCT qb.query_id, s.vec_id AS neighbor_id
  FROM stacked s JOIN qb ON s.bi = qb.bi AND s.bv = qb.bv
  WHERE qb.query_id <> s.vec_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id, {_cosine_sql("qs.q", "nb.q")} AS cosine
  FROM cands c
  JOIN e qs ON qs.vec_id = c.query_id
  JOIN e nb ON nb.vec_id = c.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= {KNN_K}
"""

def _knn_lsh_multiprobe_sql() -> str:
    """Multi-probe sign-LSH oracle (operators/similarity.knn_lsh_multiprobe,
    cell for cell): the corpus band frame is knn_lsh's; the query side
    adds, per band, the `probes` buckets reached by xor-flipping the
    lowest-|projection| sign bits (ties: plane asc)."""
    from ..operators.similarity import LSH_MULTIPROBE

    rows = _LSH_ROWS
    coef_vals = ", ".join(
        f"({p}, {d + 1}, {_plane_coeff(p, d)})"
        for p in range(LSH_SIGN_BANDS * rows)
        for d in range(DIM)
    )
    return f"""
WITH e AS (SELECT vec_id, {_QVEC} AS q FROM embeddings),
eb AS (SELECT vec_id, q, {_LSH_BAND_COLS} FROM e),
stacked AS ({_LSH_STACK}),
coef AS (SELECT * FROM (VALUES {coef_vals}) AS t(p, d, c)),
qproj AS (
  SELECT e.vec_id, co.p, sum(e.q[co.d] * co.c) AS proj
  FROM e JOIN coef co ON TRUE
  WHERE e.vec_id % 100 = 0 GROUP BY 1, 2),
qband AS (
  SELECT vec_id, p // {rows} AS bi,
         sum(CASE WHEN proj > 0 THEN (1 << (p % {rows}))::BIGINT ELSE 0::BIGINT END) AS bv
  FROM qproj GROUP BY 1, 2),
flips AS (
  SELECT vec_id, bi, bit FROM (
    SELECT vec_id, p // {rows} AS bi, p % {rows} AS bit,
           row_number() OVER (PARTITION BY vec_id, p // {rows}
                  ORDER BY abs(proj) ASC, p ASC) AS rn
    FROM qproj) WHERE rn <= {LSH_MULTIPROBE}),
qprobe AS (
  SELECT vec_id AS query_id, bi, bv FROM qband
  UNION ALL
  SELECT f.vec_id AS query_id, f.bi, xor(b.bv, (1 << f.bit)::BIGINT) AS bv
  FROM flips f JOIN qband b ON f.vec_id = b.vec_id AND f.bi = b.bi),
cands AS (
  SELECT DISTINCT qp.query_id, s.vec_id AS neighbor_id
  FROM stacked s JOIN qprobe qp ON s.bi = qp.bi AND s.bv = qp.bv
  WHERE qp.query_id <> s.vec_id),
scored AS (
  SELECT c.query_id, c.neighbor_id, {_cosine_sql("qs.q", "nb.q")} AS cosine
  FROM cands c
  JOIN e qs ON qs.vec_id = c.query_id
  JOIN e nb ON nb.vec_id = c.neighbor_id),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored)
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= {KNN_K}
"""


KNN_LSH_MULTIPROBE = _knn_lsh_multiprobe_sql()

KNN_IVF = f"""
WITH e AS (SELECT vec_id, {_QVEC} AS q FROM embeddings),
cents AS (SELECT vec_id AS cent_id, q AS cq FROM e WHERE vec_id % {IVF_CENT_MOD} = 1),
assign AS (
  SELECT vec_id, cent_id AS list_id FROM (
    SELECT e.vec_id, c.cent_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cosine_sql("e.q", "c.cq")} DESC, c.cent_id ASC) AS rn
    FROM e, cents c
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, cent_id AS list_id FROM (
    SELECT qs.vec_id AS query_id, c.cent_id,
           row_number() OVER (PARTITION BY qs.vec_id
                              ORDER BY {_cosine_sql("qs.q", "c.cq")} DESC, c.cent_id ASC) AS rn
    FROM e qs, cents c WHERE qs.vec_id % 100 = 0
  ) WHERE rn <= {IVF_NPROBE}
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, {_cosine_sql("qv.q", "nv.q")} AS cosine
  FROM probes p
  JOIN assign a ON p.list_id = a.list_id
  JOIN e qv ON qv.vec_id = p.query_id
  JOIN e nv ON nv.vec_id = a.vec_id
  WHERE p.query_id <> a.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= {KNN_K}
"""

KNN_BRUTE_FILTERED = f"""
WITH e AS (SELECT vec_id, label, {_QVEC} AS q FROM embeddings),
qs AS (SELECT vec_id AS query_id, label AS qlabel, q AS qq
       FROM e WHERE vec_id % 100 = 0),
scored AS (
  SELECT query_id, c.vec_id AS neighbor_id, {_cosine_sql("qq", "c.q")} AS cosine
  FROM qs, e c
  WHERE query_id <> c.vec_id AND c.label = qlabel
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= {KNN_K}
"""

# filtered IVF probes wider than plain IVF (FILTERED_NPROBE) because the
# label predicate thins every probed list ~|labels|-fold
KNN_IVF_FILTERED = f"""
WITH e AS (SELECT vec_id, label, {_QVEC} AS q FROM embeddings),
cents AS (SELECT vec_id AS cent_id, q AS cq FROM e WHERE vec_id % {IVF_CENT_MOD} = 1),
assign AS (
  SELECT vec_id, label, cent_id AS list_id FROM (
    SELECT e.vec_id, e.label, c.cent_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cosine_sql("e.q", "c.cq")} DESC, c.cent_id ASC) AS rn
    FROM e, cents c
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, qlabel, cent_id AS list_id FROM (
    SELECT qs.vec_id AS query_id, qs.label AS qlabel, c.cent_id,
           row_number() OVER (PARTITION BY qs.vec_id
                              ORDER BY {_cosine_sql("qs.q", "c.cq")} DESC, c.cent_id ASC) AS rn
    FROM e qs, cents c WHERE qs.vec_id % 100 = 0
  ) WHERE rn <= {FILTERED_NPROBE}
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, {_cosine_sql("qv.q", "nv.q")} AS cosine
  FROM probes p
  JOIN assign a ON p.list_id = a.list_id AND a.label = p.qlabel
  JOIN e qv ON qv.vec_id = p.query_id
  JOIN e nv ON nv.vec_id = a.vec_id
  WHERE p.query_id <> a.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= {KNN_K}
"""

EMBEDDING_DEDUP = f"""
WITH e AS (SELECT vec_id, label, {_QVEC} AS q FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({_cosine_sql("a.q", "b.q")}, 6) AS cosine
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_cosine_sql("a.q", "b.q")} >= {EMB_DEDUP_THRESHOLD}
"""

# candidates = any shared (band, bucket); the Spark side's per-bucket
# top-k PRE-prune is exact (a global top-k pair ranks <= k inside its own
# bucket under the identical order), so ranking the unpruned union here
# reproduces it
# CTE body shared by KNN_GRAPH and PAGERANK_KNN (which runs PageRank over
# the exact same edge list).
_KNN_GRAPH_CTES = f"""e AS (SELECT vec_id, {_QVEC} AS q FROM embeddings),
eb AS (SELECT vec_id, q, {_LSH_BAND_COLS} FROM e),
stacked AS ({_LSH_STACK}),
cands AS (
  SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS nbr_id
  FROM stacked a JOIN stacked b ON a.bi = b.bi AND a.bv = b.bv
  WHERE a.vec_id <> b.vec_id
),
scored AS (
  SELECT c.src_id, c.nbr_id, {_cosine_sql("sa.q", "sb.q")} AS cosine
  FROM cands c
  JOIN e sa ON sa.vec_id = c.src_id
  JOIN e sb ON sb.vec_id = c.nbr_id
),
ranked AS (
  SELECT src_id, nbr_id, cosine,
         CAST(row_number() OVER (PARTITION BY src_id ORDER BY cosine DESC, nbr_id ASC) AS INT) AS rank
  FROM scored
)"""

KNN_GRAPH = f"""
WITH {_KNN_GRAPH_CTES}
SELECT src_id, nbr_id, round(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= {KNN_GRAPH_K}
"""

# batch knn_graph over SURVIVORS (vec_id % 9 == 5 deleted) — what the
# stream-maintained graph must serve after tombstone retraction
KNN_GRAPH_SURVIVORS = KNN_GRAPH.replace(
    "AS q FROM embeddings)", "AS q FROM embeddings WHERE vec_id % 9 <> 5)"
)


def _graph_ann_sql(vec_where: str = "TRUE") -> str:
    """Graph-ANN beam-search oracle (operators/similarity.
    graph_ann_search, hop for hop): the k-NN graph CTEs build the edge
    list, the coarse-quantizer CTEs replay the IVF entry selection
    (seed centroids, argmax assignment, top-entry_probes probes — the
    KNN_IVF cents/assign/probes shapes), then GRAPH_ANN_HOPS unrolled
    rounds each expand the beam by its symmetrized neighbors, re-score
    exactly, and keep the top GRAPH_ANN_BEAM per query by (cosine desc,
    cand asc) — fully deterministic, so the final top-k hash-matches
    the Spark walk. `vec_where` scopes the whole universe (corpus,
    graph, centroids, entry points, queries) to survivors for the
    maintained-graph twin."""
    from ..operators.similarity import (
        GRAPH_ANN_BEAM,
        GRAPH_ANN_DEG,
        GRAPH_ANN_ENTRY_PROBES,
        GRAPH_ANN_HOPS,
        IVF_CENT_MOD,
    )

    ctes = _KNN_GRAPH_CTES.replace(
        "AS q FROM embeddings)", f"AS q FROM embeddings WHERE {vec_where})"
    )
    parts = [
        # the ANN rung walks a DENSER graph than the other consumers:
        # rank <= GRAPH_ANN_DEG (HNSW's M — the recall lever), while
        # components/LP/PR/triangles keep KNN_GRAPH_K
        f"ge AS (SELECT src_id, nbr_id FROM ranked WHERE rank <= {GRAPH_ANN_DEG})",
        "sym AS (SELECT src_id, nbr_id FROM ge"
        " UNION ALL SELECT nbr_id, src_id FROM ge)",
        "qs AS (SELECT vec_id AS query_id FROM e WHERE vec_id % 100 = 0)",
        # coarse-quantizer entry (graph_ann_search's _seed_cents +
        # _ivf_probes — the HNSW upper-layer descent): the beam seeds AT
        # the query's entry_probes nearest centroids, which are corpus
        # vectors and hence graph nodes; no corpus-wide assignment at
        # serve time
        f"gcents AS (SELECT vec_id AS cent_id, q AS cq FROM e"
        f" WHERE vec_id % {IVF_CENT_MOD} = 1)",
        f"""c0 AS (
  SELECT query_id, cent_id AS cand FROM (
    SELECT qv.vec_id AS query_id, c.cent_id,
           row_number() OVER (PARTITION BY qv.vec_id
             ORDER BY {_cosine_sql("qv.q", "c.cq")} DESC, c.cent_id ASC) AS rn
    FROM e qv, gcents c WHERE qv.vec_id % 100 = 0
  ) WHERE rn <= {GRAPH_ANN_ENTRY_PROBES})""",
    ]
    for i in range(GRAPH_ANN_HOPS + 1):
        parts.append(
            f"""s{i} AS (
  SELECT d.query_id, d.cand, {_cosine_sql("qv.q", "cv.q")} AS cosine
  FROM (SELECT DISTINCT query_id, cand FROM c{i}) d
  JOIN e cv ON cv.vec_id = d.cand
  JOIN e qv ON qv.vec_id = d.query_id
  WHERE d.cand <> d.query_id)"""
        )
        parts.append(
            f"""b{i} AS (
  SELECT query_id, cand, cosine FROM (
    SELECT query_id, cand, cosine,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, cand ASC) AS rn
    FROM s{i}) WHERE rn <= {GRAPH_ANN_BEAM})"""
        )
        if i < GRAPH_ANN_HOPS:
            parts.append(
                f"""c{i + 1} AS (
  SELECT query_id, cand FROM b{i}
  UNION ALL
  SELECT b{i}.query_id, sym.nbr_id AS cand FROM b{i} JOIN sym ON b{i}.cand = sym.src_id)"""
            )
    body = ",\n".join(parts)
    return f"""
WITH {ctes},
{body}
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank FROM (
  SELECT query_id, cand AS neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, cand ASC) AS INT) AS rank
  FROM b{GRAPH_ANN_HOPS}) WHERE rank <= {KNN_K}
"""


KNN_GRAPH_ANN = _graph_ann_sql()
KNN_GRAPH_ANN_SURVIVORS = _graph_ann_sql("vec_id % 9 <> 5")

GRAPH_ANN_EVAL = f"""
WITH ex AS ({KNN_BRUTE})
SELECT 'graph_ann' AS method,
       (SELECT count(*) FROM ex) AS n_exact,
       (SELECT count(*) FROM ({KNN_GRAPH_ANN}) m) AS n_method,
       (SELECT count(*) FROM ({KNN_GRAPH_ANN}) m
        JOIN ex ON m.query_id = ex.query_id AND m.neighbor_id = ex.neighbor_id) AS n_common,
       round((SELECT count(*) FROM ({KNN_GRAPH_ANN}) m
              JOIN ex ON m.query_id = ex.query_id AND m.neighbor_id = ex.neighbor_id)
             / (SELECT count(*) FROM ex)::DOUBLE, 6) AS recall
"""


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY)
_BM25_PIVOT = ",\n         ".join(
    f"MAX(CASE WHEN term = '{t}' THEN c END) AS c{i}" for i, t in enumerate(BM25_QUERY)
)
_BM25_SCORE = " + ".join(f"COALESCE(c{i}, 0.0)" for i in range(len(BM25_QUERY)))

def _bm25_sql(where: str = "TRUE") -> str:
    """BM25 oracle, parameterized by the surviving-documents predicate —
    `TRUE` for the batch/plain-index twins, `doc_id % m <> 0` for the
    CDC index twin (a deleted doc leaves tf AND df AND N AND avgdl,
    shifting every survivor's score — which is what the delete gate
    certifies)."""
    return f"""
WITH toked AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents WHERE {where}),
dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM toked),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
    SELECT doc_id, UNNEST(toks) AS term FROM toked)
  WHERE term IN ({_BM25_TERMS_SQL})
  GROUP BY 1, 2
),
dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT t.doc_id, d.dl, t.term,
         ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
           * t.tf * ({BM25_K1} + 1.0)
           / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * d.dl / (s.sum_dl / s.n_docs))) AS c
  FROM tf t JOIN dfr f USING (term), stats s
  JOIN dl d ON d.doc_id = t.doc_id
),
pivoted AS (
  SELECT doc_id, dl,
         {_BM25_PIVOT}
  FROM contrib GROUP BY 1, 2
),
scored AS (SELECT doc_id, dl, 0.0 + {_BM25_SCORE} AS score FROM pivoted)
SELECT doc_id, dl, round(score, 6) AS bm25,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
FROM scored
QUALIFY rank <= {BM25_TOPK}
"""


BM25_DEL_MOD = 6  # every doc_id % 6 == 0 gets a D_DEL in the CDC gate

BM25_SEARCH = _bm25_sql()
BM25_INDEX_DELETE_VIEW = _bm25_sql(f"doc_id % {BM25_DEL_MOD} <> 0")

SPARSE_COSINE_PAIRS = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
-- NO list_distinct: tf-cosine keeps shingle multiplicities
shm AS (
  SELECT doc_id, shingle FROM (
    SELECT doc_id, unnest(CASE WHEN len(t) >= 3 THEN
      list_transform(generate_series(1, len(t) - 2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      ELSE [] END) AS shingle
    FROM toks) WHERE shingle <> ''
),
tf AS (
  SELECT doc_id, {H60.format(c="shingle")} AS sh60, CAST(count(*) AS BIGINT) AS tf
  FROM shm GROUP BY 1, 2
),
hot AS (SELECT sh60 FROM tf GROUP BY sh60 HAVING count(*) > {DF_CAP}),
capped AS (SELECT * FROM tf WHERE sh60 NOT IN (SELECT sh60 FROM hot)),
n2 AS (SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS n2 FROM capped GROUP BY 1),
dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
  FROM capped a JOIN capped b ON a.sh60 = b.sh60 AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(c, 6) AS cosine FROM (
  SELECT d.id_a, d.id_b,
         d.dot / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)) AS c
  FROM dots d
  JOIN n2 na ON na.doc_id = d.id_a
  JOIN n2 nb ON nb.doc_id = d.id_b)
WHERE c >= {SPARSE_COS_THRESHOLD}
"""

DEDUP_RATE_BY_SOURCE = """
WITH d AS (SELECT source, md5(text) AS fp FROM documents),
per AS (SELECT source, fp, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1, 2),
fps AS (SELECT fp, CAST(count(*) AS BIGINT) AS n_sources FROM per GROUP BY 1)
SELECT p.source,
       CAST(SUM(p.n) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_unique,
       CAST(SUM(p.n - 1) AS BIGINT) AS n_dup_docs,
       SUM(p.n - 1) / SUM(p.n) AS dup_rate,
       CAST(count(CASE WHEN f.n_sources > 1 THEN 1 END) AS BIGINT) AS n_shared_fps
FROM per p JOIN fps f USING (fp)
GROUP BY 1
"""

def _hybrid_rrf_sql(lex_sql: str, vec_where: str = "TRUE") -> str:
    """Hybrid-RRF oracle, parameterized by the two survivor contracts:
    `lex_sql` is the BM25 arm (the plain search for the batch/index
    twins, the survivors variant for the CDC twins — a doc delete moves
    df/N/avgdl, so every lexical rank can shift) and `vec_where` filters
    the embedding rows feeding the semantic arm (a vector delete
    recloses the cosine top list over survivors). The fused ranking is
    recomputed from scratch over survivors — exactly what the
    tombstone-cleansed index read must serve."""
    return f"""
WITH lex AS (SELECT doc_id, rank AS r_lex FROM ({lex_sql}) bq),
e AS (SELECT vec_id, {_QVEC} AS q FROM embeddings WHERE {vec_where}),
qv AS (SELECT q AS qq FROM e WHERE vec_id = {RRF_QUERY_VEC}),
cosr AS (
  SELECT e.vec_id, {_cosine_sql("e.q", "qv.qq")} AS cosine
  FROM e, qv WHERE e.vec_id <> {RRF_QUERY_VEC}
),
sem AS (
  SELECT vec_id AS doc_id, r_sem FROM (
    SELECT vec_id, row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS r_sem
    FROM cosr) WHERE r_sem <= {RRF_SEM_K}
),
fused AS (
  SELECT COALESCE(s.doc_id, l.doc_id) AS doc_id, l.r_lex, s.r_sem,
         COALESCE(1.0 / ({RRF_K} + l.r_lex), 0.0)
           + COALESCE(1.0 / ({RRF_K} + s.r_sem), 0.0) AS rrf
  FROM sem s FULL OUTER JOIN lex l ON s.doc_id = l.doc_id
)
SELECT doc_id, r_lex, r_sem, rrf,
       CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS INT) AS rank
FROM fused QUALIFY rank <= {RRF_TOPK}
"""


HYBRID_SEARCH_RRF = _hybrid_rrf_sql(BM25_SEARCH)

# the CDC search stack's contract: both arms recomputed over survivors
# (docs: % BM25_DEL_MOD <> 0; vectors: % 9 <> 5 — the flat store's rule)
HYBRID_INDEX_DELETE_VIEW = _hybrid_rrf_sql(
    BM25_INDEX_DELETE_VIEW, "vec_id % 9 <> 5"
)

COMPONENTS_KNN = f"""
WITH RECURSIVE
{_KNN_GRAPH_CTES},
kedges AS (
  SELECT src_id AS src, nbr_id AS dst FROM ranked WHERE rank <= {KNN_GRAPH_K}
  UNION
  SELECT nbr_id, src_id FROM ranked WHERE rank <= {KNN_GRAPH_K}
),
reach(v, lab) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.src, r.lab FROM kedges e JOIN reach r ON r.v = e.dst
)
SELECT v AS vertex_id, CAST(min(lab) AS BIGINT) AS component_id FROM reach GROUP BY 1
"""

# batch components over SURVIVORS (vec_id % 9 == 5 deleted) — the full
# rebuild the CDC-maintained graph + CC composition must reproduce:
# graph construction, vertex universe, and transitive closure all scoped
# to the surviving corpus
COMPONENTS_KNN_SURVIVORS = COMPONENTS_KNN.replace(
    "AS q FROM embeddings)", "AS q FROM embeddings WHERE vec_id % 9 <> 5)"
).replace(
    "SELECT vec_id, vec_id FROM embeddings",
    "SELECT vec_id, vec_id FROM embeddings WHERE vec_id % 9 <> 5",
)
EMBEDDING_NORM_AUDIT = f"""
WITH e AS (
  SELECT vec_id,
         list_sum(list_transform({_QVEC}, x -> x * x)) AS n2
  FROM embeddings
)
SELECT CAST(length(bin(n2)) - 1 AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(min(n2) AS BIGINT) AS min_n2,
       CAST(max(n2) AS BIGINT) AS max_n2
FROM e GROUP BY 1
"""

KNN_TRIANGLES = f"""
WITH {_KNN_GRAPH_CTES},
edges AS (SELECT src_id, nbr_id FROM ranked WHERE rank <= {KNN_GRAPH_K}),
und AS (
  SELECT DISTINCT least(src_id, nbr_id) AS a, greatest(src_id, nbr_id) AS b
  FROM edges WHERE src_id <> nbr_id
),
deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) GROUP BY v
),
tris AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1 JOIN und e2 ON e1.b = e2.a
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
per_vertex AS (
  SELECT v, CAST(count(*) AS BIGINT) AS triangles FROM (
    SELECT x AS v FROM tris UNION ALL SELECT y FROM tris UNION ALL SELECT z FROM tris)
  GROUP BY v
)
SELECT e.vec_id AS vertex_id,
       COALESCE(d.degree, 0) AS degree,
       COALESCE(t.triangles, 0) AS triangles,
       CASE WHEN d.degree >= 2
            THEN round(2 * COALESCE(t.triangles, 0) / (d.degree * (d.degree - 1)), 6)
            ELSE 0.0 END AS clustering
FROM (SELECT DISTINCT vec_id FROM embeddings) e
LEFT JOIN deg d ON d.v = e.vec_id
LEFT JOIN per_vertex t ON t.v = e.vec_id
"""


def _label_prop_ctes(iters: int) -> str:
    """Unrolled label-propagation chain mirroring
    operators/graph.label_propagation: lab{i} = clamp(seed) else majority
    vote (count desc, label asc) over lab{i-1} neighbors else carry."""
    parts = [
        f"edges AS (SELECT src_id, nbr_id FROM ranked WHERE rank <= {KNN_GRAPH_K})",
        """und AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src_id AS src, nbr_id AS dst FROM edges
    UNION ALL SELECT nbr_id, src_id FROM edges)
  WHERE src <> dst
)""",
        f"""base AS (
  SELECT vec_id AS vertex_id, CAST(label AS BIGINT) AS true_label,
         CASE WHEN vec_id % {LP_SEED_MOD} = 0 THEN 1 ELSE 0 END AS is_seed,
         CASE WHEN vec_id % {LP_SEED_MOD} = 0 THEN CAST(label AS BIGINT) END AS seed_label
  FROM embeddings
)""",
        "lab0 AS (SELECT vertex_id, seed_label AS label FROM base)",
    ]
    for it in range(1, iters + 1):
        parts.append(
            f"""lab{it} AS (
  SELECT b.vertex_id, COALESCE(b.seed_label, v.vote, l.label) AS label
  FROM base b
  JOIN lab{it - 1} l ON l.vertex_id = b.vertex_id
  LEFT JOIN (
    SELECT dst, label AS vote FROM (
      SELECT u.dst, l2.label, count(*) AS c,
             row_number() OVER (PARTITION BY u.dst
                                ORDER BY count(*) DESC, l2.label ASC) AS rn
      FROM und u JOIN lab{it - 1} l2
        ON l2.vertex_id = u.src AND l2.label IS NOT NULL
      GROUP BY u.dst, l2.label
    ) WHERE rn = 1
  ) v ON v.dst = b.vertex_id
)"""
        )
    return ",\n".join(parts)


LABEL_PROPAGATION_KNN = f"""
WITH {_KNN_GRAPH_CTES},
{_label_prop_ctes(LP_ITERS)}
SELECT b.vertex_id, b.true_label, CAST(b.is_seed AS INT) AS is_seed,
       l.label AS propagated,
       CASE WHEN l.label = b.true_label THEN 1 ELSE 0 END AS correct
FROM base b JOIN lab{LP_ITERS} l USING (vertex_id)
"""

# triangles / label-prop over SURVIVORS — same composition contract as
# COMPONENTS_KNN_SURVIVORS: graph construction AND vertex universe both
# scoped to the surviving corpus (the maintained-graph read's contract)
KNN_TRIANGLES_SURVIVORS = KNN_TRIANGLES.replace(
    "AS q FROM embeddings)", "AS q FROM embeddings WHERE vec_id % 9 <> 5)"
).replace(
    "SELECT DISTINCT vec_id FROM embeddings",
    "SELECT DISTINCT vec_id FROM embeddings WHERE vec_id % 9 <> 5",
)

LABEL_PROPAGATION_KNN_SURVIVORS = LABEL_PROPAGATION_KNN.replace(
    "AS q FROM embeddings)", "AS q FROM embeddings WHERE vec_id % 9 <> 5)"
).replace(
    "  FROM embeddings\n)",
    "  FROM embeddings WHERE vec_id % 9 <> 5\n)",
)


def _pagerank_knn_survivors() -> str:
    """PAGERANK_KNN scoped to survivors — deferred to a function because
    PAGERANK_KNN is defined later in the module; resolved at
    TRAINING_ORACLES build time."""
    return PAGERANK_KNN.replace(
        "AS q FROM embeddings)", "AS q FROM embeddings WHERE vec_id % 9 <> 5)"
    ).replace(
        "SELECT DISTINCT vec_id AS vertex_id FROM embeddings",
        "SELECT DISTINCT vec_id AS vertex_id FROM embeddings"
        " WHERE vec_id % 9 <> 5",
    )


def _perceptron_ctes(iters: int) -> str:
    """Unrolled batch-perceptron chain mirroring
    operators/classifier.perceptron_lang: w{i} is a single row of four
    BIGINT weights; each step LEFT-joins the weight row to the
    misclassified features (margin ≤ 0 under w{i-1}) so an iteration
    with zero misclassifications still yields one row (all-NULL sums →
    COALESCE 0). Integer-only arithmetic ⇒ hash-exact vs Spark."""
    margin = "f.y * (p.a*f.x0 + p.b*f.x1 + p.c*f.x2 + p.d*f.x3)"
    parts = [
        f"""feats AS (
  SELECT doc_id,
         CASE WHEN lang = '{PERC_POS_LANG}' THEN 1 ELSE -1 END AS y,
         CAST(1 AS BIGINT) AS x0,
         CAST(n_chars // 64 AS BIGINT) AS x1,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS x2,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS x3
  FROM documents
)""",
        "w0 AS (SELECT CAST(0 AS BIGINT) AS a, CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS c, CAST(0 AS BIGINT) AS d)",
    ]
    for it in range(1, iters + 1):
        parts.append(
            f"""w{it} AS (
  SELECT p.a + COALESCE(SUM(f.y * f.x0), 0) AS a,
         p.b + COALESCE(SUM(f.y * f.x1), 0) AS b,
         p.c + COALESCE(SUM(f.y * f.x2), 0) AS c,
         p.d + COALESCE(SUM(f.y * f.x3), 0) AS d
  FROM w{it - 1} p LEFT JOIN feats f ON {margin} <= 0
  GROUP BY p.a, p.b, p.c, p.d
)"""
        )
    return ",\n".join(parts)


PERCEPTRON_LANG = f"""
WITH {_perceptron_ctes(PERC_ITERS)}
SELECT f.doc_id, f.y AS label,
       CAST(p.a*f.x0 + p.b*f.x1 + p.c*f.x2 + p.d*f.x3 AS BIGINT) AS score_units,
       CASE WHEN p.a*f.x0 + p.b*f.x1 + p.c*f.x2 + p.d*f.x3 > 0 THEN 1 ELSE -1 END AS pred,
       CASE WHEN f.y * (p.a*f.x0 + p.b*f.x1 + p.c*f.x2 + p.d*f.x3) > 0 THEN 1 ELSE 0 END AS correct
FROM feats f, w{PERC_ITERS} p
"""


def _pagerank_ctes(iters: int, verts_from_edges: bool = False) -> str:
    """Unrolled PageRank iteration chain (the _kmeans_ctes pattern):
    pr{i} from pr{i-1} with integer floor-division contrib splitting and
    integer damping — bit-identical to operators/graph.pagerank because
    both sides compute only int64 sums/divisions from the same Python
    constants (PR_SCALE, PR_DAMP_PCT).

    `verts_from_edges=False` (batch pagerank_knn): the vertex universe is
    every embedding — isolated vectors appear with the bare teleport
    rank. `verts_from_edges=True` (the streaming MV's oracle): vertices
    are src ∪ nbr of the edges, matching run_pagerank_stream, whose
    only input IS the edge stream. The two differ exactly on isolated
    vertices (per-vertex constant teleport — no 1/N coupling), which
    the k-NN graphs here never produce, but the stream view's oracle
    must certify the stream's own contract, not an assumption about
    the corpus."""
    verts = (
        "verts AS (SELECT DISTINCT v AS vertex_id FROM"
        " (SELECT src_id AS v FROM edges UNION ALL SELECT nbr_id FROM edges))"
        if verts_from_edges
        else "verts AS (SELECT DISTINCT vec_id AS vertex_id FROM embeddings)"
    )
    parts = [
        f"edges AS (SELECT src_id, nbr_id FROM ranked WHERE rank <= {KNN_GRAPH_K})",
        verts,
        "deg AS (SELECT src_id, COUNT(*) AS deg FROM edges GROUP BY src_id)",
        f"pr0 AS (SELECT vertex_id, CAST({PR_SCALE} AS BIGINT) AS r FROM verts)",
    ]
    for it in range(1, iters + 1):
        parts.append(
            f"""pr{it} AS (
  SELECT v.vertex_id,
         CAST({PR_TELEPORT} + ({PR_DAMP_PCT} * COALESCE(s.s, 0)) // 100 AS BIGINT) AS r
  FROM verts v LEFT JOIN (
    SELECT e.nbr_id AS vertex_id, SUM(p.r // d.deg) AS s
    FROM pr{it - 1} p
    JOIN deg d ON d.src_id = p.vertex_id
    JOIN edges e ON e.src_id = p.vertex_id
    GROUP BY e.nbr_id) s ON s.vertex_id = v.vertex_id
)"""
        )
    return ",\n".join(parts)


PAGERANK_KNN = f"""
WITH {_KNN_GRAPH_CTES},
{_pagerank_ctes(PR_ITERS)}
SELECT v.vertex_id,
       CAST(COALESCE(d.deg, 0) AS BIGINT) AS out_deg,
       p.r AS rank_units,
       p.r / {PR_SCALE} AS rank
FROM pr{PR_ITERS} p
JOIN verts v USING (vertex_id)
LEFT JOIN deg d ON d.src_id = v.vertex_id
"""

# the streaming MV's oracle: identical iteration chain, but the vertex
# universe is src ∪ nbr of the edges — the stream's own contract (its
# only input is the edge stream); see _pagerank_ctes
PAGERANK_STREAM_VIEW = f"""
WITH {_KNN_GRAPH_CTES},
{_pagerank_ctes(PR_ITERS, verts_from_edges=True)}
SELECT v.vertex_id,
       CAST(COALESCE(d.deg, 0) AS BIGINT) AS out_deg,
       p.r AS rank_units,
       p.r / {PR_SCALE} AS rank
FROM pr{PR_ITERS} p
JOIN verts v USING (vertex_id)
LEFT JOIN deg d ON d.src_id = v.vertex_id
"""

def _kmeans_parts(cent_mod: int, iters: int) -> list[str]:
    """CTE list replicating operators/similarity._kmeans_state iteration
    by iteration: assign{i} from cents{i}; update re-quantizes centroid
    components as round(sum/count) — identical int/IEEE arithmetic to the
    Spark side, so assignments match bit-for-bit. parts[0] is the shared
    `e` CTE — callers composing with another chain that already defines
    `e` (the residual IVF-PQ oracle) splice parts[1:]."""
    parts = [
        f"e AS (SELECT vec_id, {_QVEC} AS q FROM embeddings)",
        f"cents0 AS (SELECT vec_id AS cent_id, q AS cq FROM e WHERE vec_id % {cent_mod} = 1)",
    ]
    for it in range(iters + 1):
        parts.append(
            f"""assign{it} AS (
  SELECT vec_id, cent_id AS cluster, cos AS cosine FROM (
    SELECT e.vec_id, c.cent_id, {_cosine_sql("e.q", "c.cq")} AS cos,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cosine_sql("e.q", "c.cq")} DESC, c.cent_id ASC) AS rn
    FROM e, cents{it} c) WHERE rn = 1)"""
        )
        if it < iters:
            parts.append(
                f"""upd{it} AS (
  SELECT a.cluster, gs.i AS pos, CAST(round(sum(e.q[gs.i]) / count(*)) AS BIGINT) AS cq_el
  FROM assign{it} a JOIN e ON a.vec_id = e.vec_id
       CROSS JOIN generate_series(1, {DIM}) AS gs(i)
  GROUP BY 1, 2)"""
            )
            parts.append(
                f"cents{it + 1} AS (SELECT cluster AS cent_id, list(cq_el ORDER BY pos) AS cq FROM upd{it} GROUP BY 1)"
            )
    return parts


def _kmeans_ctes(cent_mod: int, iters: int) -> str:
    return "WITH " + ",\n".join(_kmeans_parts(cent_mod, iters))


KMEANS_EMBEDDINGS = f"""
{_kmeans_ctes(KM_CENT_MOD, KM_ITERS)}
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, round(cosine, 6) AS cosine
FROM assign{KM_ITERS}
"""

# IVF probing over the TRAINED quantizer: the same kmeans CTE chain
# (training replicated bit-for-bit), then knn_ivf's probe/rerank shape
# with cents{KM_ITERS} as the centroid frame and assign{KM_ITERS} as the
# inverted index
KNN_IVF_TRAINED = f"""
{_kmeans_ctes(KM_CENT_MOD, KM_ITERS)},
probes AS (
  SELECT query_id, cent_id AS list_id FROM (
    SELECT qs.vec_id AS query_id, c.cent_id,
           row_number() OVER (PARTITION BY qs.vec_id
                              ORDER BY {_cosine_sql("qs.q", "c.cq")} DESC, c.cent_id ASC) AS rn
    FROM e qs, cents{KM_ITERS} c WHERE qs.vec_id % 100 = 0
  ) WHERE rn <= {IVF_NPROBE}
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, {_cosine_sql("qv.q", "nv.q")} AS cosine
  FROM probes p
  JOIN assign{KM_ITERS} a ON p.list_id = a.cluster
  JOIN e qv ON qv.vec_id = p.query_id
  JOIN e nv ON nv.vec_id = a.vec_id
  WHERE p.query_id <> a.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= {KNN_K}
"""

def _knn_pq_sql(
    train_src: str = "sub",
    extra: list[str] | None = None,
    encode_src: str = "sub",
    e_cte: str | None = None,
) -> str:
    """Product-quantization ADC oracle, generated from the SAME constants
    as operators/similarity.knn_pq: per-subspace codebooks (hash-bucket
    init + PQ_ITERS Lloyd refinements, the `_kmeans_ctes` unrolling
    pattern at subspace granularity), nearest-code encoding (L2 asc,
    code asc — only cn2 − 2·⟨sv,cv⟩ enters the ordering, as in Spark),
    then lookup-table scoring: adot = Σₘ dot(query_subₘ, cv[codeₘ]) and
    the reconstruction norm Σₘ cn2 — all int64 sums < 2⁵³, so both the
    HUGEINT→DOUBLE widening here and Spark's long→double division are
    exact and the hashes match."""
    from ..operators.similarity import PQ_CODE_MOD, PQ_ITERS, PQ_M, PQ_SUBDIM

    def sdot(a: str, b: str) -> str:
        return _IDOT.format(n=PQ_SUBDIM, a=a, b=b)

    parts = [
        e_cte or f"e AS (SELECT vec_id, {_QVEC} AS q FROM embeddings)",
        f"sub AS (SELECT vec_id, gm.m AS m,"
        f" list_slice(q, gm.m*{PQ_SUBDIM}+1, gm.m*{PQ_SUBDIM}+{PQ_SUBDIM}) AS sv"
        f" FROM e CROSS JOIN generate_series(0, {PQ_M - 1}) AS gm(m))",
        f"asg0 AS (SELECT vec_id, m, vec_id % {PQ_CODE_MOD} AS code, sv FROM {train_src})",
    ]
    parts[2:2] = extra or []
    for it in range(PQ_ITERS + 1):
        parts.append(
            f"""cbu{it} AS (
  SELECT m, code, gs.i AS pos, CAST(round(sum(sv[gs.i]) / count(*)) AS BIGINT) AS cv_el
  FROM asg{it} CROSS JOIN generate_series(1, {PQ_SUBDIM}) AS gs(i)
  GROUP BY 1, 2, 3)"""
        )
        parts.append(
            f"cb{it} AS (SELECT m, code, cv, {sdot('cv', 'cv')} AS cn2 FROM"
            f" (SELECT m, code, list(cv_el ORDER BY pos) AS cv FROM cbu{it} GROUP BY 1, 2))"
        )
        parts.append(
            f"""asg{it + 1} AS (
  SELECT vec_id, m, code, cn2, sv FROM (
    SELECT s.vec_id, s.m, c.code, c.cn2, s.sv,
           row_number() OVER (PARTITION BY s.vec_id, s.m
             ORDER BY c.cn2 - 2 * ({sdot('s.sv', 'c.cv')}) ASC, c.code ASC) AS rn
    FROM {encode_src if it == PQ_ITERS else train_src} s JOIN cb{it} c ON s.m = c.m) WHERE rn = 1)"""
        )
    # shared tail pieces (codes / LUT / norms / ADC ranking) — reused
    # verbatim by the IVF-PQ composite below
    parts.append(f"codes AS (SELECT vec_id, m, code, cn2 FROM asg{PQ_ITERS + 1})")
    parts.append(
        "qsub AS (SELECT vec_id AS query_id, m, sv FROM sub WHERE vec_id % 100 = 0)"
    )
    parts.append(
        f"""lut AS (
  SELECT q0.query_id, c.m, c.code, {sdot("q0.sv", "c.cv")} AS dot
  FROM qsub q0 JOIN cb{PQ_ITERS} c ON q0.m = c.m)"""
    )
    parts.append(
        f"qn AS (SELECT vec_id AS query_id, {_IDOT.format(n=DIM, a='q', b='q')} AS qn2"
        f" FROM e WHERE vec_id % 100 = 0)"
    )
    return ",\n".join(parts)


_PQ_RANK_TAIL = f"""
ranked AS (
  SELECT query_id, neighbor_id, cosine_pq,
         CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cosine_pq DESC, neighbor_id ASC) AS INT) AS rank
  FROM (SELECT s.query_id, s.neighbor_id,
               s.adot / (sqrt(qn.qn2::DOUBLE) * sqrt(s.rn2::DOUBLE)) AS cosine_pq
        FROM scored s JOIN qn ON s.query_id = qn.query_id))
SELECT query_id, neighbor_id, round(cosine_pq, 6) AS cosine_pq, rank
FROM ranked WHERE rank <= {KNN_K}
"""

KNN_PQ = f"""
WITH {_knn_pq_sql()},
scored AS (
  SELECT l.query_id, k.vec_id AS neighbor_id, sum(l.dot) AS adot, sum(k.cn2) AS rn2
  FROM codes k JOIN lut l ON k.m = l.m AND k.code = l.code
  WHERE l.query_id <> k.vec_id
  GROUP BY 1, 2),
{_PQ_RANK_TAIL}
"""

# Rotated PQ: the identical PQ pipeline over the integer Walsh-Hadamard
# rotation r[i] = Σⱼ (−1)^popcount(i∧j)·q[j] — replayed here as the same
# ±1 matvec (hm is the 64×64 sign matrix, built from bit_count).
_ROTATED_E = f"""eraw AS (SELECT vec_id, {_QVEC} AS q FROM embeddings),
hm AS (
  SELECT gi.i AS i, gj.j AS j,
         CASE WHEN bit_count(CAST(gi.i & gj.j AS BIGINT)) % 2 = 0 THEN 1 ELSE -1 END AS s
  FROM generate_series(0, {DIM - 1}) AS gi(i)
  CROSS JOIN generate_series(0, {DIM - 1}) AS gj(j)),
e AS (
  SELECT vec_id, list(rv ORDER BY i) AS q FROM (
    SELECT u.vec_id, h.i AS i, CAST(sum(h.s * u.qv) AS BIGINT) AS rv
    FROM (SELECT vec_id, gj.j AS j, q[gj.j + 1] AS qv
          FROM eraw CROSS JOIN generate_series(0, {DIM - 1}) AS gj(j)) u
    JOIN hm h ON h.j = u.j GROUP BY 1, 2)
  GROUP BY vec_id)"""

KNN_PQ_ROTATED = f"""
WITH {_knn_pq_sql(e_cte=_ROTATED_E)},
scored AS (
  SELECT l.query_id, k.vec_id AS neighbor_id, sum(l.dot) AS adot, sum(k.cn2) AS rn2
  FROM codes k JOIN lut l ON k.m = l.m AND k.code = l.code
  WHERE l.query_id <> k.vec_id
  GROUP BY 1, 2),
{_PQ_RANK_TAIL}
"""

# IVF-PQ: knn_ivf's seed-vector coarse lists select candidates, the PQ
# tail above scores them by ADC — the same composition as the Spark side
# (operators/similarity.knn_ivfpq), cell for cell.
KNN_IVFPQ = f"""
WITH {_knn_pq_sql()},
cents AS (SELECT vec_id AS cent_id, q AS cq FROM e WHERE vec_id % {IVF_CENT_MOD} = 1),
lists AS (
  SELECT vec_id, cent_id AS list_id FROM (
    SELECT e2.vec_id, c.cent_id,
           row_number() OVER (PARTITION BY e2.vec_id
             ORDER BY {_cosine_sql("e2.q", "c.cq")} DESC, c.cent_id ASC) AS rn
    FROM e e2, cents c) WHERE rn = 1),
probes AS (
  SELECT query_id, cent_id AS list_id FROM (
    SELECT q0.vec_id AS query_id, c.cent_id,
           row_number() OVER (PARTITION BY q0.vec_id
             ORDER BY {_cosine_sql("q0.q", "c.cq")} DESC, c.cent_id ASC) AS rn
    FROM e q0, cents c WHERE q0.vec_id % 100 = 0) WHERE rn <= {IVF_NPROBE}),
cand AS (
  SELECT p.query_id, l.vec_id FROM probes p JOIN lists l ON p.list_id = l.list_id
  WHERE p.query_id <> l.vec_id),
scored AS (
  SELECT c.query_id, c.vec_id AS neighbor_id, sum(l.dot) AS adot, sum(k.cn2) AS rn2
  FROM cand c
  JOIN codes k ON k.vec_id = c.vec_id
  JOIN lut l ON l.query_id = c.query_id AND l.m = k.m AND l.code = k.code
  GROUP BY 1, 2),
{_PQ_RANK_TAIL}
"""


# filtered IVF-PQ: the label predicate applied to candidates inside the
# probed lists BEFORE ADC scoring (FAISS IVFPQ + IDSelector), probes
# widened to FILTERED_NPROBE — knn_ivfpq's oracle with the label riding
# the lists and the query rows
KNN_IVFPQ_FILTERED = f"""
WITH {_knn_pq_sql()},
lab AS (SELECT vec_id, label FROM embeddings),
cents AS (SELECT vec_id AS cent_id, q AS cq FROM e WHERE vec_id % {IVF_CENT_MOD} = 1),
lists AS (
  SELECT vec_id, cent_id AS list_id FROM (
    SELECT e2.vec_id, c.cent_id,
           row_number() OVER (PARTITION BY e2.vec_id
             ORDER BY {_cosine_sql("e2.q", "c.cq")} DESC, c.cent_id ASC) AS rn
    FROM e e2, cents c) WHERE rn = 1),
probes AS (
  SELECT query_id, cent_id AS list_id FROM (
    SELECT q0.vec_id AS query_id, c.cent_id,
           row_number() OVER (PARTITION BY q0.vec_id
             ORDER BY {_cosine_sql("q0.q", "c.cq")} DESC, c.cent_id ASC) AS rn
    FROM e q0, cents c WHERE q0.vec_id % 100 = 0) WHERE rn <= {FILTERED_NPROBE}),
cand AS (
  SELECT p.query_id, l.vec_id
  FROM probes p
  JOIN lists l ON p.list_id = l.list_id
  JOIN lab nl ON nl.vec_id = l.vec_id
  JOIN lab ql ON ql.vec_id = p.query_id AND ql.label = nl.label
  WHERE p.query_id <> l.vec_id),
scored AS (
  SELECT c.query_id, c.vec_id AS neighbor_id, sum(l.dot) AS adot, sum(k.cn2) AS rn2
  FROM cand c
  JOIN codes k ON k.vec_id = c.vec_id
  JOIN lut l ON l.query_id = c.query_id AND l.m = k.m AND l.code = k.code
  GROUP BY 1, 2),
{_PQ_RANK_TAIL}
"""


def _knn_ivfpq_residual_sql(tail: str = _PQ_RANK_TAIL) -> str:
    """Residual IVF-PQ oracle (operators/similarity.knn_ivfpq_residual,
    cell for cell): k-means-trained coarse lists (the `_kmeans_parts`
    chain at IVF nlists), then the PQ codebooks train AND encode on
    residuals r = x − c(list); the reconstruction norm is the exact
    per-(list, m, code) int ‖cₘ + cvₘ‖² and the ADC score adds the probe
    row's dot(q, c) to the residual-LUT sum. `tail` swaps the final
    ranking stage — the refine oracle replaces the ADC top-k with an
    ADC top-C shortlist + exact re-rank."""
    from ..operators.similarity import KM_ITERS, PQ_ITERS, PQ_M, PQ_SUBDIM

    def sdot_plus(a: str, b: str) -> str:
        # Σᵢ (a[i]+b[i])² over one subspace
        return (
            f"list_sum(list_transform(generate_series(1, {PQ_SUBDIM}),"
            f" i -> ({a}[i] + {b}[i]) * ({a}[i] + {b}[i])))"
        )

    ki = KM_ITERS
    extra = [
        *_kmeans_parts(IVF_CENT_MOD, ki)[1:],  # [0] is `e`, already defined
        f"cents AS (SELECT cent_id, cq FROM cents{ki})",
        f"lists AS (SELECT vec_id, cluster AS list_id FROM assign{ki})",
        f"""resid AS (
  SELECT e3.vec_id, l.list_id,
         list_transform(generate_series(1, {DIM}), i -> e3.q[i] - c.cq[i]) AS q
  FROM e e3 JOIN lists l ON e3.vec_id = l.vec_id JOIN cents c ON l.list_id = c.cent_id)""",
        f"rsub AS (SELECT vec_id, gm.m AS m,"
        f" list_slice(q, gm.m*{PQ_SUBDIM}+1, gm.m*{PQ_SUBDIM}+{PQ_SUBDIM}) AS sv"
        f" FROM resid CROSS JOIN generate_series(0, {PQ_M - 1}) AS gm(m))",
    ]
    return f"""
WITH {_knn_pq_sql("rsub", extra, encode_src="rsub")},
csub AS (
  SELECT cent_id AS list_id, gm.m AS m,
         list_slice(cq, gm.m*{PQ_SUBDIM}+1, gm.m*{PQ_SUBDIM}+{PQ_SUBDIM}) AS csv
  FROM cents CROSS JOIN generate_series(0, {PQ_M - 1}) AS gm(m)),
cbx AS (
  SELECT s.list_id, c.m, c.code, {sdot_plus("s.csv", "c.cv")} AS xn2
  FROM cb{PQ_ITERS} c JOIN csub s ON c.m = s.m),
probes AS (
  SELECT query_id, list_id, qcdot FROM (
    SELECT q0.vec_id AS query_id, c.cent_id AS list_id,
           {_IDOT.format(n=DIM, a="q0.q", b="c.cq")} AS qcdot,
           row_number() OVER (PARTITION BY q0.vec_id
             ORDER BY {_cosine_sql("q0.q", "c.cq")} DESC, c.cent_id ASC) AS rn
    FROM e q0, cents c WHERE q0.vec_id % 100 = 0) WHERE rn <= {IVF_NPROBE}),
scored AS (
  SELECT p.query_id, k.vec_id AS neighbor_id,
         min(p.qcdot) + sum(l.dot) AS adot, sum(x.xn2) AS rn2
  FROM probes p
  JOIN lists li ON li.list_id = p.list_id AND li.vec_id <> p.query_id
  JOIN codes k ON k.vec_id = li.vec_id
  JOIN lut l ON l.query_id = p.query_id AND l.m = k.m AND l.code = k.code
  JOIN cbx x ON x.list_id = p.list_id AND x.m = k.m AND x.code = k.code
  GROUP BY 1, 2),
{tail}
"""


KNN_IVFPQ_RESIDUAL = _knn_ivfpq_residual_sql()


def _refine_tail() -> str:
    """Refine tail (operators/similarity.knn_ivfpq_refine): ADC ranks a
    top-REFINE_C shortlist, then the shortlist re-scores with the EXACT
    int64 cosine of the stored full vectors (knn_brute's arithmetic) and
    re-ranks to top-k."""
    from ..operators.similarity import REFINE_C

    return f"""
shortlist AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                  ORDER BY cosine_pq DESC, neighbor_id ASC) AS rn
    FROM (SELECT s.query_id, s.neighbor_id,
                 s.adot / (sqrt(qn.qn2::DOUBLE) * sqrt(s.rn2::DOUBLE)) AS cosine_pq
          FROM scored s JOIN qn ON s.query_id = qn.query_id))
  WHERE rn <= {REFINE_C}),
exact AS (
  SELECT sl.query_id, sl.neighbor_id, {_cosine_sql("qv.q", "nv.q")} AS cosine
  FROM shortlist sl
  JOIN e qv ON qv.vec_id = sl.query_id
  JOIN e nv ON nv.vec_id = sl.neighbor_id),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM exact)
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= {KNN_K}
"""


KNN_IVFPQ_REFINE = _knn_ivfpq_residual_sql(tail=_refine_tail())


def _knn_pq_index_sql(tail: str = _PQ_RANK_TAIL) -> str:
    """Stream-maintained-PQ-index oracle: identical to KNN_PQ except the
    codebooks train ONLY on the first arrival chunk (the smallest
    floor(n / PQ_INDEX_CHUNKS) vec_ids — stage_embedding_chunks splits
    in vec_id order), mirroring run_pq_index_stream's train-on-first-
    batch-then-freeze contract; encoding still covers the full corpus
    (every batch appends its codes against the frozen codebook)."""
    from ..operators.similarity import PQ_INDEX_CHUNKS

    extra = [
        f"trained AS (SELECT vec_id FROM e QUALIFY"
        f" row_number() OVER (ORDER BY vec_id) <= count(*) OVER () // {PQ_INDEX_CHUNKS})",
        "sub_t AS (SELECT s.vec_id, s.m, s.sv FROM sub s JOIN trained t ON s.vec_id = t.vec_id)",
    ]
    return f"""
WITH {_knn_pq_sql("sub_t", extra)},
scored AS (
  SELECT l.query_id, k.vec_id AS neighbor_id, sum(l.dot) AS adot, sum(k.cn2) AS rn2
  FROM codes k JOIN lut l ON k.m = l.m AND k.code = l.code
  WHERE l.query_id <> k.vec_id
  GROUP BY 1, 2),
{tail}
"""


KNN_PQ_INDEX = _knn_pq_index_sql()


def _knn_pq_index_cdc_sql(filtered: bool = False) -> str:
    """CDC twin of the maintained-PQ-index oracle: the feed is
    stage_embedding_cdc_chunks (4 modulo chunks, V_DEL for vec_id % 9 ==
    5 routed +1 chunk), so the codebook trains on chunk 0 = vec_id % 4
    == 0 — ALL of it, including later-deleted keys: no chunk-0 key's
    tombstone routes to chunk 0 ((k%4+1)%4 = 1 for them), and the frozen
    contract means deletes never retrain anyway. Scoring then excludes
    dead vectors on BOTH sides (neither neighbor nor query) — read-
    equivalent to the stream's cleanse-at-insert + anti-join-at-read,
    at every arrival order. `filtered=True` adds the label conjunct on
    the scored pairs (candidate label == query label), mirroring
    `pq_index_filtered_search`'s in-scan predicate on the stored label
    payload."""
    extra = [
        "trained AS (SELECT vec_id FROM e WHERE vec_id % 4 = 0)",
        "sub_t AS (SELECT s.vec_id, s.m, s.sv FROM sub s JOIN trained t ON s.vec_id = t.vec_id)",
    ]
    lab_cte = ",\nlab AS (SELECT vec_id, label FROM embeddings)" if filtered else ""
    lab_join = (
        """
  JOIN lab nl ON nl.vec_id = k.vec_id
  JOIN lab ql ON ql.vec_id = l.query_id AND ql.label = nl.label"""
        if filtered
        else ""
    )
    return f"""
WITH {_knn_pq_sql("sub_t", extra)}{lab_cte},
scored AS (
  SELECT l.query_id, k.vec_id AS neighbor_id, sum(l.dot) AS adot, sum(k.cn2) AS rn2
  FROM codes k JOIN lut l ON k.m = l.m AND k.code = l.code{lab_join}
  WHERE l.query_id <> k.vec_id
    AND k.vec_id % 9 <> 5 AND l.query_id % 9 <> 5
  GROUP BY 1, 2),
{_PQ_RANK_TAIL}
"""


KNN_PQ_INDEX_CDC = _knn_pq_index_cdc_sql()
KNN_PQ_INDEX_CDC_FILTERED = _knn_pq_index_cdc_sql(filtered=True)

# knn_brute_filtered over SURVIVORS — the exact pre-filter baseline on
# the eligible set the CDC-maintained index is allowed to serve from
KNN_BRUTE_FILTERED_SURVIVORS = KNN_BRUTE_FILTERED.replace(
    "AS q FROM embeddings)", "AS q FROM embeddings WHERE vec_id % 9 <> 5)"
)

PQ_INDEX_FILTERED_EVAL = f"""
WITH ex AS ({KNN_BRUTE_FILTERED_SURVIVORS})
SELECT 'pq_index_filtered' AS method,
       (SELECT count(*) FROM ex) AS n_exact,
       (SELECT count(*) FROM ({KNN_PQ_INDEX_CDC_FILTERED}) m) AS n_method,
       (SELECT count(*) FROM ({KNN_PQ_INDEX_CDC_FILTERED}) m
        JOIN ex ON m.query_id = ex.query_id AND m.neighbor_id = ex.neighbor_id) AS n_common,
       round((SELECT count(*) FROM ({KNN_PQ_INDEX_CDC_FILTERED}) m
              JOIN ex ON m.query_id = ex.query_id AND m.neighbor_id = ex.neighbor_id)
             / (SELECT count(*) FROM ex)::DOUBLE, 6) AS recall
"""

def _hybrid_pq_rrf_sql(lex_sql: str, cdc: bool = False) -> str:
    """Hybrid-RRF oracle with the SEMANTIC arm recomputed through the
    PQ index's ADC arithmetic (`_knn_pq_sql`'s frozen-codebook CTEs —
    integer LUT sums, exact HUGEINT→DOUBLE widening), mirroring
    `hybrid_pq_index_search`: candidate ranks come from cosine_pq over
    the stored codes, NOT exact cosines, so every rank shift the lossy
    codes introduce is part of the certified result. `cdc=True` trains
    on the CDC feed's chunk 0 (vec_id % 4 = 0 — `_knn_pq_index_cdc_sql`
    's argument) and restricts scored candidates to survivors
    (vec_id % 9 <> 5), read-equivalent to the stream's
    cleanse-at-insert + anti-join-at-read; the lexical arm's survivor
    story rides in through `lex_sql`."""
    from ..operators.similarity import PQ_INDEX_CHUNKS

    if cdc:
        extra = [
            "trained AS (SELECT vec_id FROM e WHERE vec_id % 4 = 0)",
            "sub_t AS (SELECT s.vec_id, s.m, s.sv FROM sub s"
            " JOIN trained t ON s.vec_id = t.vec_id)",
        ]
        surv = f"\n    AND k.vec_id % 9 <> 5"
    else:
        extra = [
            f"trained AS (SELECT vec_id FROM e QUALIFY"
            f" row_number() OVER (ORDER BY vec_id) <= count(*) OVER ()"
            f" // {PQ_INDEX_CHUNKS})",
            "sub_t AS (SELECT s.vec_id, s.m, s.sv FROM sub s"
            " JOIN trained t ON s.vec_id = t.vec_id)",
        ]
        surv = ""
    return f"""
WITH lex AS (SELECT doc_id, rank AS r_lex FROM ({lex_sql}) bq),
{_knn_pq_sql("sub_t", extra)},
padc AS (
  SELECT k.vec_id, sum(l.dot) AS adot, sum(k.cn2) AS rn2
  FROM codes k JOIN lut l ON k.m = l.m AND k.code = l.code
  WHERE l.query_id = {RRF_QUERY_VEC} AND k.vec_id <> {RRF_QUERY_VEC}{surv}
  GROUP BY 1),
cosr AS (
  SELECT p.vec_id,
         p.adot / (sqrt(qn.qn2::DOUBLE) * sqrt(p.rn2::DOUBLE)) AS cosine_pq
  FROM padc p JOIN qn ON qn.query_id = {RRF_QUERY_VEC}),
sem AS (
  SELECT vec_id AS doc_id, r_sem FROM (
    SELECT vec_id, row_number() OVER (ORDER BY cosine_pq DESC, vec_id ASC) AS r_sem
    FROM cosr) WHERE r_sem <= {RRF_SEM_K}
),
fused AS (
  SELECT COALESCE(s.doc_id, l.doc_id) AS doc_id, l.r_lex, s.r_sem,
         COALESCE(1.0 / ({RRF_K} + l.r_lex), 0.0)
           + COALESCE(1.0 / ({RRF_K} + s.r_sem), 0.0) AS rrf
  FROM sem s FULL OUTER JOIN lex l ON s.doc_id = l.doc_id
)
SELECT doc_id, r_lex, r_sem, rrf,
       CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS INT) AS rank
FROM fused QUALIFY rank <= {RRF_TOPK}
"""


HYBRID_PQ_INDEX_VIEW = _hybrid_pq_rrf_sql(BM25_SEARCH)
HYBRID_PQ_INDEX_DELETE_VIEW = _hybrid_pq_rrf_sql(BM25_INDEX_DELETE_VIEW, cdc=True)


SQ8_INDEX_FILTERED_EVAL = f"""
WITH ex AS ({KNN_BRUTE_FILTERED_SURVIVORS})
SELECT 'sq8_index_filtered' AS method,
       (SELECT count(*) FROM ex) AS n_exact,
       (SELECT count(*) FROM ({KNN_SQ8_INDEX_CDC_FILTERED}) m) AS n_method,
       (SELECT count(*) FROM ({KNN_SQ8_INDEX_CDC_FILTERED}) m
        JOIN ex ON m.query_id = ex.query_id AND m.neighbor_id = ex.neighbor_id) AS n_common,
       round((SELECT count(*) FROM ({KNN_SQ8_INDEX_CDC_FILTERED}) m
              JOIN ex ON m.query_id = ex.query_id AND m.neighbor_id = ex.neighbor_id)
             / (SELECT count(*) FROM ex)::DOUBLE, 6) AS recall
"""

# IndexRefineFlat over the maintained index: the same first-chunk-trained
# codebook + full-corpus codes, ADC top-REFINE_C shortlist, exact re-rank
# (the refine tail reuses e/qn from the shared PQ CTE block)
KNN_PQ_INDEX_REFINE = _knn_pq_index_sql(tail=_refine_tail())

SEMDEDUP = f"""
{_kmeans_ctes(KM_CENT_MOD, KM_ITERS)},
m AS (SELECT a.vec_id, a.cluster, e.q FROM assign{KM_ITERS} a JOIN e ON a.vec_id = e.vec_id),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM m a JOIN m b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE {_cosine_sql("a.q", "b.q")} >= {SEMDEDUP_THRESHOLD}
)
SELECT m.vec_id, CAST(m.cluster AS BIGINT) AS cluster,
       (d.vec_id IS NOT NULL) AS is_dup
FROM m LEFT JOIN dropped d ON m.vec_id = d.vec_id
"""

SEQUENCE_PACK = f"""
WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
  FROM d
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(start_off AS BIGINT) AS start_off,
       CAST(floor(start_off / {SEQ_LEN}) AS BIGINT) AS first_seq,
       CAST(floor((start_off + n_tokens - 1) / {SEQ_LEN}) AS BIGINT) AS last_seq
FROM c
"""

DOC_REPETITION = """
WITH toksr AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
shr AS (
  SELECT doc_id, shingle FROM (
    SELECT doc_id, unnest(CASE WHEN len(t) >= 3 THEN
      list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
    ELSE [] END) AS shingle
    FROM toksr
  ) WHERE shingle <> ''
),
per AS (
  SELECT doc_id, count(*) AS n_shingles, count(DISTINCT shingle) AS n_uniq_shingles
  FROM shr GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(per.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(coalesce(per.n_uniq_shingles, 0) AS BIGINT) AS n_uniq_shingles,
       round(CASE WHEN coalesce(per.n_shingles, 0) > 0
             THEN 1.0 - per.n_uniq_shingles / per.n_shingles ELSE 0.0 END, 6) AS rep_ratio
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
"""

DEDUP_CONTAINMENT = f"""
WITH {_SHINGLES_CTE},
shh AS (SELECT doc_id, {H60.format(c="shingle")} AS sh60 FROM sh),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shh GROUP BY 1),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM shh a JOIN shh b ON a.sh60 = b.sh60 AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.id_a, c.id_b,
       c.n_common / least(sa.n_sh, sb.n_sh) AS containment
FROM common c
JOIN sizes sa ON c.id_a = sa.doc_id
JOIN sizes sb ON c.id_b = sb.doc_id
WHERE c.n_common / least(sa.n_sh, sb.n_sh) >= 0.9
"""

CORPUS_PROFILE = """
WITH t AS (
  SELECT doc_id, source, lang,
         length(text) AS n_chars_actual,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_uniq_tokens
  FROM documents
), q AS (
  SELECT source, lang, n_tokens, n_chars_actual,
         CAST(5000 * least(100, n_tokens)
              + (500000 * n_uniq_tokens) // n_tokens AS BIGINT) AS q_scaled
  FROM t
)
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars_actual) AS BIGINT) AS total_chars,
       CAST(sum(q_scaled) AS BIGINT) / (count(*) * 1e6) AS avg_quality
FROM q GROUP BY 1, 2
"""

_BUCKET = "(('0x' || substr(md5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000)"

CORPUS_SAMPLE = f"""
SELECT doc_id, lang FROM documents
WHERE {_BUCKET.format(seed="s0")} < CASE WHEN lang = 'en' THEN 300 ELSE 100 END
"""

CORPUS_SPLIT = f"""
SELECT doc_id,
       CASE WHEN {_BUCKET.format(seed="split0")} < 50 THEN 'val'
            WHEN {_BUCKET.format(seed="split0")} < 100 THEN 'test'
            ELSE 'train' END AS split
FROM documents
"""

# operators/dedup.py decontaminate: bench/train split is the same
# (seed, doc_id) hash bucket; contamination = shingle appears in any
# bench doc's (df-capped) shingle set. count(CASE ...) is BIGINT in both
# engines; hit_frac is one IEEE division of exact ints.
DECONTAMINATE = f"""
WITH {_SHINGLES_CTE},
bench AS (
  SELECT doc_id FROM documents
  WHERE {_BUCKET.format(seed="bench0")} < {BENCH_PER_MILLE}
),
bsh AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id IN (SELECT doc_id FROM bench)
),
scored AS (
  SELECT doc_id,
         count(*) AS n_shingles,
         count(CASE WHEN shingle IN (SELECT shingle FROM bsh) THEN 1 END) AS n_hits
  FROM sh WHERE doc_id NOT IN (SELECT doc_id FROM bench)
  GROUP BY doc_id
)
SELECT doc_id, n_shingles, n_hits,
       n_hits / n_shingles AS hit_frac,
       n_hits > 0 AS contaminated
FROM scored
"""

# operators/dedup.py shingle_novelty: UNcapped shingle set (sh0), df=1 test
SHINGLE_NOVELTY = f"""
WITH {_SHINGLES_CTE},
dfreq AS (SELECT shingle, count(*) AS df FROM sh0 GROUP BY 1),
scored AS (
  SELECT doc_id,
         count(*) AS n_shingles,
         count(CASE WHEN df = 1 THEN 1 END) AS n_unique
  FROM sh0 JOIN dfreq USING (shingle)
  GROUP BY doc_id
)
SELECT doc_id, n_shingles, n_unique,
       n_unique / n_shingles AS novelty
FROM scored
"""

# tf/df per-doc term ranking; score is one IEEE division of exact ints
TOP_TERMS = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY 1, 2
), d AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), s AS (
  SELECT tf.doc_id, tf.term, tf.tf, d.df, CAST(tf.tf AS DOUBLE) / d.df AS score
  FROM tf JOIN d USING (term)
)
SELECT doc_id, term, tf, df,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rank,
       score
FROM s
QUALIFY rank <= 5
"""

# exact-size per-lang sample ranked by the deterministic 60-bit hash
CORPUS_SAMPLE_STRATIFIED = f"""
WITH h AS (
  SELECT doc_id, lang,
         {H60.format(c="'strat0:' || CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
)
SELECT doc_id, lang,
       CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS BIGINT)
         AS rank_in_stratum
FROM h
QUALIFY rank_in_stratum <= 100
"""


EMBEDDING_CENTROIDS = f"""
SELECT label,
       CAST(pos AS BIGINT) AS pos,
       CAST(sum(qx) AS BIGINT) AS sum_q,
       count(*) AS n_vecs,
       CAST(sum(qx) AS DOUBLE) / (count(*) * {Q_SCALE}) AS centroid
FROM (
  SELECT label,
         generate_subscripts(embedding, 1) AS pos,
         unnest({_QVEC}) AS qx
  FROM embeddings
)
GROUP BY 1, 2
"""

BIGRAM_STATS = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bg AS (
  SELECT doc_id, bigram FROM (
    SELECT doc_id, unnest(CASE WHEN len(t) >= 2 THEN
      list_transform(generate_series(1, len(t)-1), i -> t[i] || ' ' || t[i+1])
    ELSE [] END) AS bigram
    FROM toks
  ) WHERE bigram <> ''
)
SELECT bigram, count(*) AS n, count(DISTINCT doc_id) AS df
FROM bg GROUP BY 1
ORDER BY n DESC, bigram ASC
LIMIT 20
"""

from ..operators.textops import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    MIXTURE_HI_BUDGET,
    MIXTURE_HI_SOURCES,
    MIXTURE_LO_BUDGET,
)

DOC_CHUNKS = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id, toks,
         unnest(generate_series(1, greatest(1, len(toks)), {CHUNK_STRIDE})) AS start_tok
  FROM t
)
SELECT doc_id,
       CAST((start_tok - 1) // {CHUNK_STRIDE} AS INT) AS chunk_id,
       CAST(start_tok AS INT) AS start_tok,
       CAST(len(list_slice(toks, start_tok, start_tok + {CHUNK_TOKENS} - 1)) AS INT)
         AS n_chunk_tokens,
       array_to_string(list_slice(toks, start_tok, start_tok + {CHUNK_TOKENS} - 1), ' ')
         AS chunk_text
FROM s
"""

_MIX_HK = H60.format(c="'mix0:' || CAST(doc_id AS VARCHAR)")
_MIX_HI = ", ".join(f"'{s}'" for s in MIXTURE_HI_SOURCES)

CORPUS_MIXTURE = f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(list_sum(list_transform(string_split(text, ' '),
              tk -> (length(tk) + 3) // 4)) AS BIGINT) AS n_bpe_est,
         {_MIX_HK} AS hk
  FROM documents
),
o AS (
  SELECT *, coalesce(sum(n_bpe_est) OVER (PARTITION BY source ORDER BY hk, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior_bpe
  FROM t
)
SELECT doc_id, source, n_bpe_est
FROM o
WHERE prior_bpe < CASE WHEN source IN ({_MIX_HI})
                       THEN {MIXTURE_HI_BUDGET} ELSE {MIXTURE_LO_BUDGET} END
"""

from ..operators.textops import MT_BUDGET_PCT

MIXTURE_TEMPERATURE = f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(list_sum(list_transform(string_split(text, ' '),
              tk -> (length(tk) + 3) // 4)) AS BIGINT) AS n_bpe_est
  FROM documents
),
s AS (SELECT source, sum(n_bpe_est) AS n_s FROM d GROUP BY 1),
-- z folds sqrt(n_s) LEFT-TO-RIGHT in source order (list_reduce over an
-- ordered list) — mirroring the Spark side's sorted-fold aggregate, so
-- the one order-sensitive double reduction is order-pinned in both engines
st AS (
  SELECT sum(n_s) AS n_tot,
         list_reduce(list(sqrt(n_s::DOUBLE) ORDER BY source), (a, b) -> a + b) AS z
  FROM s
),
r AS (
  SELECT source,
         least(1.0, (st.n_tot::DOUBLE * {MT_BUDGET_PCT} / 100.0)
               * (sqrt(n_s::DOUBLE) / st.z) / n_s::DOUBLE) AS rate
  FROM s, st
)
SELECT d.doc_id, d.source, d.n_bpe_est, round(r.rate, 6) AS rate
FROM d JOIN r ON d.source = r.source
WHERE ({H60.format(c="'mt0:' || CAST(doc_id AS VARCHAR)")} + 1)::DOUBLE / {(1 << 60) + 1} < r.rate
"""

from ..operators.textops import PII_EMAIL_RE, PII_PHONE_RE, PII_TOKEN

PII_SCRUB = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{PII_PHONE_RE}')) AS INT) AS n_phones,
       md5(regexp_replace(
             regexp_replace(text, '{PII_EMAIL_RE}', '{PII_TOKEN}', 'g'),
             '{PII_PHONE_RE}', '{PII_TOKEN}', 'g')) AS clean_fp
FROM documents
"""

from ..operators.similarity import HN_K, HN_QUERY_MOD
from ..operators.textops import (
    DSIR_BUCKETS,
    DSIR_TARGET_LANG,
    QG_MAX_MEAN_WLEN,
    QG_MAX_TOP_UNIGRAM,
    QG_MAX_WORDS,
    QG_MIN_MEAN_WLEN,
    QG_MIN_STOPWORDS,
    QG_MIN_WORDS,
    QG_STOPWORDS,
)

_QG_STOPS = ", ".join(f"'{s}'" for s in QG_STOPWORDS)

# the oracle's top-unigram count is the O(uniq·n) count-per-distinct form —
# same VALUE as the Spark side's sorted-run aggregate, chosen there for
# row-local O(n log n) on long documents
QUALITY_GOPHER = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
s AS (
  SELECT doc_id,
         CAST(len(l) AS INT) AS n_words,
         round(CAST(list_sum(list_transform(l, w -> length(w))) AS DOUBLE) / len(l), 6) AS mean_word_len,
         CAST(len(list_filter(l, w -> w IN ({_QG_STOPS}))) AS INT) AS stop_count,
         round(CAST(list_max(list_transform(list_distinct(l), w -> len(list_filter(l, x -> x = w)))) AS DOUBLE) / len(l), 6) AS top_unigram_ratio
  FROM t
)
SELECT doc_id, n_words, mean_word_len, stop_count, top_unigram_ratio,
       CAST(n_words >= {QG_MIN_WORDS} AND n_words <= {QG_MAX_WORDS} AS INT) AS flag_word_count,
       CAST(mean_word_len >= {QG_MIN_MEAN_WLEN} AND mean_word_len <= {QG_MAX_MEAN_WLEN} AS INT) AS flag_mean_word_len,
       CAST(stop_count >= {QG_MIN_STOPWORDS} AS INT) AS flag_stopwords,
       CAST(top_unigram_ratio <= {QG_MAX_TOP_UNIGRAM} AS INT) AS flag_repetition,
       CAST(n_words >= {QG_MIN_WORDS} AND n_words <= {QG_MAX_WORDS}
            AND mean_word_len >= {QG_MIN_MEAN_WLEN} AND mean_word_len <= {QG_MAX_MEAN_WLEN}
            AND stop_count >= {QG_MIN_STOPWORDS}
            AND top_unigram_ratio <= {QG_MAX_TOP_UNIGRAM} AS INT) AS keep
FROM s
"""

IMPORTANCE_WEIGHTS = f"""
WITH tokb AS (
  SELECT doc_id, lang = '{DSIR_TARGET_LANG}' AS tgt,
         {H60.format(c="tok")} % {DSIR_BUCKETS} AS bucket,
         count(*) AS cnt
  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY 1, 2, 3
),
stats AS (
  SELECT bucket, sum(cnt) AS raw_c, sum(CASE WHEN tgt THEN cnt ELSE 0 END) AS tgt_c
  FROM tokb GROUP BY bucket
),
tot AS (SELECT sum(raw_c) AS r_tot, sum(tgt_c) AS t_tot FROM stats),
lr AS (
  SELECT bucket,
         ln((tgt_c + 1)::DOUBLE / (t_tot + {DSIR_BUCKETS})::DOUBLE)
       - ln((raw_c + 1)::DOUBLE / (r_tot + {DSIR_BUCKETS})::DOUBLE) AS lr
  FROM stats, tot
)
SELECT doc_id,
       CAST(sum(cnt) AS INT) AS n_tokens,
       round(sum(lr * cnt) / sum(cnt), 6) AS weight
FROM tokb JOIN lr USING (bucket)
GROUP BY doc_id
"""

HARD_NEGATIVES = f"""
WITH e AS (SELECT vec_id, label, {_QVEC} AS q FROM embeddings),
qs AS (SELECT vec_id AS query_id, label AS query_label, q AS qq
       FROM e WHERE vec_id % {HN_QUERY_MOD} = 0),
scored AS (
  SELECT query_id, query_label, c.vec_id AS neighbor_id, c.label AS neighbor_label,
         {_cosine_sql("qq", "c.q")} AS cosine
  FROM qs, e c
  WHERE query_label <> c.label
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, query_label, neighbor_id, neighbor_label, round(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= {HN_K}
"""

from ..operators.similarity import INT8_MAX
from ..operators.textops import PPL_TERCILES, TFIDF_K

PERPLEXITY_BUCKETS = f"""
WITH tokb AS (
  SELECT doc_id, {H60.format(c="tok")} % {DSIR_BUCKETS} AS bucket, count(*) AS cnt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY 1, 2
),
lm AS (SELECT bucket, sum(cnt) AS c FROM tokb GROUP BY bucket),
tot AS (SELECT sum(c) AS n_tot FROM lm),
logp AS (
  SELECT bucket, log2((c + 1)::DOUBLE / (n_tot + {DSIR_BUCKETS})::DOUBLE) AS lp
  FROM lm, tot
),
scored AS (
  SELECT doc_id,
         CAST(sum(cnt) AS INT) AS n_tokens,
         round(-sum(lp * cnt) / sum(cnt), 6) AS cross_entropy
  FROM tokb JOIN logp USING (bucket)
  GROUP BY doc_id
)
SELECT doc_id, n_tokens, cross_entropy,
       (['head', 'middle', 'tail'])[ntile({PPL_TERCILES}) OVER (ORDER BY cross_entropy, doc_id)] AS ppl_bucket
FROM scored
"""

TFIDF_TERMS = f"""
WITH tf AS (
  SELECT doc_id, tok AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY 1, 2
),
nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT doc_id, term, CAST(tf AS INT) AS tf, CAST(df AS INT) AS df,
         round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
  FROM tf JOIN dfq USING (term), nd
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS INT) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df, tfidf, rank FROM ranked WHERE rank <= {TFIDF_K}
"""

from ..operators.textops import WS_PER_SOURCE

WEIGHTED_SAMPLE = f"""
WITH t AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
         round(ln(({H60.format(c="'ws0:' || CAST(doc_id AS VARCHAR)")} + 1)::DOUBLE
                  / {(1 << 60) + 1}) / n_chars, 6) AS es_key
  FROM documents
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY source ORDER BY es_key DESC, doc_id ASC) AS INT) AS rank
  FROM t
)
SELECT doc_id, source, n_chars, es_key, rank FROM ranked WHERE rank <= {WS_PER_SOURCE}
"""

# ex/ls are the two certified pair queries verbatim — recall is the only
# degree of freedom (LSH pairs are exact-verified, precision ≡ 1)
DEDUP_EVAL = """
WITH j AS (
  SELECT ex.id_a IS NOT NULL AS in_exact, ls.id_a IS NOT NULL AS in_lsh
  FROM ({ex}) ex
  FULL OUTER JOIN ({ls}) ls ON ex.id_a = ls.id_a AND ex.id_b = ls.id_b
)
SELECT CAST(sum(CASE WHEN in_exact THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       CAST(sum(CASE WHEN in_lsh THEN 1 ELSE 0 END) AS BIGINT) AS n_lsh,
       CAST(sum(CASE WHEN in_exact AND in_lsh THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
       round(CASE WHEN sum(CASE WHEN in_lsh THEN 1 ELSE 0 END) > 0
                  THEN sum(CASE WHEN in_exact AND in_lsh THEN 1 ELSE 0 END)
                       / sum(CASE WHEN in_lsh THEN 1 ELSE 0 END)
                  ELSE 1.0 END, 6) AS precision,
       round(CASE WHEN sum(CASE WHEN in_exact THEN 1 ELSE 0 END) > 0
                  THEN sum(CASE WHEN in_exact AND in_lsh THEN 1 ELSE 0 END)
                       / sum(CASE WHEN in_exact THEN 1 ELSE 0 END)
                  ELSE 1.0 END, 6) AS recall
FROM j
"""

# uncapped shingles (df_cap=None on the Spark side): source count bounds
# the self-join fan-out, so no hot-shingle drop is needed or applied
CONTAMINATION_MATRIX = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh0 AS (
  SELECT doc_id, shingle FROM (
    SELECT doc_id, unnest(CASE WHEN len(t) >= 3 THEN list_distinct(
      list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
    ) ELSE [] END) AS shingle
    FROM toks
  ) WHERE shingle <> ''
),
srcsh AS (
  SELECT DISTINCT d.source, {H60.format(c="shingle")} AS sh60
  FROM sh0 JOIN documents d USING (doc_id)
),
sizes AS (SELECT source, count(*) AS n_sh FROM srcsh GROUP BY 1),
common AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_common
  FROM srcsh a JOIN srcsh b ON a.sh60 = b.sh60 AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, n_common,
       round(n_common / least(sa.n_sh, sb.n_sh), 6) AS overlap
FROM common
JOIN sizes sa ON sa.source = source_a
JOIN sizes sb ON sb.source = source_b
"""

EMBEDDING_QUANTIZE = f"""
WITH t AS (
  SELECT vec_id, embedding AS v,
         list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / {INT8_MAX} AS scale
  FROM embeddings
),
e AS (
  SELECT vec_id, scale,
         list_transform(v, x -> CASE WHEN scale = 0 THEN 0.0 ELSE
           abs(x::DOUBLE - least({INT8_MAX}.0, greatest(-{INT8_MAX}.0, round(x::DOUBLE / scale))) * scale)
         END) AS err,
         len(v) AS d
  FROM t
)
SELECT vec_id,
       round(scale, 6) AS scale,
       round(list_max(err), 6) AS max_abs_err,
       round(list_sum(list_transform(err, x -> x * x)) / d, 6) AS mse
FROM e
"""

from ..operators.frequency import CMS_DEPTH, CMS_TOP_K, CMS_WIDTH

_CMS_CELLS = " UNION ALL ".join(
    "SELECT {d} AS d, ({h}) % {w} AS c, term FROM tok".format(
        d=d, w=CMS_WIDTH, h=H60.format(c="'cms{}:' || term".format(d))
    )
    for d in range(CMS_DEPTH)
)

TERM_COUNTS_CMS = f"""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
cells AS ({_CMS_CELLS}),
cms AS (SELECT d, c, count(*) AS cnt FROM cells GROUP BY d, c),
exact AS (SELECT term, count(*) AS exact_n FROM tok GROUP BY term),
top AS (SELECT term, exact_n FROM exact ORDER BY exact_n DESC, term ASC LIMIT {CMS_TOP_K}),
probes AS (
  SELECT t.term, t.exact_n, p.d,
         ({H60.format(c="'cms' || CAST(p.d AS VARCHAR) || ':' || t.term")}) % {CMS_WIDTH} AS c
  FROM top t, generate_series(0, {CMS_DEPTH - 1}) AS p(d)
)
SELECT term, exact_n, min(cnt) AS cms_est, min(cnt) - exact_n AS overcount
FROM probes JOIN cms USING (d, c)
GROUP BY term, exact_n
"""

# composes the certified LSH pair query with the corpus_split hash CASE
SPLIT_LEAKAGE_AUDIT = """
WITH pairs AS ({lsh}),
splits AS ({split})
SELECT least(sa.split, sb.split) AS split_a,
       greatest(sa.split, sb.split) AS split_b,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(least(sa.split, sb.split) <> greatest(sa.split, sb.split) AS INT) AS leaks
FROM pairs p
JOIN splits sa ON p.id_a = sa.doc_id
JOIN splits sb ON p.id_b = sb.doc_id
GROUP BY 1, 2
"""



# Consolidated ANN audit: each method's certified oracle embedded as a
# derived table against the brute pair set (the DEDUP_EVAL pattern) —
# recall per method, hash-certified.
# the join-IVM stream view's oracle IS the batch join — certifying that
# incremental delta-rule maintenance converged to the full recompute
ORDER_WIDE_VIEW = """
SELECT o.o_orderkey, l.l_linenumber, o.o_custkey, o.o_orderstatus, l.l_quantity,
       round(l.l_extendedprice * (1 - l.l_discount), 6) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
"""

# deletes twin: every % 7 == 0 order is tombstoned during the replay
# (delete_mod=7 in the registry entry), so the converged view is the
# batch join over never-deleted orders
ORDER_WIDE_DELETE_VIEW = """
SELECT o.o_orderkey, l.l_linenumber, o.o_custkey, o.o_orderstatus, l.l_quantity,
       round(l.l_extendedprice * (1 - l.l_discount), 6) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey % 7 <> 0
"""

# both-granularity deletes twin: every % 7 == 0 order is O_DEL'd and
# every (l_orderkey + l_linenumber) % 5 == 0 line key L_DEL'd during the
# replay, so the converged view is the batch join minus both delete sets
# (an L_DEL tombstones every row carrying its key — the synthetic
# lineitem has duplicate keys, and the % filter drops exactly those rows)
ORDER_WIDE_LINE_DELETE_VIEW = """
SELECT o.o_orderkey, l.l_linenumber, o.o_custkey, o.o_orderstatus, l.l_quantity,
       round(l.l_extendedprice * (1 - l.l_discount), 6) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey % 7 <> 0 AND (l.l_orderkey + l.l_linenumber) % 5 <> 0
"""

# non-invertible aggregate twin: batch MAX over never-deleted rows — max
# of identical rounded doubles is order-independent, so the stream's
# rebase-partial merge must land on the same value bit-for-bit
REVENUE_MAX_BY_CUST_VIEW = """
SELECT o.o_custkey,
       max(round(l.l_extendedprice * (1 - l.l_discount), 6)) AS max_revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey % 7 <> 0 AND (l.l_orderkey + l.l_linenumber) % 5 <> 0
GROUP BY o.o_custkey
"""

ORDER_CUST_WIDE_VIEW = """
SELECT o.o_orderkey, l.l_linenumber, o.o_custkey, c.c_nationkey,
       round(l.l_extendedprice * (1 - l.l_discount), 6) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey % 7 <> 0
"""

REVENUE_BY_NATION_IVM_VIEW = """
SELECT c.c_nationkey,
       count(*) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 6)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey % 7 <> 0
GROUP BY c.c_nationkey
"""

REVENUE_BY_REGION_IVM_VIEW = """
SELECT n.n_regionkey,
       count(*) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 6)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderkey % 7 <> 0
GROUP BY n.n_regionkey
"""

# ternary full-CDC-mix twins: updates route +2 chunks after the insert,
# so only chunk-0 keys' updates win under arrival-epoch last-write-wins;
# the winning attribute change MOVES the order to a different existing
# customer (o_custkey % max(c_custkey) + 1) — cross-customer, and
# usually cross-nation, revenue movement. Deletes stay terminal.
_ORDERS3_UPSERT_EFF = """
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 11 = 0 AND o_orderkey % 3 = 0
              THEN o_custkey % (SELECT max(c_custkey) FROM customer) + 1
              ELSE o_custkey END AS o_custkey
  FROM orders
"""

ORDER_CUST_WIDE_UPSERT_VIEW = f"""
WITH eff AS ({_ORDERS3_UPSERT_EFF})
SELECT o.o_orderkey, l.l_linenumber, o.o_custkey, c.c_nationkey,
       round(l.l_extendedprice * (1 - l.l_discount), 6) AS revenue
FROM eff o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey % 7 <> 0
"""

REVENUE_BY_NATION_IVM_UPSERT_VIEW = f"""
WITH eff AS ({_ORDERS3_UPSERT_EFF})
SELECT c.c_nationkey,
       count(*) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 6)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM eff o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey % 7 <> 0
GROUP BY c.c_nationkey
"""

# full mix WITH dimension updates: effective orders (cross-customer
# O_UPD) ⋈ effective customers (C_UPD: nationkey+1 mod 25, winning only
# for chunk-0 customers under the same +2-chunk routing)
_CUST3_UPDATE_EFF = """
  SELECT c_custkey,
         CASE WHEN c_custkey % 13 = 0 AND c_custkey % 3 = 0
              THEN (c_nationkey + 1) % 25 ELSE c_nationkey END AS c_nationkey
  FROM customer
"""

ORDER_CUST_WIDE_DIMUPD_VIEW = f"""
WITH eff_o AS ({_ORDERS3_UPSERT_EFF}),
eff_c AS ({_CUST3_UPDATE_EFF})
SELECT o.o_orderkey, l.l_linenumber, o.o_custkey, c.c_nationkey,
       round(l.l_extendedprice * (1 - l.l_discount), 6) AS revenue
FROM eff_o o
JOIN eff_c c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey % 7 <> 0
"""

REVENUE_BY_NATION_DIMUPD_VIEW = f"""
WITH eff_o AS ({_ORDERS3_UPSERT_EFF}),
eff_c AS ({_CUST3_UPDATE_EFF})
SELECT c.c_nationkey,
       count(*) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 6)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM eff_o o
JOIN eff_c c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey % 7 <> 0
GROUP BY c.c_nationkey
"""

# ternary time-travel twin: AS OF epoch 1 of the 3-chunk inserts-only
# replay. Each three-way tuple is emitted in the epoch its LATEST side
# arrived (customers chunk c_custkey % 3, orders o_orderkey % 3, lines
# (l_orderkey + l_linenumber) % 3), so the snapshot is the closed-form
# greatest-of-three filter — one hash certifies snapshot filtering AND
# the 3-D later-side-emit placement of every tuple.
ORDER_CUST_WIDE_ASOF_VIEW = """
SELECT o.o_orderkey, l.l_linenumber, o.o_custkey, c.c_nationkey,
       round(l.l_extendedprice * (1 - l.l_discount), 6) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE greatest(c.c_custkey % 3, o.o_orderkey % 3,
               (l.l_orderkey + l.l_linenumber) % 3) <= 1
"""

DISTINCT_QTY_BY_CUST_VIEW = """
SELECT o.o_custkey, CAST(count(DISTINCT l.l_quantity) AS BIGINT) AS n_qty
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey % 7 <> 0 AND (l.l_orderkey + l.l_linenumber) % 5 <> 0
GROUP BY o.o_custkey
"""

# full-CDC-mix twins: updates route +2 chunks after the insert, so under
# arrival-epoch last-write-wins only keys inserted in chunk 0
# (o_orderkey % 3 = 0) see their O_UPD win (status 'U', custkey + 1000);
# chunk-1/2 keys get the update BEFORE the insert and the later insert
# supersedes it — attributes stay original. Deletes are terminal at both
# granularities regardless of upserts.
_ORDERS_UPSERT_EFF = """
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 11 = 0 AND o_orderkey % 3 = 0
              THEN o_custkey + 1000 ELSE o_custkey END AS o_custkey,
         CASE WHEN o_orderkey % 11 = 0 AND o_orderkey % 3 = 0
              THEN 'U' ELSE o_orderstatus END AS o_orderstatus
  FROM orders
"""

ORDER_WIDE_UPSERT_VIEW = f"""
WITH eff AS ({_ORDERS_UPSERT_EFF})
SELECT o.o_orderkey, l.l_linenumber, o.o_custkey, o.o_orderstatus, l.l_quantity,
       round(l.l_extendedprice * (1 - l.l_discount), 6) AS revenue
FROM eff o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey % 7 <> 0 AND (l.l_orderkey + l.l_linenumber) % 5 <> 0
"""

REVENUE_BY_CUST_UPSERT_VIEW = f"""
WITH eff AS ({_ORDERS_UPSERT_EFF})
SELECT o.o_custkey,
       count(*) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 6)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM eff o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey % 7 <> 0 AND (l.l_orderkey + l.l_linenumber) % 5 <> 0
GROUP BY o.o_custkey
"""

# time-travel twin: the view AS OF epoch 1 of the 3-chunk inserts-only
# replay. A pair is emitted in the epoch its LATER side arrives (orders
# land in chunk o_orderkey % 3, lines in (l_orderkey + l_linenumber) % 3),
# so the epoch-1 snapshot is exactly the pairs whose later side arrived
# by chunk 1 — the oracle certifies snapshot filtering AND per-pair emit
# placement in one hash
ORDER_WIDE_ASOF_VIEW = """
SELECT o.o_orderkey, l.l_linenumber, o.o_custkey, o.o_orderstatus, l.l_quantity,
       round(l.l_extendedprice * (1 - l.l_discount), 6) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE greatest(o.o_orderkey % 3, (l.l_orderkey + l.l_linenumber) % 3) <= 1
"""

# retractable-aggregate twin: batch rollup over never-deleted orders;
# DECIMAL(18,6) sum (exact, associative) emitted as double — the money
# discipline on both engines
REVENUE_BY_CUST_VIEW = """
SELECT o.o_custkey,
       count(*) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 6)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey % 7 <> 0
GROUP BY o.o_custkey
"""


def _ann_eval_sql() -> str:
    methods = {
        "ivf": KNN_IVF,
        "ivf_trained": KNN_IVF_TRAINED,
        "ivfpq": KNN_IVFPQ,
        "ivfpq_refine": KNN_IVFPQ_REFINE,
        "ivfpq_residual": KNN_IVFPQ_RESIDUAL,
        "ivfsq8": KNN_IVFSQ8,
        "lsh": KNN_LSH,
        "lsh_multiprobe": KNN_LSH_MULTIPROBE,
        "pq": KNN_PQ,
        "pq_rotated": KNN_PQ_ROTATED,
        "rp": KNN_RP,
        "sq8": KNN_SQ8,
    }
    arms = []
    for name in sorted(methods):
        arms.append(f"""
SELECT '{name}' AS method,
       (SELECT count(*) FROM ex) AS n_exact,
       (SELECT count(*) FROM ({methods[name]}) m) AS n_method,
       (SELECT count(*) FROM ({methods[name]}) m
        JOIN ex ON m.query_id = ex.query_id AND m.neighbor_id = ex.neighbor_id) AS n_common,
       round((SELECT count(*) FROM ({methods[name]}) m
              JOIN ex ON m.query_id = ex.query_id AND m.neighbor_id = ex.neighbor_id)
             / (SELECT count(*) FROM ex)::DOUBLE, 6) AS recall"""
        )
    u = "\nUNION ALL\n".join(arms)
    return f"WITH ex AS ({KNN_BRUTE})\n{u}"


ANN_EVAL = _ann_eval_sql()


def _filtered_eval_sql() -> str:
    """Filtered-search family audit, hash-gated: recall of each in-scan
    filtered method against the exact pre-filter baseline
    (KNN_BRUTE_FILTERED) — the compression-resolution ladder (exact-IVF
    1.0, SQ8 ≈ 1.0, PQ codes lower) as a driver-certified query instead
    of a pytest constant."""
    methods = {
        "ivf_filtered": KNN_IVF_FILTERED,
        "ivfpq_filtered": KNN_IVFPQ_FILTERED,
        "ivfsq8_filtered": KNN_IVFSQ8_FILTERED,
    }
    arms = []
    for name in sorted(methods):
        arms.append(f"""
SELECT '{name}' AS method,
       (SELECT count(*) FROM ex) AS n_exact,
       (SELECT count(*) FROM ({methods[name]}) m) AS n_method,
       (SELECT count(*) FROM ({methods[name]}) m
        JOIN ex ON m.query_id = ex.query_id AND m.neighbor_id = ex.neighbor_id) AS n_common,
       round((SELECT count(*) FROM ({methods[name]}) m
              JOIN ex ON m.query_id = ex.query_id AND m.neighbor_id = ex.neighbor_id)
             / (SELECT count(*) FROM ex)::DOUBLE, 6) AS recall"""
        )
    u = "\nUNION ALL\n".join(arms)
    return f"WITH ex AS ({KNN_BRUTE_FILTERED})\n{u}"


FILTERED_EVAL = _filtered_eval_sql()


# WordPiece greedy longest-match encoder over the CLOSED-FORM frequency
# vocabulary (operators/wordpiece.py wordpiece_freq_vocab: positional
# pieces ≤ 3 chars with cnt·20 ≥ total word occurrences — integer
# threshold, so both engines keep identical vocabularies). The greedy
# walk is a single deterministic path per distinct word, so a recursive
# CTE replays it without aggregation over the recursive relation: each
# state (word, pos) advances by the LONGEST matching piece (word-initial
# bare, continuation '##'-marked) found by a LEFT JOIN LATERAL max over
# the vocab — NULL means no prefix matches and the whole word becomes
# one [UNK] token, exactly the encoder's semantics. LEFT JOIN keeps
# documents with no words (0-token rows).
WORDPIECE_ENCODE_FREQ = """
WITH RECURSIVE
doc_words AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE length(w) > 0
),
wf AS (SELECT w, count(*) AS freq FROM doc_words GROUP BY w),
tot AS (SELECT sum(freq) AS t FROM wf),
pieces AS (
  SELECT unnest(flatten(list_transform(generate_series(1, length(w)),
           i -> list_transform(generate_series(1, least(3, length(w) - i + 1)),
                n -> CASE WHEN i = 1 THEN substr(w, i, n)
                          ELSE '##' || substr(w, i, n) END)))) AS piece,
         freq
  FROM wf
),
vocab AS (
  SELECT piece FROM (SELECT piece, sum(freq) AS cnt FROM pieces GROUP BY piece), tot
  WHERE cnt * 20 >= t
),
st AS (
  SELECT w, CAST(1 AS BIGINT) AS pos, 0 AS toks, false AS unk
  FROM (SELECT DISTINCT w FROM wf)
  UNION ALL
  SELECT w,
         CASE WHEN m.l IS NULL THEN length(w) + 1 ELSE pos + m.l END,
         CASE WHEN m.l IS NULL THEN 1 ELSE toks + 1 END,
         m.l IS NULL
  FROM st LEFT JOIN LATERAL (
    SELECT max(CASE WHEN st.pos = 1 THEN length(v.piece) ELSE length(v.piece) - 2 END) AS l
    FROM vocab v
    WHERE (st.pos = 1 AND v.piece NOT LIKE '##%'
           AND v.piece = substr(st.w, st.pos, length(v.piece)))
       OR (st.pos > 1 AND v.piece LIKE '##%'
           AND substr(v.piece, 3) = substr(st.w, st.pos, length(v.piece) - 2))
  ) m ON true
  WHERE st.pos <= length(st.w) AND NOT st.unk
),
final AS (SELECT w, toks, unk FROM st WHERE pos = length(w) + 1)
SELECT d.doc_id,
       CAST(coalesce(r.n_words, 0) AS INT) AS n_words,
       CAST(coalesce(r.n_wp_tokens, 0) AS BIGINT) AS n_wp_tokens,
       CAST(coalesce(r.n_unk_words, 0) AS INT) AS n_unk_words,
       CASE WHEN coalesce(r.n_wp_tokens, 0) > 0
            THEN round(r.chars / r.n_wp_tokens, 6) ELSE 0.0 END AS chars_per_token
FROM documents d
LEFT JOIN (
  SELECT doc_id, count(*) AS n_words, sum(toks) AS n_wp_tokens,
         sum(CASE WHEN unk THEN 1 ELSE 0 END) AS n_unk_words,
         CAST(sum(length(w)) AS DOUBLE) AS chars
  FROM doc_words JOIN final USING (w)
  GROUP BY doc_id
) r USING (doc_id)
"""


# TRAINED-vocab WordPiece encoder gate — the vocab-as-input design: the
# Spark query (always run first by the gate) writes its trained vocab to
# ORACLE_SIDECAR_DIR/wp_<ndocs>_<nchars>.parquet; this oracle reads it
# back with a glob filtered by the _SIDECAR_MATCH corpus fingerprint
# (derived from the oracle's own views, so concurrent verifies at
# different SFs read their own files) and replays the identical greedy
# longest-match walk — the _freq twin's recursive CTE with the vocab CTE
# swapped for the sidecar.
WORDPIECE_ENCODE = """
WITH RECURSIVE
doc_words AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE length(w) > 0
),
wf AS (SELECT w, count(*) AS freq FROM doc_words GROUP BY w),
vocab AS (
  SELECT piece
  FROM read_parquet('__SIDECAR_DIR__/wp_*.parquet')
  WHERE __SIDECAR_MATCH__
),
st AS (
  SELECT w, CAST(1 AS BIGINT) AS pos, 0 AS toks, false AS unk
  FROM (SELECT DISTINCT w FROM wf)
  UNION ALL
  SELECT w,
         CASE WHEN m.l IS NULL THEN length(w) + 1 ELSE pos + m.l END,
         CASE WHEN m.l IS NULL THEN 1 ELSE toks + 1 END,
         m.l IS NULL
  FROM st LEFT JOIN LATERAL (
    SELECT max(CASE WHEN st.pos = 1 THEN length(v.piece) ELSE length(v.piece) - 2 END) AS l
    FROM vocab v
    WHERE (st.pos = 1 AND v.piece NOT LIKE '##%'
           AND v.piece = substr(st.w, st.pos, length(v.piece)))
       OR (st.pos > 1 AND v.piece LIKE '##%'
           AND substr(v.piece, 3) = substr(st.w, st.pos, length(v.piece) - 2))
  ) m ON true
  WHERE st.pos <= length(st.w) AND NOT st.unk
),
final AS (SELECT w, toks, unk FROM st WHERE pos = length(w) + 1)
SELECT d.doc_id,
       CAST(coalesce(r.n_words, 0) AS INT) AS n_words,
       CAST(coalesce(r.n_wp_tokens, 0) AS BIGINT) AS n_wp_tokens,
       CAST(coalesce(r.n_unk_words, 0) AS INT) AS n_unk_words,
       CASE WHEN coalesce(r.n_wp_tokens, 0) > 0
            THEN round(r.chars / r.n_wp_tokens, 6) ELSE 0.0 END AS chars_per_token
FROM documents d
LEFT JOIN (
  SELECT doc_id, count(*) AS n_words, sum(toks) AS n_wp_tokens,
         sum(CASE WHEN unk THEN 1 ELSE 0 END) AS n_unk_words,
         CAST(sum(length(w)) AS DOUBLE) AS chars
  FROM doc_words JOIN final USING (w)
  GROUP BY doc_id
) r USING (doc_id)
"""

WORDPIECE_ENCODE = WORDPIECE_ENCODE.replace(
    "__SIDECAR_DIR__", ORACLE_SIDECAR_DIR
).replace("__SIDECAR_MATCH__", _SIDECAR_MATCH)


def _unigram_encode_sql(max_w: int = 16, max_len: int = 4) -> str:
    """TRAINED-vocab unigram-LM Viterbi gate — the float DP of
    operators/unigram.viterbi_segment unrolled per position (the _freq
    twin's chained-CTE mechanism with a DOUBLE score instead of the int
    comb): candidates per position carry struct(s, −i, np) so the max
    reproduces the Python scan's exact-float-equality smallest-split
    tie-break, with the piece count riding as payload. Scores replay
    the same arithmetic per candidate — one int→double division (or the
    1/tot epsilon for zero-count survivors), one ln(), one add — so the
    result is bit-identical on a shared host libm; the hash gate is the
    detector if that assumption ever breaks. Vocab comes back from the
    sidecar parquet (see WORDPIECE_ENCODE)."""
    steps = []
    for p in range(1, max_w + 1):
        steps.append(
            f"d{p} AS MATERIALIZED (\n"
            f"  SELECT * FROM d{p - 1}\n"
            f"  UNION ALL\n"
            f"  SELECT w, {p} AS pos, struct_extract(m, 's') AS s,\n"
            f"         struct_extract(m, 'np') AS np\n"
            f"  FROM (\n"
            f"    SELECT w, max({{'s': prev.s + ln(sc.p), 'negi': -prev.pos,"
            f" 'np': prev.np + 1}}) AS m\n"
            f"    FROM d{p - 1} prev JOIN sc\n"
            f"      ON sc.piece = substr(prev.w, prev.pos + 1, {p} - prev.pos)\n"
            f"    WHERE prev.pos BETWEEN {p} - {max_len} AND {p} - 1"
            f" AND length(prev.w) >= {p}\n"
            f"    GROUP BY w\n"
            f"  )\n"
            f")"
        )
    chain = ",\n".join(steps)
    return f"""
WITH
doc_words AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE length(w) > 0
),
wf AS (SELECT w, count(*) AS freq FROM doc_words GROUP BY w),
raw AS (
  SELECT piece, count_q
  FROM read_parquet('{ORACLE_SIDECAR_DIR}/uni_*.parquet')
  WHERE {_SIDECAR_MATCH}
),
tot AS (SELECT sum(count_q) AS t FROM raw),
sc AS (
  SELECT piece,
         CASE WHEN count_q > 0 THEN count_q / CAST(t AS DOUBLE)
              ELSE 1.0 / greatest(t, 1) END AS p
  FROM raw, tot
),
d0 AS MATERIALIZED (
  SELECT w, 0 AS pos, CAST(0.0 AS DOUBLE) AS s, 0 AS np
  FROM (SELECT DISTINCT w FROM wf)),
{chain},
fin AS (
  SELECT dw.w,
         CASE WHEN t.np IS NULL THEN length(dw.w) ELSE t.np END AS n_pieces
  FROM (SELECT DISTINCT w FROM wf) dw
  LEFT JOIN (SELECT w, np FROM d{max_w} WHERE pos = length(w)) t USING (w)
)
SELECT d.doc_id,
       CAST(coalesce(r.n_words, 0) AS INT) AS n_words,
       CAST(coalesce(r.n_pieces, 0) AS BIGINT) AS n_pieces,
       CASE WHEN coalesce(r.n_pieces, 0) > 0
            THEN round(r.chars / r.n_pieces, 6) ELSE 0.0 END AS chars_per_piece
FROM documents d
LEFT JOIN (
  SELECT doc_id, count(*) AS n_words, sum(n_pieces) AS n_pieces,
         CAST(sum(length(w)) AS DOUBLE) AS chars
  FROM doc_words JOIN fin USING (w)
  GROUP BY doc_id
) r USING (doc_id)
"""


UNIGRAM_ENCODE = _unigram_encode_sql()


def _unigram_encode_freq_sql(max_w: int = 16) -> str:
    """Unrolled integer-Viterbi DP (operators/unigram.py
    viterbi_segment_int): per distinct word, best[pos] under the
    (Σ piece score, then fewer pieces) objective, encoded as one BIGINT
    comb = score·64 + (63 − pieces) so the per-position max IS the
    lexicographic max. One chained CTE per position (aggregates are
    illegal in a recursive term, so the DP unrolls — `max_w` positions,
    headroom over the corpus's max word length; extra steps match
    nothing and cost nothing). Words with no full path (a sub-threshold
    character) fall back to per-char count length(w), the twin's
    documented fallback."""
    # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    # step references its predecessor twice (carry + extend) — inlined,
    # the chain expands 2^max_w ways and exhausts file handles re-scanning
    # the base table
    steps = []
    for p in range(1, max_w + 1):
        steps.append(
            f"d{p} AS MATERIALIZED (\n"
            f"  SELECT * FROM d{p - 1}\n"
            f"  UNION ALL\n"
            f"  SELECT w, {p} AS pos, max(comb + s.cnt * 64 - 1) AS comb\n"
            f"  FROM d{p - 1} prev JOIN sc s\n"
            f"    ON s.piece = substr(prev.w, prev.pos + 1, {p} - prev.pos)\n"
            f"  WHERE prev.pos BETWEEN {p} - 3 AND {p} - 1 AND length(prev.w) >= {p}\n"
            f"  GROUP BY w\n"
            f")"
        )
    chain = ",\n".join(steps)
    return f"""
WITH
doc_words AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE length(w) > 0
),
wf AS (SELECT w, count(*) AS freq FROM doc_words GROUP BY w),
tot AS (SELECT sum(freq) AS t FROM wf),
pieces AS (
  SELECT unnest(flatten(list_transform(generate_series(1, length(w)),
           i -> list_transform(generate_series(1, least(3, length(w) - i + 1)),
                n -> substr(w, i, n))))) AS piece,
         freq
  FROM wf
),
sc AS (
  SELECT piece, cnt FROM (SELECT piece, sum(freq) AS cnt FROM pieces GROUP BY piece), tot
  WHERE cnt * 20 >= t
),
d0 AS MATERIALIZED (SELECT w, 0 AS pos, CAST(63 AS BIGINT) AS comb FROM (SELECT DISTINCT w FROM wf)),
{chain},
fin AS (
  SELECT dw.w,
         CASE WHEN t.comb IS NULL THEN length(dw.w)
              ELSE 63 - (t.comb % 64) END AS n_pieces
  FROM (SELECT DISTINCT w FROM wf) dw
  LEFT JOIN (SELECT w, comb FROM d{max_w} WHERE pos = length(w)) t USING (w)
)
SELECT d.doc_id,
       CAST(coalesce(r.n_words, 0) AS INT) AS n_words,
       CAST(coalesce(r.n_pieces, 0) AS BIGINT) AS n_pieces,
       CASE WHEN coalesce(r.n_pieces, 0) > 0
            THEN round(r.chars / r.n_pieces, 6) ELSE 0.0 END AS chars_per_piece
FROM documents d
LEFT JOIN (
  SELECT doc_id, count(*) AS n_words, sum(n_pieces) AS n_pieces,
         CAST(sum(length(w)) AS DOUBLE) AS chars
  FROM doc_words JOIN fin USING (w)
  GROUP BY doc_id
) r USING (doc_id)
"""


UNIGRAM_ENCODE_FREQ = _unigram_encode_freq_sql()


# Windowed-agg MV with retention: batch two-level rollup (5-min buckets →
# 12 containing sliding 1h windows → top-5), restricted to buckets newer
# than (max bucket_end − 7 days) and to windows FULLY covered by retained
# buckets — hot_items' own oracle shape plus the data-time horizon the
# stream view serves under.
HOT_ITEMS_MV = """
WITH e AS (
  SELECT CAST(props->>'k' AS INT) AS item_k, ts
  FROM events
  WHERE event_type = 'view' AND CAST(props->>'k' AS INT) IS NOT NULL
), b AS (
  SELECT CAST(floor(epoch(time_bucket(INTERVAL 300 seconds, ts))) AS BIGINT) + 300 AS bucket_end,
         item_k, count(*) AS cnt
  FROM e GROUP BY 1, 2
), mx AS (
  SELECT max(bucket_end) - 604800 AS cutoff FROM b
), counts AS (
  SELECT bucket_end + (j - 1) * 300 AS window_end_s, item_k,
         CAST(sum(cnt) AS BIGINT) AS cnt
  FROM b, mx, generate_series(1, 12) AS gs(j)
  WHERE b.bucket_end > mx.cutoff
  GROUP BY 1, 2
), ranked AS (
  SELECT window_end_s, item_k, cnt,
         CAST(row_number() OVER (PARTITION BY window_end_s ORDER BY cnt DESC, item_k ASC) AS INT) AS rank
  FROM counts
)
SELECT window_end_s, item_k, cnt, rank
FROM ranked, mx
WHERE rank <= 5 AND window_end_s - 3300 > mx.cutoff
"""


# Top-10 customers by DECIMAL-exact revenue over surviving (never-deleted)
# orders — the batch rank the maintained candidate set must reproduce.
TOP_CUSTOMERS_VIEW = """
WITH tot AS (
  SELECT o.o_custkey,
         sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 6)
                  AS DECIMAL(18,6))) AS rev
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderkey % 7 <> 0
  GROUP BY o.o_custkey
), ranked AS (
  SELECT o_custkey, CAST(rev AS DOUBLE) AS revenue,
         CAST(row_number() OVER (ORDER BY rev DESC, o_custkey ASC) AS INT) AS rank
  FROM tot
)
SELECT o_custkey, revenue, rank FROM ranked WHERE rank <= 10
"""


# Exact interpolated quantiles over surviving (never-deleted) events at
# the cent-quantized value grain — what the maintained refcount histogram
# must invert to.
VALUE_QUANTILE_VIEW = """
WITH s AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) / 100.0 AS v
  FROM events WHERE event_id % 7 <> 0
)
SELECT event_type,
       round(quantile_cont(v, 0.5), 6) AS p50,
       round(quantile_cont(v, 0.9), 6) AS p90,
       count(*) AS n
FROM s GROUP BY event_type
"""


# Replay of the heavy-hitters stream's exact semantics: the same
# ts-ordered integer-division chunk split as stage_event_chunks, the same
# per-chunk compression (subtract the 33rd-largest count, keep survivors,
# bank the subtraction), lossless merge, (lb, ub) read.
HEAVY_HITTERS_VIEW = """
WITH e AS (
  SELECT CAST(props->>'k' AS INT) AS item_k, event_type,
         row_number() OVER (ORDER BY ts, event_id) - 1 AS rn,
         count(*) OVER () AS n
  FROM events
), chunked AS (
  SELECT item_k, event_type,
         CASE WHEN rn < n // 3 THEN 0 WHEN rn < (2 * n) // 3 THEN 1 ELSE 2 END AS ep
  FROM e
), counts AS (
  SELECT ep, item_k, count(*) AS c
  FROM chunked WHERE event_type = 'view' AND item_k IS NOT NULL
  GROUP BY ep, item_k
), ranked AS (
  SELECT ep, item_k, c,
         row_number() OVER (PARTITION BY ep ORDER BY c DESC, item_k ASC) AS r
  FROM counts
), t AS (
  SELECT ep, coalesce(max(CASE WHEN r = 33 THEN c END), 0) AS t
  FROM ranked GROUP BY ep
), kept AS (
  SELECT r.ep, r.item_k, r.c - t.t AS c
  FROM ranked r JOIN t USING (ep) WHERE r.c > t.t
), merged AS (
  SELECT item_k, sum(c) AS c FROM kept GROUP BY item_k
), errm AS (
  SELECT coalesce(sum(t), 0) AS e FROM t
)
SELECT item_k, CAST(c AS BIGINT) AS c_lb, CAST(c + e AS BIGINT) AS c_ub
FROM merged, errm WHERE c > 0
"""


# knn_brute over SURVIVING vectors (vec_id % 9 == 5 deleted) — what the
# CDC flat store must serve; queries are survivors too, so a deleted
# query's rows vanish.
KNN_BRUTE_SURVIVORS = KNN_BRUTE.replace(
    "AS q FROM embeddings)", "AS q FROM embeddings WHERE vec_id % 9 <> 5)"
)


TOP_CUSTOMERS_BY_STATUS_VIEW = """
WITH tot AS (
  SELECT o.o_orderstatus, o.o_custkey,
         sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 6)
                  AS DECIMAL(18,6))) AS rev
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderkey % 7 <> 0
  GROUP BY 1, 2
), ranked AS (
  SELECT o_orderstatus, o_custkey, CAST(rev AS DOUBLE) AS revenue,
         CAST(row_number() OVER (PARTITION BY o_orderstatus
                ORDER BY rev DESC, o_custkey ASC) AS INT) AS rank
  FROM tot
)
SELECT o_orderstatus, o_custkey, revenue, rank FROM ranked WHERE rank <= 5
"""


TRAINING_ORACLES: dict[str, str] = {
    "flat_index_delete_stream_view": KNN_BRUTE_SURVIVORS,
    "flat_index_purged_stream_view": KNN_BRUTE_SURVIVORS,
    "hot_items_mv_stream_view": HOT_ITEMS_MV,
    "hot_items_mv_unordered_stream_view": HOT_ITEMS_MV,
    "knn_pq_rotated": KNN_PQ_ROTATED,
    "heavy_hitters_stream_view": HEAVY_HITTERS_VIEW,
    "value_quantile_stream_view": VALUE_QUANTILE_VIEW,
    "value_quantile_purged_stream_view": VALUE_QUANTILE_VIEW,
    "top_customers_stream_view": TOP_CUSTOMERS_VIEW,
    "top_customers_by_status_stream_view": TOP_CUSTOMERS_BY_STATUS_VIEW,
    "top_customers_by_status_purged_stream_view": TOP_CUSTOMERS_BY_STATUS_VIEW,
    "wordpiece_encode_freq": WORDPIECE_ENCODE_FREQ,
    "wordpiece_encode": WORDPIECE_ENCODE,
    "unigram_encode_freq": UNIGRAM_ENCODE_FREQ,
    "unigram_encode": UNIGRAM_ENCODE,
    "doc_chunks": DOC_CHUNKS,
    "corpus_mixture": CORPUS_MIXTURE,
    "mixture_temperature": MIXTURE_TEMPERATURE,
    "pii_scrub": PII_SCRUB,
    "embedding_centroids": EMBEDDING_CENTROIDS,
    "bigram_stats": BIGRAM_STATS,
    "top_terms": TOP_TERMS,
    "corpus_sample_stratified": CORPUS_SAMPLE_STRATIFIED,
    "corpus_sample": CORPUS_SAMPLE,
    "corpus_split": CORPUS_SPLIT,
    "decontaminate": DECONTAMINATE,
    "shingle_novelty": SHINGLE_NOVELTY,
    "doc_repetition": DOC_REPETITION,
    "dedup_containment": DEDUP_CONTAINMENT,
    "corpus_profile": CORPUS_PROFILE,
    # the stream-maintained profile is contract-equal to its batch twin
    "corpus_stats_stream_view": CORPUS_PROFILE,
    "doc_fingerprint": DOC_FINGERPRINT,
    "dedup_exact": DEDUP_EXACT,
    "dedup_ngram_jaccard": DEDUP_NGRAM_JACCARD,
    "sparse_cosine_pairs": SPARSE_COSINE_PAIRS,
    "bigram_lm_score": BIGRAM_LM_SCORE,
    "dedup_minhash_lsh": DEDUP_MINHASH_LSH,
    "dedup_lsh_index_delete_stream_view": DEDUP_MINHASH_LSH_SURVIVORS,
    "dedup_lsh_index_purged_stream_view": DEDUP_MINHASH_LSH_SURVIVORS,
    "minhash_signatures": MINHASH_SIGNATURES,
    "simhash_fingerprints": SIMHASH_FINGERPRINTS,
    "dedup_simhash": DEDUP_SIMHASH,
    "dedup_clusters": DEDUP_CLUSTERS,
    # stream-maintained twin reads the replayed MV state; same oracle —
    # the hash gate certifies the maintenance loop converges to batch
    "dedup_clusters_stream_view": DEDUP_CLUSTERS,
    "dedup_substring": DEDUP_SUBSTRING,
    "doc_stats": DOC_STATS,
    "lang_id": LANG_ID,
    "lang_confusion": LANG_CONFUSION,
    "tokenizer_fertility": TOKENIZER_FERTILITY,
    "embedding_norm_audit": EMBEDDING_NORM_AUDIT,
    "rolling_fingerprint": ROLLING_FINGERPRINT,
    "token_counts": TOKEN_COUNTS,
    "corpus_prep": _corpus_prep_sql(),
    "knn_brute": KNN_BRUTE,
    "knn_brute_filtered": KNN_BRUTE_FILTERED,
    "knn_ivf_filtered": KNN_IVF_FILTERED,
    "knn_ivfpq_filtered": KNN_IVFPQ_FILTERED,
    "knn_ivfsq8_filtered": KNN_IVFSQ8_FILTERED,
    "knn_lsh": KNN_LSH,
    "knn_lsh_multiprobe": KNN_LSH_MULTIPROBE,
    "knn_ivf": KNN_IVF,
    "knn_ivf_trained": KNN_IVF_TRAINED,
    "knn_rp": KNN_RP,
    "knn_pq": KNN_PQ,
    "knn_sq8": KNN_SQ8,
    "knn_sq8_index_view": KNN_SQ8_INDEX,
    "knn_sq8_index_delete_view": KNN_SQ8_INDEX_CDC,
    "knn_sq8_index_purged_view": KNN_SQ8_INDEX_CDC,
    "knn_sq8_index_filtered_view": KNN_SQ8_INDEX_CDC_FILTERED,
    "sq8_index_filtered_eval": SQ8_INDEX_FILTERED_EVAL,
    "knn_ivfsq8": KNN_IVFSQ8,
    "knn_ivfpq": KNN_IVFPQ,
    "knn_ivfpq_residual": KNN_IVFPQ_RESIDUAL,
    "knn_ivfpq_refine": KNN_IVFPQ_REFINE,
    "ann_eval": ANN_EVAL,
    "filtered_eval": FILTERED_EVAL,
    "knn_pq_index_view": KNN_PQ_INDEX,
    "knn_pq_index_delete_view": KNN_PQ_INDEX_CDC,
    "knn_pq_index_filtered_view": KNN_PQ_INDEX_CDC_FILTERED,
    "pq_index_filtered_eval": PQ_INDEX_FILTERED_EVAL,
    "knn_graph_stream_view": KNN_GRAPH_SURVIVORS,
    "knn_graph_purged_stream_view": KNN_GRAPH_SURVIVORS,
    "knn_graph_ann": KNN_GRAPH_ANN,
    "graph_ann_eval": GRAPH_ANN_EVAL,
    "knn_graph_ann_stream_view": KNN_GRAPH_ANN_SURVIVORS,
    "knn_pq_index_purged_view": KNN_PQ_INDEX_CDC,
    "knn_pq_index_refine_view": KNN_PQ_INDEX_REFINE,
    "knn_graph": KNN_GRAPH,
    "pagerank_knn": PAGERANK_KNN,
    "pagerank_stream_view": PAGERANK_STREAM_VIEW,
    "order_wide_stream_view": ORDER_WIDE_VIEW,
    "order_wide_delete_stream_view": ORDER_WIDE_DELETE_VIEW,
    "order_wide_line_delete_stream_view": ORDER_WIDE_LINE_DELETE_VIEW,
    "order_wide_upsert_stream_view": ORDER_WIDE_UPSERT_VIEW,
    "order_wide_asof_stream_view": ORDER_WIDE_ASOF_VIEW,
    "revenue_by_cust_upsert_stream_view": REVENUE_BY_CUST_UPSERT_VIEW,
    "revenue_by_cust_stream_view": REVENUE_BY_CUST_VIEW,
    "revenue_max_by_cust_stream_view": REVENUE_MAX_BY_CUST_VIEW,
    "distinct_qty_by_cust_stream_view": DISTINCT_QTY_BY_CUST_VIEW,
    "order_cust_wide_stream_view": ORDER_CUST_WIDE_VIEW,
    "order_cust_wide_upsert_stream_view": ORDER_CUST_WIDE_UPSERT_VIEW,
    "order_cust_wide_asof_stream_view": ORDER_CUST_WIDE_ASOF_VIEW,
    "order_cust_wide_dimupd_stream_view": ORDER_CUST_WIDE_DIMUPD_VIEW,
    "revenue_by_nation_dimupd_stream_view": REVENUE_BY_NATION_DIMUPD_VIEW,
    "revenue_by_nation_ivm_stream_view": REVENUE_BY_NATION_IVM_VIEW,
    "revenue_by_nation_ivm_upsert_stream_view": REVENUE_BY_NATION_IVM_UPSERT_VIEW,
    "revenue_by_region_ivm_stream_view": REVENUE_BY_REGION_IVM_VIEW,
    "order_wide_purged_stream_view": ORDER_WIDE_DELETE_VIEW,
    "order_wide_cascade_stream_view": ORDER_WIDE_VIEW,
    "perceptron_lang": PERCEPTRON_LANG,
    "knn_triangles": KNN_TRIANGLES,
    "components_knn": COMPONENTS_KNN,
    "components_knn_cdc_stream_view": COMPONENTS_KNN_SURVIVORS,
    "knn_triangles_cdc_stream_view": KNN_TRIANGLES_SURVIVORS,
    "label_prop_knn_cdc_stream_view": LABEL_PROPAGATION_KNN_SURVIVORS,
    "pagerank_knn_cdc_stream_view": _pagerank_knn_survivors(),
    "bm25_search": BM25_SEARCH,
    # the index-served search must equal the batch scan bit-for-bit —
    # same oracle by design
    "bm25_index_stream_view": BM25_SEARCH,
    "bm25_index_delete_stream_view": BM25_INDEX_DELETE_VIEW,
    "hybrid_index_stream_view": HYBRID_SEARCH_RRF,
    "hybrid_index_delete_stream_view": HYBRID_INDEX_DELETE_VIEW,
    "hybrid_index_purged_stream_view": HYBRID_INDEX_DELETE_VIEW,
    "hybrid_pq_index_stream_view": HYBRID_PQ_INDEX_VIEW,
    "hybrid_pq_index_delete_stream_view": HYBRID_PQ_INDEX_DELETE_VIEW,
    "bm25_index_purged_stream_view": BM25_INDEX_DELETE_VIEW,
    "hybrid_search_rrf": HYBRID_SEARCH_RRF,
    "dedup_rate_by_source": DEDUP_RATE_BY_SOURCE,
    "source_minhash_setops": SOURCE_MINHASH_SETOPS,
    "label_propagation_knn": LABEL_PROPAGATION_KNN,
    "cluster_aware_split": CLUSTER_AWARE_SPLIT,
    "boilerplate_scrub": BOILERPLATE_SCRUB,
    "embedding_dedup": EMBEDDING_DEDUP,
    "kmeans_embeddings": KMEANS_EMBEDDINGS,
    "semdedup": SEMDEDUP,
    "sequence_pack": SEQUENCE_PACK,
    "quality_gopher": QUALITY_GOPHER,
    "importance_weights": IMPORTANCE_WEIGHTS,
    "hard_negatives": HARD_NEGATIVES,
    "perplexity_buckets": PERPLEXITY_BUCKETS,
    "tfidf_terms": TFIDF_TERMS,
    "embedding_quantize": EMBEDDING_QUANTIZE,
    "contamination_matrix": CONTAMINATION_MATRIX,
    "weighted_sample": WEIGHTED_SAMPLE,
    "dedup_eval": DEDUP_EVAL.format(ex=DEDUP_NGRAM_JACCARD, ls=DEDUP_MINHASH_LSH),
    "term_counts_cms": TERM_COUNTS_CMS,
    "split_leakage_audit": SPLIT_LEAKAGE_AUDIT.format(
        lsh=DEDUP_MINHASH_LSH, split=CORPUS_SPLIT
    ),
    "duplicate_cluster_sizes": f"""
WITH cc AS ({DEDUP_CLUSTERS}),
szs AS (
  SELECT canonical_id, count(*) AS sz FROM cc GROUP BY 1 HAVING count(*) >= 2
)
SELECT CAST(sz AS BIGINT) AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
FROM szs GROUP BY 1
""",
    "token_entropy": """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
SELECT doc_id,
       CAST(len(l) AS INT) AS n_tokens,
       round(-list_sum(list_transform(
                list_transform(list_distinct(l), w -> len(list_filter(l, x -> x = w))),
                c -> (c::DOUBLE / len(l)) * log2(c::DOUBLE / len(l)))), 6) AS entropy_bits
FROM t
""",
    "source_divergence": f"""
WITH tokb AS (
  SELECT source, {H60.format(c="tok")} % {DSIR_BUCKETS} AS bucket, count(*) AS cnt
  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY 1, 2
),
src_tot AS (SELECT source, sum(cnt) AS s_tot FROM tokb GROUP BY 1),
corpus AS (
  SELECT bucket, sum(cnt) AS c_cnt, sum(sum(cnt)) OVER () AS c_tot
  FROM tokb GROUP BY bucket
),
grid AS (SELECT * FROM corpus, src_tot),
j AS (
  SELECT g.source,
         (coalesce(tb.cnt, 0) + 1)::DOUBLE / (g.s_tot + {DSIR_BUCKETS})::DOUBLE AS p,
         (g.c_cnt + 1)::DOUBLE / (g.c_tot + {DSIR_BUCKETS})::DOUBLE AS q
  FROM grid g LEFT JOIN tokb tb ON tb.source = g.source AND tb.bucket = g.bucket
)
SELECT source,
       round(sum(p * log2(p / ((p + q) / 2)) / 2 + q * log2(q / ((p + q) / 2)) / 2), 6) AS jsd_bits
FROM j GROUP BY source
""",
}
