"""Property-based tests (hypothesis): random small inputs vs brute-force
Python references for the operators whose edge cases are combinatorial
(as-of matching, relaxed CEP). Few examples, tiny frames — each example
runs real Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st


ROWS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),   # key
        st.integers(min_value=0, max_value=20),  # ts
        st.integers(min_value=0, max_value=9),   # id/tiebreak
    ),
    min_size=0,
    max_size=12,
)


class TestAsofProperty:
    @settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
    @given(left=ROWS, right=ROWS)
    def test_asof_matches_bruteforce(self, spark, left, right):
        from gmall_flink_200621_spark.operators.asof import asof_join

        # unique left ids so rows are addressable
        left = [(k, t, i) for i, (k, t, _) in enumerate(left)]
        ldf = spark.createDataFrame(left, "k long, lts long, lid long") if left else None
        rdf = spark.createDataFrame(right, "k long, rts long, rid long") if right else None
        if ldf is None:
            return
        if rdf is None:
            rdf = spark.createDataFrame([], "k long, rts long, rid long")

        got = {
            r.lid: (r.rid, r.rts)
            for r in asof_join(
                ldf, rdf, ["k"], "lts", "rts", ["rid", "rts"], tiebreak="rid"
            ).collect()
        }

        def brute(k, lts):
            cands = [(rts, rid) for (rk, rts, rid) in right if rk == k and rts <= lts]
            if not cands:
                return (None, None)
            best_ts = max(rts for rts, _ in cands)
            best_id = max(rid for rts, rid in cands if rts == best_ts)
            return (best_id, best_ts)

        expected = {lid: brute(k, lts) for (k, lts, lid) in left}
        assert got == expected


class TestRelaxedCepProperty:
    @settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=2),   # user
                st.integers(min_value=0, max_value=30),  # ts
                st.booleans(),                           # is_match
            ),
            min_size=0,
            max_size=14,
        ),
        n=st.integers(min_value=2, max_value=3),
        within=st.integers(min_value=1, max_value=10),
    )
    def test_relaxed_matches_bruteforce(self, spark, rows, n, within):
        from pyspark.sql import functions as F

        from gmall_flink_200621_spark.operators.cep import relaxed_times_within

        # unique (user, ts, id) ordering; id doubles as the tiebreak column
        data = [(u, t, i, "hit" if m else "miss") for i, (u, t, m) in enumerate(rows)]
        if not data:
            return
        df = spark.createDataFrame(data, "user_id long, ts long, event_id long, event_type string")
        out = relaxed_times_within(
            df, ["user_id"], "ts", F.col("event_type") == "hit", n=n,
            within_s=within, order_cols=["event_id"],
        ).collect()
        got = {tuple(r) for r in out}

        expected = set()
        for u in {d[0] for d in data}:
            seq = sorted([d for d in data if d[0] == u and d[3] == "hit"], key=lambda d: (d[1], d[2]))
            for i in range(n - 1, len(seq)):
                window = seq[i - n + 1 : i + 1]
                if window[-1][1] - window[0][1] <= within:
                    expected.add((u, *[w[1] for w in window]))
        assert got == expected


class TestDocChunksProperty:
    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        docs=st.lists(
            st.lists(st.sampled_from(["aa", "b", "cde", "word"]), min_size=1, max_size=20),
            min_size=1,
            max_size=5,
        ),
        chunk=st.integers(min_value=2, max_value=6),
        stride=st.integers(min_value=1, max_value=5),
    )
    def test_chunks_match_bruteforce(self, spark, docs, chunk, stride):
        from gmall_flink_200621_spark.operators.textops import doc_chunks

        rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r.doc_id, r.chunk_id): (r.start_tok, r.n_chunk_tokens, r.chunk_text)
            for r in doc_chunks(df, chunk_tokens=chunk, stride=stride).collect()
        }

        expected = {}
        for i, toks in enumerate(docs):
            for ci, s in enumerate(range(0, len(toks), stride)):
                piece = toks[s : s + chunk]
                expected[(i, ci)] = (s + 1, len(piece), " ".join(piece))
        assert got == expected


class TestCorpusMixtureProperty:
    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        docs=st.lists(
            st.tuples(
                st.sampled_from(["src0", "srcX"]),        # hi- vs lo-budget source
                st.integers(min_value=1, max_value=8),    # token count (as 'a'*?)
            ),
            min_size=1,
            max_size=12,
        ),
        hi=st.integers(min_value=1, max_value=20),
        lo=st.integers(min_value=1, max_value=20),
    )
    def test_mixture_matches_bruteforce(self, spark, docs, hi, lo):
        """The kept set equals the Python model: per source, docs in
        (h60(seed:doc_id), doc_id) order are kept while the running sum of
        PRIOR kept+unkept tokens is below the source's budget."""
        import hashlib

        from gmall_flink_200621_spark.operators.textops import corpus_mixture

        # text = n single-char tokens → n_bpe_est == n exactly
        rows = [(i, src, " ".join(["a"] * n)) for i, (src, n) in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        got = {r.doc_id for r in corpus_mixture(df, ("src0",), hi, lo).collect()}

        def h60py(s: str) -> int:
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        expected = set()
        for src in {s for s, _ in docs}:
            budget = hi if src == "src0" else lo
            members = [
                (h60py(f"mix0:{i}"), i, n)
                for i, (s, n) in enumerate(docs)
                if s == src
            ]
            members.sort()
            running = 0
            for _, i, n in members:
                if running < budget:
                    expected.add(i)
                running += n
        assert got == expected


class TestQualityGopherProperty:
    TOKS = st.lists(
        st.sampled_from(["a", "bb", "ccc", "the", "of", "zzzz", "qq"]),
        min_size=1,
        max_size=25,
    )

    @settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
    @given(toks=TOKS)
    def test_stats_match_bruteforce(self, spark, toks):
        """The sorted-run top-unigram aggregate and every other derived
        stat must equal the naive Python definitions on arbitrary token
        multisets (duplicates, singletons, all-same)."""
        from collections import Counter

        from gmall_flink_200621_spark.operators.textops import QG_STOPWORDS, quality_gopher

        df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
        r = quality_gopher(df).collect()[0]
        c = Counter(toks)
        assert r.n_words == len(toks)
        assert r.mean_word_len == round(sum(map(len, toks)) / len(toks), 6)
        assert r.stop_count == sum(1 for t in toks if t in QG_STOPWORDS)
        assert r.top_unigram_ratio == round(max(c.values()) / len(toks), 6)


class TestImportanceWeightsProperty:
    DOCS = st.lists(
        st.tuples(
            st.lists(st.sampled_from(["u", "v", "w", "x", "y"]), min_size=1, max_size=6),
            st.booleans(),  # target-language?
        ),
        min_size=1,
        max_size=6,
    )

    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(docs=DOCS)
    def test_weights_match_bruteforce(self, spark, docs):
        """Per-doc weight equals the Python-computed smoothed LLR over the
        SAME hash buckets for arbitrary corpora (incl. zero target docs)."""
        import hashlib
        import math
        from collections import Counter

        from gmall_flink_200621_spark.operators.textops import DSIR_BUCKETS, importance_weights

        rows = [
            (i, " ".join(toks), "en" if tgt else "fr", "s", 1)
            for i, (toks, tgt) in enumerate(docs)
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars int"
        )
        got = {r.doc_id: r.weight for r in importance_weights(df).collect()}

        def bucket(tok: str) -> int:
            return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % DSIR_BUCKETS

        raw, tgt_c = Counter(), Counter()
        for i, (toks, tgt) in enumerate(docs):
            for t in toks:
                raw[bucket(t)] += 1
                if tgt:
                    tgt_c[bucket(t)] += 1
        R, T, B = sum(raw.values()), sum(tgt_c.values()), DSIR_BUCKETS
        for i, (toks, _) in enumerate(docs):
            lrs = [
                math.log((tgt_c[bucket(t)] + 1) / (T + B)) - math.log((raw[bucket(t)] + 1) / (R + B))
                for t in toks
            ]
            assert got[i] == round(sum(lrs) / len(lrs), 6), (i, toks)


class TestAsofForwardProperty:
    @settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
    @given(left=ROWS, right=ROWS)
    def test_forward_asof_matches_bruteforce(self, spark, left, right):
        """Earliest right row at-or-after each left row per key, ties on
        equal rts resolved to the max tiebreak — the mirror of the
        backward property through the negation wrapper."""
        from gmall_flink_200621_spark.operators.asof import asof_join_forward

        left = [(k, t, i) for i, (k, t, _) in enumerate(left)]
        if not left:
            return
        ldf = spark.createDataFrame(left, "k long, lts long, lid long")
        rdf = (
            spark.createDataFrame(right, "k long, rts long, rid long")
            if right
            else spark.createDataFrame([], "k long, rts long, rid long")
        )

        got = {
            r.lid: (r.rid, r.rts)
            for r in asof_join_forward(
                ldf, rdf, ["k"], "lts", "rts", ["rid", "rts"], tiebreak="rid"
            ).collect()
        }

        def brute(k, lts):
            cands = [(rts, rid) for (rk, rts, rid) in right if rk == k and rts >= lts]
            if not cands:
                return (None, None)
            best_ts = min(rts for rts, _ in cands)
            best_id = max(rid for rts, rid in cands if rts == best_ts)
            return (best_id, best_ts)

        expected = {lid: brute(k, lts) for (k, lts, lid) in left}
        assert got == expected


EDGES = st.lists(
    st.tuples(st.integers(min_value=0, max_value=9), st.integers(min_value=0, max_value=9)),
    min_size=0,
    max_size=25,
)


class TestPageRankProperty:
    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(edges=EDGES)
    def test_pagerank_matches_python_reference(self, spark, edges):
        """Exact integer equality with an independent Python reference on
        arbitrary small digraphs — self-loops dropped upstream (knn_graph
        never emits them), duplicate arcs deduped to match the operator's
        documented pre-deduped-edges contract."""
        from gmall_flink_200621_spark.operators.graph import (
            PR_DAMP_PCT,
            PR_SCALE,
            PR_TELEPORT,
            pagerank,
        )

        edges = sorted({(a, b) for a, b in edges if a != b})
        verts = list(range(10))
        r = {v: PR_SCALE for v in verts}
        out_deg: dict[int, int] = {}
        for a, _ in edges:
            out_deg[a] = out_deg.get(a, 0) + 1
        for _ in range(3):
            s = {v: 0 for v in verts}
            for a, b in edges:
                s[b] += r[a] // out_deg[a]
            r = {v: PR_TELEPORT + (PR_DAMP_PCT * s[v]) // 100 for v in verts}

        vdf = spark.createDataFrame([(v,) for v in verts], "vec_id long")
        edf = (
            spark.createDataFrame(edges, "src_id long, nbr_id long")
            if edges
            else spark.createDataFrame([], "src_id long, nbr_id long")
        )
        got = {x.vertex_id: x.rank_units for x in pagerank(edf, vdf, iters=3).collect()}
        assert got == r


class TestGlobalRankNtileProperty:
    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        vals=st.lists(
            st.integers(min_value=-50, max_value=50), min_size=1, max_size=40
        ),
        n=st.integers(min_value=1, max_value=12),
        nparts=st.integers(min_value=1, max_value=5),
    )
    def test_matches_window_for_any_n_and_partitioning(self, spark, vals, n, nparts):
        """global_rank_ntile == partition-less row_number/ntile window for
        arbitrary values (ties included — id tiebreak makes the order
        total), any bucket count, any range-partition count."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from gmall_flink_200621_spark.operators.ranking import global_rank_ntile

        rows = [(v, i) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "v long, id long")
        order = [F.desc("v"), F.asc("id")]
        got = {
            r.id: (r.global_rank, r.ntile)
            for r in global_rank_ntile(df, order, n=n, npartitions=nparts).collect()
        }
        w = Window.orderBy(*order)
        want = {
            r.id: (r.rn, r.nt)
            for r in df.select(
                "id",
                F.row_number().over(w).alias("rn"),
                F.ntile(n).over(w).alias("nt"),
            ).collect()
        }
        assert got == want


class TestBpeProperty:
    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        words=st.lists(
            st.text(alphabet="abc", min_size=1, max_size=6), min_size=1, max_size=15
        ),
        k=st.integers(min_value=1, max_value=5),
    )
    def test_incremental_counts_match_python_reference(self, spark, words, k):
        """The delta-maintained pair counts must agree with the full
        recount the Python reference performs, for arbitrary tiny
        corpora — overlap runs ('aaa'), repeated words, and early
        exhaustion (fewer than k merges possible) included."""
        from collections import Counter

        from gmall_flink_200621_spark.operators.bpe import bpe_merges
        from tests.test_operators import TestBpe

        docs = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
        got = [
            (r.rank, r.left, r.right, r.pair_count)
            for r in bpe_merges(docs, n_merges=k).collect()
        ]
        expected = TestBpe._py_bpe(dict(Counter(words)), k)
        assert got == expected
