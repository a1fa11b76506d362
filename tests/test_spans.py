"""Unit tests for repeated-substring span detection
(operators/dedup.duplicated_span_stats) — the distributed form of
suffix-array substring dedup (no reference counterpart; north star)."""

from __future__ import annotations

from pyspark_data_processing_challenge_spark.operators import dedup


def _stats(spark, rows, k=3):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup.duplicated_span_stats(df, "text", "doc_id", k=k)
    return {r.doc_id: (r.dup_positions, r.dup_spans, r.dup_token_cov) for r in out.collect()}

def test_no_duplicates_all_zero(spark):
    got = _stats(spark, [(1, "a b c d e"), (2, "f g h i j")], k=3)
    assert got == {1: (0, 0, 0), 2: (0, 0, 0)}


def test_cross_doc_duplicate_span_merges(spark):
    # "x y z w" shared verbatim: two overlapping 3-gram positions in
    # each doc -> ONE maximal span covering 4 tokens
    got = _stats(spark, [(1, "x y z w a"), (2, "b x y z w")], k=3)
    assert got[1] == (2, 1, 4)
    assert got[2] == (2, 1, 4)


def test_within_doc_repeat_counts(spark):
    # the 3-gram "p q r" occurs twice INSIDE one doc -> both positions
    # duplicated; gap > k so they stay two separate spans of 3 tokens
    got = _stats(spark, [(1, "p q r a b c d p q r")], k=3)
    assert got[1] == (2, 2, 6)


def test_adjacent_positions_merge_single_span(spark):
    # positions 0 and 3 (gap == k) merge: [0,2] and [3,5] are adjacent
    got = _stats(spark, [(1, "a b c d e f g"), (2, "a b c z d e f")], k=3)
    # doc1: grams "a b c"@0 and "d e f"@3 duplicated -> merged span len 6
    assert got[1] == (2, 1, 6)
    # doc2: "a b c"@0, "d e f"@4 -> gap 4 > k -> two spans
    assert got[2] == (2, 2, 6)


def test_short_and_blank_docs_are_zero(spark):
    got = _stats(spark, [(1, "a b"), (2, ""), (3, "   "), (4, "a b")], k=3)
    # docs shorter than k contribute no grams at all — even identical ones
    assert got == {1: (0, 0, 0), 2: (0, 0, 0), 3: (0, 0, 0), 4: (0, 0, 0)}


def test_min_count_threshold(spark):
    df_rows = [(1, "u v w a"), (2, "u v w b"), (3, "u v w c")]
    # "u v w" occurs 3x corpus-wide; each doc's other gram is unique
    got3 = _stats(spark, df_rows, k=3)
    assert all(v == (1, 1, 3) for v in got3.values())
    # raising min_count above corpus frequency suppresses everything
    df = spark.createDataFrame(df_rows, ["doc_id", "text"])
    out = dedup.duplicated_span_stats(df, "text", "doc_id", k=3, min_count=4)
    assert all(r.dup_spans == 0 for r in out.collect())


def test_strip_removes_covered_tokens(spark):
    df = spark.createDataFrame(
        [(1, "x y z w a"), (2, "b x y z w"), (3, "c d e f g")],
        ["doc_id", "text"],
    )
    out = dedup.strip_duplicated_spans(df, "text", "doc_id", k=3)
    got = {r.doc_id: (r.clean_text, r.n_removed) for r in out.collect()}
    assert got[1] == ("a", 4)
    assert got[2] == ("b", 4)
    assert got[3] == ("c d e f g", 0)


def test_strip_can_empty_a_doc_and_handles_blank(spark):
    df = spark.createDataFrame(
        [(1, "p q r"), (2, "p q r"), (3, "")], ["doc_id", "text"]
    )
    out = dedup.strip_duplicated_spans(df, "text", "doc_id", k=3)
    got = {r.doc_id: (r.clean_text, r.n_removed) for r in out.collect()}
    assert got[1] == ("", 3)
    assert got[2] == ("", 3)
    assert got[3] == ("", 0)


def test_incremental_equals_full_recompute(spark):
    from pyspark.sql import types as T

    batch_a = spark.createDataFrame(
        [(1, "x y z w a"), (2, "c d e f g")], ["doc_id", "text"]
    )
    # 'x y z w' unique within each batch but duplicated ACROSS batches —
    # the case only the store can catch
    batch_b = spark.createDataFrame(
        [(3, "b x y z w"), (4, "h i j k l")], ["doc_id", "text"]
    )
    # the store keys on the 64-bit hashed gram id (r17 — _gram_id_array)
    empty_store = spark.createDataFrame(
        [], T.StructType([
            T.StructField("gram", T.LongType()),
            T.StructField("n", T.LongType()),
        ])
    )
    stats_a, store = dedup.incremental_duplicated_spans(
        batch_a, empty_store, "text", "doc_id", k=4
    )
    store = spark.createDataFrame(store.collect(), store.schema)  # "persist"
    assert all(r.dup_spans == 0 for r in stats_a.collect())

    stats_b, store2 = dedup.incremental_duplicated_spans(
        batch_b, store, "text", "doc_id", k=4
    )
    got_b = {r.doc_id: (r.dup_positions, r.dup_spans, r.dup_token_cov)
             for r in stats_b.collect()}

    full = dedup.duplicated_span_stats(
        batch_a.unionByName(batch_b), "text", "doc_id", k=4
    )
    want = {r.doc_id: (r.dup_positions, r.dup_spans, r.dup_token_cov)
            for r in full.collect() if r.doc_id in (3, 4)}
    assert got_b == want
    assert got_b[3] == (1, 1, 4)  # 'x y z w' found via the store

    # store accumulates totals across batches (gram = hashed id of
    # 'x y z w', computed via the operator's own id expression)
    from pyspark.sql import functions as SF

    from pyspark_data_processing_challenge_spark.operators.dedup import (
        _gram_id_array,
    )

    xyzw = spark.createDataFrame([(["x", "y", "z", "w"],)], ["t"]).select(
        SF.transform(SF.col("t"), lambda x: SF.xxhash64(x)).alias("__th")
    ).select(_gram_id_array("__th", 4)[0].alias("g")).first().g
    counts = {r.gram: r.n for r in store2.collect()}
    assert counts[xyzw] == 2

    # append-only store form: batch partials re-aggregated on read must
    # equal the combined store, and the stats must be identical
    stats_b2, partials = dedup.incremental_duplicated_spans(
        batch_b, store, "text", "doc_id", k=4, store_update="batch"
    )
    got_b2 = {r.doc_id: (r.dup_positions, r.dup_spans, r.dup_token_cov)
              for r in stats_b2.collect()}
    assert got_b2 == got_b
    from pyspark.sql import functions as F

    log_store = store.unionByName(partials)
    reagg = {
        r.gram: r.n
        for r in log_store.groupBy("gram").agg(F.sum("n").alias("n")).collect()
    }
    assert reagg == counts


def test_strip_removed_equals_span_coverage(spark):
    # cross-operator invariant on real data: the tokens the strip drops
    # are exactly the union coverage the stats report
    from tests.conftest import SF_DIR
    from pyspark_data_processing_challenge_spark.queries import advanced

    stats = {
        r.doc_id: r.dup_token_cov
        for r in advanced.docs_dup_spans(spark, SF_DIR).collect()
    }
    stripped = {
        r.doc_id: r.n_removed
        for r in advanced.docs_strip_dup_spans(spark, SF_DIR).collect()
    }
    assert stats == stripped


def test_span_stats_match_bruteforce_reference(spark):
    # pure-Python reference over a random-ish small-vocab corpus
    import itertools

    vocab = ["a", "b", "c", "d"]
    rng_texts = []
    x = 12345
    for i in range(40):
        words = []
        for _ in range(12):
            x = (x * 1103515245 + 12345) % (2**31)
            words.append(vocab[x % len(vocab)])
        rng_texts.append((i, " ".join(words)))

    k = 3
    grams = {}
    toks = {i: t_.split() for i, t_ in rng_texts}
    for i, ts_ in toks.items():
        for p in range(len(ts_) - k + 1):
            grams.setdefault(tuple(ts_[p : p + k]), []).append((i, p))
    want = {}
    for i in toks:
        pos = sorted(
            p for g, occ in grams.items() if len(occ) >= 2
            for (d, p) in occ if d == i
        )
        spans = []
        for p in pos:
            if spans and p - spans[-1][1] <= k:
                spans[-1] = (spans[-1][0], p)
            else:
                spans.append((p, p))
        cov = sum(e - s + k for s, e in spans)
        want[i] = (len(pos), len(spans), cov)

    from pyspark_data_processing_challenge_spark.operators import dedup

    df = spark.createDataFrame(rng_texts, ["doc_id", "text"])
    out = dedup.duplicated_span_stats(df, "text", "doc_id", k=k)
    got = {
        r.doc_id: (r.dup_positions, r.dup_spans, r.dup_token_cov)
        for r in out.collect()
    }
    assert got == want


def _lcs(spark, rows, k=3, w=8):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup.suffix_window_lcs_stats(df, "text", "doc_id", k=k, w=w)
    return {
        r.doc_id: (r.n_dup_pos, r.max_dup_len, r.dup_token_cov_lcs)
        for r in out.collect()
    }


def test_lcs_exact_extent_beyond_k(spark):
    # a 6-token verbatim repeat with k=3: the k-gram form can only say
    # "positions 0..3 are duplicated"; the LCS form must report the
    # exact maximal extent 6 at the repeat's start
    rows = [(1, "a b c d e f x y"), (2, "p q a b c d e f")]
    got = _lcs(spark, rows, k=3, w=8)
    assert got[1][1] == 6 and got[2][1] == 6  # max_dup_len = exact extent
    assert got[1][0] == 4  # dup positions: starts 0..3 (suffix >= k)
    assert got[1][2] == 6  # union coverage = the 6 repeated tokens


def test_lcs_window_cap(spark):
    # extents are capped at w — a 6-token repeat under w=4 reports 4
    rows = [(1, "a b c d e f"), (2, "a b c d e f")]
    got = _lcs(spark, rows, k=3, w=4)
    assert got[1][1] == 4


def test_lcs_relations_to_kgram_form_on_planted_corpus(spark):
    """VERDICT r10 #7 done-criterion: on the planted corpus (every base
    doc's text recurs verbatim inside its perturbed copy) the LCS form
    must (a) flag EXACTLY the k-gram form's duplicated positions
    (lcp >= k iff the k-gram repeats) and (b) cover at least the
    k-gram spans (each [p, p+lcp) extent contains [p, p+k)) — spans
    are a superset, per maximal-extent completeness."""
    from pyspark_data_processing_challenge_spark.queries.llm import (
        _perturbed_docs,
    )
    from tests.conftest import SF_DIR

    corpus = _perturbed_docs(spark, SF_DIR)
    kg = {
        r.doc_id: r
        for r in dedup.duplicated_span_stats(
            corpus, "text", "doc_id", k=4
        ).collect()
    }
    lcs_rows = dedup.suffix_window_lcs_stats(
        corpus, "text", "doc_id", k=4, w=32
    ).collect()
    assert len(lcs_rows) == len(kg)
    for r in lcs_rows:
        g = kg[r.doc_id]
        assert r.n_dup_pos == g.dup_positions, (r.doc_id, r.n_dup_pos, g.dup_positions)
        assert r.dup_token_cov_lcs >= g.dup_token_cov, (r.doc_id,)
    # the strictly-added information is the EXACT extent: whole-doc
    # planted repeats must report extents at the window cap, far
    # beyond the k the k-gram form can see
    beyond_k = [r for r in lcs_rows if r.max_dup_len > 4]
    assert beyond_k and max(r.max_dup_len for r in beyond_k) == 32


def test_salted_anchor_lcs_equals_unsalted(spark):
    """salt_anchors=True (the hot-anchor scale path) must produce the
    EXACT same per-doc stats and per-position lcp as the unsalted
    form — on a corpus engineered to exercise every boundary case:
    a hot stop-gram anchor ("the the the"), LCP-exactly-k pairs that
    differ at token k+1 (the salt boundary the repeats-floor must
    restore), doc-final suffixes shorter than k+1 (null salt), and
    clean docs."""
    rows = [
        # hot anchor "a a a" with diverging continuations
        (1, "a a a x p q r"),
        (2, "a a a y s t u"),
        (3, "a a a z v w j"),
        # LCP exactly k across salt boundary: share "m n o", differ next
        (4, "m n o e1 e2"),
        (5, "m n o f1 f2"),
        # long shared extent (lcp > k, same salt group)
        (6, "g h i j k l"),
        (7, "g h i j k l"),
        # doc ending exactly at a k-gram (suffix of length k, null salt)
        (8, "q r a a a"),
        (9, "clean doc nothing shared here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    plain = dedup.suffix_window_lcs_stats(
        df, "text", "doc_id", k=3, w=8, salt_anchors=False
    )
    salted = dedup.suffix_window_lcs_stats(
        df, "text", "doc_id", k=3, w=8, salt_anchors=True
    )
    key = lambda r: r.doc_id  # noqa: E731
    assert sorted(plain.collect(), key=key) == sorted(
        salted.collect(), key=key
    )
    # per-position lcp equality too (stats could mask a compensation)
    sc_p = dedup._suffix_lcp_scored(df, "text", "doc_id", k=3, w=8)
    sc_s = dedup._suffix_lcp_scored(
        df, "text", "doc_id", k=3, w=8, salt_anchors=True
    )
    as_map = lambda d: {  # noqa: E731
        (r.doc_id, r.pos): r.lcp for r in d.collect()
    }
    assert as_map(sc_p) == as_map(sc_s)
    # sanity: the hot anchor's positions really did spread over salts
    # and the exactly-k pair survived the boundary
    got = {r.doc_id: r.n_dup_pos for r in salted.collect()}
    assert got[4] >= 1 and got[5] >= 1  # exactly-k floor restored
    assert got[8] >= 1  # null-salt doc-final suffix matched
