"""Text-analysis column functions for LLM training-data pipelines.

All pure built-in Column expressions (JVM-side, whole-stage codegen —
no Python UDFs in the hot path). The reference has no text operators;
these implement the north-star extension (SURVEY.md §7.4): token
counting, language ID, quality scoring, fingerprinting, shingling,
MinHash and SimHash signatures.

Cross-engine determinism: everything here is designed so an external
SQL engine (the DuckDB oracle) can compute bit-identical values —
tokenization is a plain whitespace split, the content hash is an
explicit 31-ary polynomial over character codes (not Spark's Murmur3
``hash()``, which nothing else reproduces), and MinHash permutations
are the classic ``(a*h + b) mod p`` family over that hash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne-ish prime for the polynomial hash; keeps acc*31+255 well
# inside int64 so the fold never overflows.
HASH_MOD = 1_000_000_007
# MinHash permutation family prime (> HASH_MOD).
MINHASH_P = 2_147_483_647


def tokens(c: Column) -> Column:
    """Whitespace tokenization; empty/blank text → empty array.

    Oracle equivalent: ``regexp_split_to_array(trim(s), '\\s+')`` with
    the same blank guard.
    """
    return F.when(
        F.length(F.trim(c)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(c), r"\s+"))


def token_count(c: Column) -> Column:
    return F.size(tokens(c)).cast("long")


def char_hash(c: Column) -> Column:
    """Portable 31-ary polynomial hash of a string, mod 1e9+7.

    h = fold(chars, 0, (acc, ch) -> (acc*31 + ascii(ch)) % HASH_MOD)

    Deterministic and engine-agnostic (DuckDB: ``list_reduce`` over
    ``string_split(s,'')`` with a prepended 0). Used as the numeric
    base for MinHash/SimHash so oracle SQL can verify signatures.
    """
    chars = F.split(c, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(31) + F.ascii(ch)) % F.lit(HASH_MOD),
    )


def shingles(c: Column, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined) of the text.

    Texts with fewer than n tokens yield a single shingle of all their
    tokens (so short docs still participate in similarity).

    PERFORMANCE: the token array is bound ONCE per row as a lambda
    variable (``transform(array(toks), t -> …)[0]``). Referencing the
    ``tokens()`` subtree directly inside the per-shingle lambda would
    re-run the whitespace split once per shingle — O(tokens²) splits
    per document (measured ~5x on corpus-wide shingling; same class of
    trap as ``shingle_hashes``'s staging note).
    """
    toks = tokens(F.lower(c))

    def grams_of(t: Column) -> Column:
        k = F.greatest(F.size(t) - F.lit(n - 1), F.lit(1))
        grams = F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        )
        return F.when(
            F.size(t) == 0, F.array().cast("array<string>")
        ).otherwise(F.array_distinct(grams))

    return F.transform(F.array(toks), grams_of).getItem(0)


def minhash_coeffs(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the permutation family
    ``(a*h + b) mod MINHASH_P`` — a simple LCG expansion of the seed so
    Spark and the SQL oracle use the same constants by construction.
    """
    coeffs = []
    x = seed
    for _ in range(num_hashes):
        x = (x * 1_103_515_245 + 12_345) % MINHASH_P
        a = (x % (MINHASH_P - 1)) + 1  # a != 0
        x = (x * 1_103_515_245 + 12_345) % MINHASH_P
        b = x % MINHASH_P
        coeffs.append((a, b))
    return coeffs


def shingle_hashes(c: Column, shingle_n: int = 3) -> Column:
    """array<long> of char_hash over the doc's n-gram shingles.

    PERFORMANCE: this subtree is the expensive part of MinHash/SimHash
    (a char-level fold per shingle). Evaluate it into ITS OWN projected
    column before fanning out to per-slot/per-bit expressions — an
    expression referencing it k times recomputes it k times (HOFs are
    interpreted, no common-subexpression elimination), while a projected
    alias referenced k times is computed once (CollapseProject refuses
    to inline non-cheap multi-use aliases). See minhash_from_hashes /
    simhash_from_hashes and operators/dedup.py for the staged pattern.
    """
    return F.transform(shingles(c, shingle_n), char_hash)


def token_hashes(c: Column) -> Column:
    """array<long> of char_hash over lowercased whitespace tokens."""
    return F.transform(tokens(F.lower(c)), char_hash)


def minhash_from_hashes(hs: Column, num_hashes: int = 16) -> Column:
    """MinHash signature from a (pre-materialized) hash-array column.

    sig[j] = min over hashes h of (a_j * h + b_j) mod p; empty docs get
    the sentinel p in every slot.
    """
    # NB: single-parameter lambdas only — pyspark binds lambda variables
    # by parameter count, so captured default args would be mis-bound.
    def perm_fn(a: int, b: int):
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)

    slots = [
        F.coalesce(
            F.array_min(F.transform(hs, perm_fn(a, b))),
            F.lit(MINHASH_P).cast("long"),
        )
        for a, b in minhash_coeffs(num_hashes)
    ]
    return F.array(*slots)


def minhash_signature(c: Column, num_hashes: int = 16, shingle_n: int = 3) -> Column:
    """MinHash signature: array<long> of length ``num_hashes``.

    Single-expression form (the hash subtree is re-evaluated per slot —
    fine for tests/small data). Hot paths stage ``shingle_hashes`` into
    a column first and call :func:`minhash_from_hashes`.
    """
    return minhash_from_hashes(shingle_hashes(c, shingle_n), num_hashes)


def simhash_from_hashes(hs: Column, bits: int = 32) -> Column:
    """SimHash from a (pre-materialized) hash-array column.

    bit_i = sign of sum over hashes h of (2*((h>>i)&1)-1); ties → 0.
    Returned as a long.
    """
    acc = F.lit(0).cast("long")

    def vote_fn(i: int):
        # NB: the merge lambda must take exactly (acc, elem) — pyspark
        # counts parameters to bind lambda variables, so a captured
        # default arg would be mis-bound as a third lambda variable.
        return lambda a, h: a + (
            F.shiftright(h, i).bitwiseAND(F.lit(1)) * F.lit(2) - F.lit(1)
        )

    out = None
    for i in range(bits):
        votes = F.aggregate(hs, acc, vote_fn(i))
        bit = F.when(votes > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(2**i).cast("long")
        out = term if out is None else out + term
    return out


def simhash(c: Column, bits: int = 32, shingle_n: int | None = None) -> Column:
    """SimHash fingerprint (32-bit by default) over whitespace tokens,
    or over word n-gram shingles when ``shingle_n`` is given.

    Near-duplicate docs differ in few bits (Hamming distance). Shingle
    mode is far more discriminative on corpora with a shared vocabulary
    — token mode considers any two docs with similar word SETS
    near-identical. Single-expression form: the hash subtree re-evaluates
    per bit; hot paths stage ``shingle_hashes``/``token_hashes`` into a
    column and call :func:`simhash_from_hashes`.
    """
    hs = shingle_hashes(c, shingle_n) if shingle_n else token_hashes(c)
    return simhash_from_hashes(hs, bits)


def stopword_count(c: Column, words: tuple[str, ...]) -> Column:
    """Number of tokens (lowercased) that are in ``words``."""
    return F.size(
        F.filter(tokens(F.lower(c)), lambda t: t.isin(*words))
    ).cast("long")


# Tiny per-language function-word sets for the n-gram-free heuristic
# language ID. Chosen to be disjoint across languages.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for", "a"),
    "es": ("el", "la", "de", "que", "los", "una", "por", "con", "para", "las"),
    "fr": ("le", "les", "des", "est", "dans", "une", "pour", "sur", "pas", "aux"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "den", "von"),
}


def lang_scores(c: Column) -> dict[str, Column]:
    return {lang: stopword_count(c, words) for lang, words in LANG_STOPWORDS.items()}


def lang_id(c: Column, default: str = "und") -> Column:
    """Heuristic language ID: argmax of per-language stopword hits.

    Deterministic tie-break: languages are compared in the fixed order
    en > es > fr > de (first maximum wins); zero hits → ``default``.
    """
    scores = lang_scores(c)
    langs = list(LANG_STOPWORDS)
    best = scores[langs[0]]
    for lang in langs[1:]:
        best = F.greatest(best, scores[lang])
    expr = F.lit(default)
    for lang in reversed(langs):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best == 0, F.lit(default)).otherwise(expr)


PUNCT_CLASS = r"[.,;:!?'\"()\[\]{}-]"


def quality_features(c: Column) -> dict[str, Column]:
    """Raw quality-signal features (each portable to the SQL oracle):
    char length, token count, mean token length, punctuation count,
    English stopword ratio.
    """
    n_tok = token_count(c)
    n_chars = F.length(c).cast("long")
    mean_tok_len = F.try_divide(
        F.aggregate(
            tokens(c), F.lit(0).cast("long"), lambda a, t: a + F.length(t)
        ).cast("double"),
        n_tok.cast("double"),
    )
    punct = F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    stop_ratio = F.try_divide(
        stopword_count(c, LANG_STOPWORDS["en"]).cast("double"),
        n_tok.cast("double"),
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "mean_token_len": mean_tok_len,
        "punct_count": punct.cast("long"),
        "stopword_ratio": stop_ratio,
    }


def quality_score(c: Column) -> Column:
    """Composite [0,1] quality score from interpretable signals:
    +0.25 length in [100, 10000] chars, +0.25 mean token length in
    [3, 12], +0.25 stopword ratio >= 0.02, +0.25 token count >= 10.
    A heuristics-only stand-in for model-based scoring (which would be
    a pandas UDF over a batched scorer).
    """
    ft = quality_features(c)
    return (
        F.when((ft["n_chars"] >= 100) & (ft["n_chars"] <= 10_000), 0.25).otherwise(0.0)
        + F.when(
            (ft["mean_token_len"] >= 3) & (ft["mean_token_len"] <= 12), 0.25
        ).otherwise(0.0)
        + F.when(ft["stopword_ratio"] >= 0.02, 0.25).otherwise(0.0)
        + F.when(ft["n_tokens"] >= 10, 0.25).otherwise(0.0)
    )


def fingerprint(c: Column) -> Column:
    """Exact-content fingerprint: md5 of the NFC-agnostic normalized
    text (lowercased, whitespace collapsed). md5 is reproducible in any
    engine, unlike Spark's Murmur3 ``hash``. Used as the grouping key
    for exact near-normalization dedup.
    """
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(normalized)


def char_entropy_bits(text: Column, chars_col: Column) -> Column:
    """Shannon entropy (bits) of the character unigram distribution.

    ``chars_col`` MUST be a staged projected column holding
    ``F.split(text, '')`` (HOF-staging rule — see shingle_hashes): the
    per-character count filter references it once per distinct char.

    Fold order is pinned by sorting the distinct-char array (binary
    codepoint order in both engines), so the float sum is the same IEEE
    sequence the DuckDB oracle computes. Blank text → 0.0.
    """
    n = F.size(chars_col).cast("double")
    counts = F.transform(
        F.array_sort(F.array_distinct(chars_col)),
        lambda c: F.size(F.filter(chars_col, lambda x: x == c)),
    )
    ent = -F.aggregate(
        counts,
        F.lit(0.0),
        lambda acc, cnt: acc
        + (cnt.cast("double") / n) * F.log2(cnt.cast("double") / n),
    )
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(ent)
