"""Bloom-filter semi-join pruning (runtime-filter pattern).

The 100 TB shuffle-reduction primitive: before a big fact⨝dim join,
build a compact bit-set from the dim keys and drop fact rows that
cannot match — most of the fact table never reaches the join shuffle.
This mirrors what Spark's own `spark.sql.optimizer.runtimeFilter.*`
injects, but as an explicit, oracle-verifiable operator:

- BUILD: one aggregation over the (small) dim side produces a
  ``(word, bits)`` table of ``M_BITS/WORD_BITS`` rows (16 KiB at the
  default 64 Kbit) — broadcastable at any scale.
- PROBE: K broadcast hash joins against that table, one per hash
  function, then a pure projection testing the K bits. The fact side
  is never exploded, never shuffled — probe cost is map-side only.

Hash family: ``pos_k = (a_k * key + b_k) mod p mod M_BITS`` with the
shared LCG coefficients (functions/textfns.minhash_coeffs), so a SQL
oracle reproduces the filter bit-for-bit. Words are 32-bit (packed in
BIGINTs) to keep every mask positive — no sign-bit divergence between
engines.

Guarantee: no false negatives (every true match passes); false
positives are bounded by the classic ``(1 - e^{-K n / M})^K`` rate and
are removed by the exact join that follows the prune.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textfns import MINHASH_P, minhash_coeffs

K_HASHES = 5
M_BITS = 1 << 16
WORD_BITS = 32
BLOOM_SEED = 131


def _pos(key: Column, a: int, b: int) -> Column:
    # key reduces mod p BEFORE the affine map: a < 2^31 and pmod(key,p)
    # < 2^31 keep a*key under 2^62 — no silent 64-bit overflow for key
    # domains beyond 2^32 (surrogate ids at real scale). pmod, not %:
    # Spark's % keeps the dividend's sign, so a NEGATIVE key (legal in
    # an arbitrary surrogate-id domain) would yield a negative position
    # — a guaranteed join miss where the numpy probe UDF (whose % is
    # already non-negative for a positive divisor) probes a real bit,
    # breaking the two paths' bit-identity (r15 advice). After the pmod
    # the remaining operands are non-negative, so plain % is safe.
    return (
        (F.lit(a) * F.pmod(key, F.lit(MINHASH_P)) + F.lit(b))
        % F.lit(MINHASH_P)
    ) % F.lit(M_BITS)


def build_bloom(dim: DataFrame, key_col: str) -> DataFrame:
    """Aggregate the dim side's keys into the packed bit-set table
    ``(w, bits)``. One pass, output rows = M_BITS/WORD_BITS."""
    coeffs = minhash_coeffs(K_HASHES, seed=BLOOM_SEED)
    key = F.col(key_col).cast("long")
    pos = dim.select(
        F.explode(F.array(*[_pos(key, a, b) for a, b in coeffs])).alias("pos")
    )
    # pyspark's shiftleft/shiftright helpers only accept literal shift
    # amounts — the SQL forms take column expressions
    return pos.select(
        F.expr(f"pos div {WORD_BITS}").alias("w"),
        F.expr(
            f"shiftleft(cast(1 as bigint), cast(pos % {WORD_BITS} as int))"
        ).alias("mask"),
    ).groupBy("w").agg(F.bit_or("mask").alias("bits"))


def bloom_probe(
    fact: DataFrame, words: DataFrame, key_col: str, *, out_col: str = "bloom_pass"
) -> DataFrame:
    """Append ``out_col``: True iff all K filter bits for the fact key
    are set. K broadcast joins + a projection — zero fact-side shuffle,
    no explode. Filter on the column, then run the exact join on the
    survivors."""
    coeffs = minhash_coeffs(K_HASHES, seed=BLOOM_SEED)
    key = F.col(key_col).cast("long")
    out = fact
    for k, (a, b) in enumerate(coeffs):
        out = out.withColumn(f"__bp{k}", _pos(key, a, b))
    hits = []
    for k in range(K_HASHES):
        wtab = words.select(
            F.col("w").alias(f"__bw{k}"), F.col("bits").alias(f"__bb{k}")
        )
        out = out.join(
            F.broadcast(wtab),
            F.expr(f"__bp{k} div {WORD_BITS}") == F.col(f"__bw{k}"),
            "left",
        )
        mask = F.expr(
            f"shiftleft(cast(1 as bigint), cast(__bp{k} % {WORD_BITS} as int))"
        )
        hits.append(
            F.coalesce(F.col(f"__bb{k}"), F.lit(0)).bitwiseAND(mask) != 0
        )
    acc = hits[0]
    for h in hits[1:]:
        acc = acc & h
    drop = [
        c
        for c in out.columns
        if c.startswith("__bw") or c.startswith("__bb") or c.startswith("__bp")
    ]
    return out.withColumn(out_col, acc).drop(*drop)


def bloom_probe_udf(words: list[tuple[int, int]]):
    """Arrow-batched probe against a COLLECTED word table — the
    per-micro-batch form of :func:`bloom_probe` for streaming sinks,
    where re-planning K broadcast word-joins every epoch re-executes
    the words frame's lineage per batch (the semdedup_ingest_sink
    codebook lesson). ``words`` is the collected ``(w, bits)`` table —
    {M_BITS//WORD_BITS} rows, bounded by construction (the
    codebook-collect class of driver materialization).

    BIT-IDENTICAL to the join path: same coeffs, same integer
    arithmetic (``a < 2^31`` and ``key % p < 2^31`` keep products
    under 2^62 — no int64 overflow in numpy either), only the word
    lookup moves from joins to a dense int64 gather. NULL keys (e.g.
    an explode_outer'd empty document) return NULL, matching
    char_hash-of-NULL flowing through the join path's left joins."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    coeffs = minhash_coeffs(K_HASHES, seed=BLOOM_SEED)
    arr = np.zeros(M_BITS // WORD_BITS, dtype=np.int64)
    for w, bits in words:
        arr[int(w)] = int(bits)

    @pandas_udf("boolean")
    def probe(key):
        import pandas as pd

        null = key.isna()
        k = key.fillna(0).to_numpy(dtype=np.int64) % MINHASH_P
        acc = np.ones(len(k), dtype=bool)
        for a, b in coeffs:
            pos = ((a * k + b) % MINHASH_P) % M_BITS
            acc &= (arr[pos // WORD_BITS] >> (pos % WORD_BITS)) & 1 != 0
        out = pd.Series(acc, index=key.index, dtype=object)
        out[null] = None
        return out

    return probe
