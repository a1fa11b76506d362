"""Distributed PCA (operators/similarity.embedding_moment_sums +
top_pc_power_iteration): the moment pass is exact integer arithmetic,
the bounded driver eigensolve must actually find the top eigenvector
(pinned against numpy eigh), and the composed catalog query stays
engine-portable (tests/test_oracle_parity.py holds the DuckDB twin)."""

from __future__ import annotations

import numpy as np

from pyspark_data_processing_challenge_spark.operators import similarity as sim
from tests.conftest import SF_DIR


def _emb_matrix(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = df.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r.vec_id)
    return np.array([r.embedding for r in rows], dtype=np.float64)


def test_moment_sums_are_exact_integers(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = sim.embedding_moment_sums(emb).collect()
    d = 64
    assert len(rows) == d * (d + 1) // 2 + d + 1
    X = _emb_matrix(spark)
    q = np.floor(X * 2**20).astype(np.int64)
    got = {(r.i, r.j): r.s for r in rows}
    assert got[(-1, -1)] == len(q)
    # exact first and second moments at spot-checked coordinates
    assert got[(0, -1)] == int(q[:, 0].sum())
    assert got[(0, 0)] == int((q[:, 0] * q[:, 0]).sum())
    assert got[(3, 17)] == int((q[:, 3] * q[:, 17]).sum())
    # upper triangle only
    assert (17, 3) not in got


def test_power_iteration_matches_numpy_eigh(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = sim.embedding_moment_sums(emb).collect()
    out = sim.top_pc_power_iteration(rows)
    assert len(out) == 64
    X = _emb_matrix(spark)
    q = np.floor(X * 2**20)
    C = q.T @ q / len(q) - np.outer(q.mean(0), q.mean(0))
    w, V = np.linalg.eigh(C)
    v_np = V[:, -1]
    if v_np[0] < 0:
        v_np = -v_np
    v_pi = np.array([t[1] for t in out])
    # the corpus eigen-gap is ~1.07 — 128 iterations converge past 1e-4
    assert abs(float(v_np @ v_pi)) > 0.9999
    assert abs(out[0][2] - w[-1] / 2**40) / (w[-1] / 2**40) < 1e-4
    # explained ratio consistent with the spectrum
    assert abs(out[0][3] - w[-1] / w.sum()) < 1e-4
    # sign convention + unit norm
    assert v_pi[0] >= 0
    assert abs(float(v_pi @ v_pi) - 1.0) < 1e-9


def test_power_iteration_degenerate_inputs():
    assert sim.top_pc_power_iteration([]) == []
    assert sim.top_pc_power_iteration([(-1, -1, 0)]) == []
    # all-identical vectors -> zero covariance: no principal direction
    # exists; both solvers must return a defined empty result instead
    # of ZeroDivisionError (ADVICE r12). n=3 copies of quantized [2, 3]:
    zero_cov = [
        (-1, -1, 3),  # n
        (0, -1, 6), (1, -1, 9),  # S_i = n * v_i
        (0, 0, 12), (0, 1, 18), (1, 1, 27),  # M_ij = n * v_i * v_j
    ]
    assert sim.top_pc_power_iteration(zero_cov) == []
    assert sim.top_k_pcs_power_iteration(zero_cov, k=2) == []
    # a missing moment row (ragged input) behaves like a zero sum, not
    # a KeyError; result stays defined
    ragged = [
        (-1, -1, 2),
        (0, -1, 3), (1, -1, 1),
        (0, 0, 7),  # (0,1) and (1,1) absent
    ]
    out = sim.top_pc_power_iteration(ragged)
    assert len(out) == 2 and all(len(t) == 4 for t in out)
    # deflating past the matrix rank stops early with the found
    # components rather than dividing by a zero norm: rank-1 moments
    # (vectors [1,0] and [3,0] -> variance only in dim 0)
    rank1 = [
        (-1, -1, 2),
        (0, -1, 4), (1, -1, 0),
        (0, 0, 10), (0, 1, 0), (1, 1, 0),
    ]
    out2 = sim.top_k_pcs_power_iteration(rank1, k=3)
    comps = {t[0] for t in out2}
    assert comps == {1}, comps


def test_incremental_moments_equal_full_bitforbit(spark):
    """The moment store folded batch-by-batch must equal one full
    recompute ROW-FOR-ROW (exact integer associativity) — and the top
    PC solved from the incremental store must be identical floats."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    store = sim.embedding_moment_sums(base)
    inc = sim.incremental_moment_sums(batch, store)
    full = sim.embedding_moment_sums(emb)
    as_map = lambda d: {(r.i, r.j): r.s for r in d.collect()}  # noqa: E731
    m_inc, m_full = as_map(inc), as_map(full)
    assert m_inc == m_full
    pc_inc = sim.top_pc_power_iteration(sorted((i, j, s) for (i, j), s in m_inc.items()))
    pc_full = sim.top_pc_power_iteration(sorted((i, j, s) for (i, j), s in m_full.items()))
    assert pc_inc == pc_full


def test_deflation_matches_numpy_eigh_topk(spark):
    """top_k_pcs_power_iteration must recover the top-3 eigenpairs of
    the centered quantized covariance (gap-limited convergence: the
    corpus's 4th gap is too tight for k=4 at 256 iterations — the
    documented reason the catalog query stops at 3)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = sim.embedding_moment_sums(emb).collect()
    out = sim.top_k_pcs_power_iteration(rows, k=3, iters=256)
    assert len(out) == 3 * 64
    X = _emb_matrix(spark)
    q = np.floor(X * 2**20)
    C = q.T @ q / len(q) - np.outer(q.mean(0), q.mean(0))
    w, V = np.linalg.eigh(C)
    for comp in range(1, 4):
        v_pi = np.array([t[2] for t in out if t[0] == comp])
        cos = abs(float(V[:, -comp] @ v_pi))
        assert cos > 0.999, (comp, cos)
        eig = next(t[3] for t in out if t[0] == comp)
        ref = w[-comp] / 2**40
        assert abs(eig - ref) / ref < 1e-3, (comp, eig, ref)
    # orthogonality of the recovered components
    vs = [np.array([t[2] for t in out if t[0] == c]) for c in (1, 2, 3)]
    assert abs(float(vs[0] @ vs[1])) < 1e-2
    assert abs(float(vs[1] @ vs[2])) < 1e-2


def test_group_pca_closed_form_matches_numpy(spark):
    """The closed-form 2x2 eigensolve must agree with numpy eigh on
    each label's projected covariance (math pin — the oracle match
    alone would also pass if both engines were wrong the same way).
    Unlike the dropped per-source power iteration, there is NO
    gap-dependence caveat: the closed form is exact at any gap."""
    from pyspark_data_processing_challenge_spark.queries import advanced as adv

    got = {
        r.label: r
        for r in adv.embedding_group_pca(spark, SF_DIR).collect()
    }
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    rows = adv._pca_full_rows(spark, SF_DIR)
    out = sim.top_k_pcs_power_iteration(
        rows, k=adv.PCA_K, iters=adv.PCA_K_ITERS,
        scale_bits=adv.PCA_SCALE_BITS,
    )
    n = next(int(r[2]) for r in rows if int(r[0]) == -1)
    S = {int(r[0]): int(r[2]) for r in rows if int(r[0]) >= 0 and int(r[1]) == -1}
    d = max(S) + 1
    mu = np.array([(S[i] / n) / 2**adv.PCA_SCALE_BITS for i in range(d)])
    vs = [np.array([t[2] for t in out if t[0] == c]) for c in (1, 2)]
    bylab: dict[int, list] = {}
    for r in emb:
        x = np.array(r.embedding, dtype=np.float64)
        q = [
            int(np.floor(float((x - mu) @ v) * 2**adv.GP_SCALE_BITS))
            for v in vs
        ]
        bylab.setdefault(int(r.label), []).append(q)
    for lab, qs in bylab.items():
        Q = np.array(qs, dtype=np.float64)
        C = (Q.T @ Q) / len(Q) - np.outer(Q.mean(0), Q.mean(0))
        w, V = np.linalg.eigh(C)
        r = got[lab]
        assert r.n_vecs == len(qs)
        dq = 2 ** (2 * adv.GP_SCALE_BITS)
        assert abs(r.lam1 - w[1] / dq) < 1e-4 * max(1.0, abs(w[1] / dq))
        assert abs(r.lam2 - w[0] / dq) < 1e-4 * max(1.0, abs(w[0] / dq))
        v_np = V[:, 1]
        v_got = np.array([r.v1_p1, r.v1_p2])
        assert abs(abs(float(v_np @ v_got)) - 1.0) < 1e-6, (lab, v_np, v_got)
