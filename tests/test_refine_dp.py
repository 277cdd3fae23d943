"""Indel-refine DP kernel vs a literal 3-matrix oracle.

The oracle transcribes the reference's IndelRefineAlignment recurrence
(reference: IndelRefine.h:339-612) cell by cell: linear single-step gaps
plus affine lanes (gapOpen = 2*indel+1, gapExtend = 0), main tie order
match > ins > del > delClose > insClose, open-over-extend lane ties, and
lane-aware traceback.  The banded kernel (ops/affine_kernel.py:
_refine_arrows / banded_refine_np) must reproduce its blocks exactly
whenever the band covers the optimum.
"""

import numpy as np
import pytest

from lra_tpu.ops.affine_kernel import (banded_refine_np,
                                       banded_refine_traced_packed,
                                       blocks_from_ops_batch,
                                       traceback_refine, unpack_ops)

BAD = -10 ** 9


def oracle_refine(q, t, m, mm, indel):
    """Unbanded reference-style 3-matrix DP on the SHIFTED window
    (first base already force-paired by the caller)."""
    open_ = 2 * indel + 1
    Q, T = len(q), len(t)
    S = np.full((T + 1, Q + 1), BAD, np.int64)
    D = np.full((T + 1, Q + 1), BAD, np.int64)
    I = np.full((T + 1, Q + 1), BAD, np.int64)
    Sp = np.full((T + 1, Q + 1), -1, np.int8)    # 0=diag 1=left 2=down
    Dp = np.zeros((T + 1, Q + 1), bool)          # True = open
    Ip = np.zeros((T + 1, Q + 1), bool)
    DIAG, LEFT, DOWN, DELC, INSC = 0, 1, 2, 4, 5
    S[0, 0] = 0
    for i in range(1, Q + 1):
        S[0, i] = indel * i
        Sp[0, i] = LEFT
    for j in range(1, T + 1):
        for i in range(1, Q + 1):
            d_open = S[j - 1, i] + open_ if S[j - 1, i] > BAD else BAD
            d_ext = D[j - 1, i]
            D[j, i] = max(d_open, d_ext)
            Dp[j, i] = D[j, i] == d_open
            i_open = S[j, i - 1] + open_ if S[j, i - 1] > BAD else BAD
            i_ext = I[j, i - 1]
            I[j, i] = max(i_open, i_ext)
            Ip[j, i] = I[j, i] == i_open
            sub = m if q[i - 1] == t[j - 1] else mm
            mat = S[j - 1, i - 1] + sub if S[j - 1, i - 1] > BAD else BAD
            ins = S[j, i - 1] + indel if S[j, i - 1] > BAD else BAD
            dele = S[j - 1, i] + indel if S[j - 1, i] > BAD else BAD
            best = max(mat, ins, dele, D[j, i], I[j, i])
            S[j, i] = best
            if best == mat:
                Sp[j, i] = DIAG
            elif best == ins:
                Sp[j, i] = LEFT
            elif best == dele:
                Sp[j, i] = DOWN
            elif best == D[j, i]:
                Sp[j, i] = DELC
            else:
                Sp[j, i] = INSC
    # lane-aware traceback
    i, j, lane = Q, T, 0
    ops = []
    while i > 0 or j > 0:
        if lane == 1 or (lane == 0 and Sp[j, i] == DELC):
            ops.append("D")
            lane = 0 if Dp[j, i] else 1
            j -= 1
        elif lane == 2 or (lane == 0 and Sp[j, i] == INSC):
            ops.append("I")
            lane = 0 if Ip[j, i] else 2
            i -= 1
        elif Sp[j, i] == DIAG:
            ops.append("=")
            i -= 1
            j -= 1
        elif Sp[j, i] == LEFT:
            ops.append("I")
            i -= 1
        elif Sp[j, i] == DOWN:
            ops.append("D")
            j -= 1
        else:
            raise AssertionError((i, j, lane))
    blocks = []
    qp = tp = 0
    run = 0
    for op in ops[::-1]:
        if op == "=":
            run += 1
            qp += 1
            tp += 1
        else:
            if run:
                blocks.append((qp - run, tp - run, run))
                run = 0
            if op == "I":
                qp += 1
            else:
                tp += 1
    if run:
        blocks.append((qp - run, tp - run, run))
    return int(S[T, Q]), blocks


def run_np(q, t, m, mm, indel, K):
    qa = q.reshape(1, -1).astype(np.int8)
    ta = t.reshape(1, -1).astype(np.int8)
    ql = np.array([len(q)], np.int32)
    tl = np.array([len(t)], np.int32)
    kb = np.array([K], np.int32)
    score, planes = banded_refine_np(qa, ta, ql, tl, K, m, mm, indel, kb)
    blocks = traceback_refine(planes[0], len(q), len(t), K)
    return int(score[0]), blocks


def run_device(q, t, m, mm, indel, K, pad=0):
    import jax.numpy as jnp

    S = len(q) + pad
    S2 = len(t) + pad
    while (S + S2) % 4:
        S += 1
    qa = np.full((1, S), 4, np.int8)
    ta = np.full((1, S2), 4, np.int8)
    qa[0, :len(q)] = q
    ta[0, :len(t)] = t
    packed = banded_refine_traced_packed(
        jnp.asarray(qa), jnp.asarray(ta),
        jnp.asarray([len(q)], jnp.int32), jnp.asarray([len(t)], jnp.int32),
        K, m, mm, indel, kband=jnp.asarray([K], jnp.int32))
    ops = unpack_ops(np.asarray(packed), mark_term=False)
    return blocks_from_ops_batch(ops)[0]


CASES = [
    # 2-base deletion split by a matching base: affine merges to one 2D
    ("ACGTACGTAA", "ACGTAGCGTAA" + ""),          # 1 ins in t (1D)
]


def _codes(s):
    return np.frombuffer(s.encode(), np.uint8).copy() % 5


def test_two_base_del_merges():
    """2-base deletion in a homopolymer: the linear DP ties between
    1D1=1D and 2D (both all-match elsewhere); the refine DP's single
    open (-7) strictly beats two linear dels (-8), so the gap must come
    out consolidated."""
    rng = np.random.default_rng(0)
    t = rng.integers(0, 4, 40).astype(np.int8)
    t[19:24] = 2                       # homopolymer run
    q = np.delete(t, [20, 21]).astype(np.int8)
    m, mm, indel = 4, -3, -4
    sc, blocks = oracle_refine(q, t, m, mm, indel)
    # all q bases match; score = matches + one 2-base open
    assert sc == len(q) * m + (2 * indel + 1)
    # one consolidated 2-base target gap: exactly two blocks
    assert len(blocks) == 2, blocks
    (q0, t0, l0), (q1, t1, l1) = blocks
    assert t1 - (t0 + l0) == 2 and q1 == q0 + l0
    sc_np, blocks_np = run_np(q, t, m, mm, indel, K=8)
    assert sc_np == sc
    assert blocks_np == blocks
    assert run_device(q, t, m, mm, indel, K=8, pad=2) == blocks


def test_single_base_gap_stays_linear():
    rng = np.random.default_rng(1)
    t = rng.integers(0, 4, 30).astype(np.int8)
    q = np.delete(t, [15]).astype(np.int8)
    sc, blocks = oracle_refine(q, t, 4, -3, -4)
    assert len(blocks) == 2
    sc_np, blocks_np = run_np(q, t, 4, -3, -4, K=6)
    assert (sc_np, blocks_np) == (sc, blocks)
    assert run_device(q, t, 4, -3, -4, K=6, pad=3) == blocks


@pytest.mark.parametrize("seed", range(8))
def test_random_equivalence(seed):
    """Random mutated windows: banded kernel == oracle blocks and score
    (band wide enough to cover the optimum)."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(20, 90))
    t = rng.integers(0, 4, n).astype(np.int8)
    q = t.copy().tolist()
    # random edits
    for _ in range(int(rng.integers(1, 6))):
        kind = rng.integers(0, 3)
        pos = int(rng.integers(1, len(q) - 1))
        if kind == 0:
            q[pos] = int(rng.integers(0, 4))
        elif kind == 1 and len(q) > 10:
            del q[pos:pos + int(rng.integers(1, 4))]
        else:
            q[pos:pos] = [int(rng.integers(0, 4))
                          for _ in range(int(rng.integers(1, 4)))]
    q = np.asarray(q, np.int8)
    for m, mm, indel in ((4, -3, -4), (4, -1, -2)):
        sc, blocks = oracle_refine(q, t, m, mm, indel)
        K = max(16, abs(len(q) - len(t)) + 12)
        sc_np, blocks_np = run_np(q, t, m, mm, indel, K)
        assert sc_np == sc, (seed, m, sc_np, sc)
        assert blocks_np == blocks, (seed, m)
        assert run_device(q, t, m, mm, indel, K,
                          pad=int(rng.integers(0, 5))) == blocks, (seed, m)


def test_row0_insertions_and_empty():
    # pure insertion window (t empty after shift) and pure match
    q = np.array([0, 1, 2, 3], np.int8)
    t = np.array([0, 1, 2, 3], np.int8)
    sc, blocks = oracle_refine(q, t, 4, -3, -4)
    assert blocks == [(0, 0, 4)] and sc == 16
    sc_np, blocks_np = run_np(q, t, 4, -3, -4, K=4)
    assert (sc_np, blocks_np) == (sc, blocks)
