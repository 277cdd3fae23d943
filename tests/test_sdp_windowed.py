"""Windowed large-N chaining kernel vs the exact oracle.

Validates VERDICT r1 item 4: per-step-bounded chaining whose scores match
the exact O(N^2) semantics (chain_scores_np / the blocked kernel) — exact
when the window covers all predecessors, never overestimating and
top-chain-exact on realistic contig-like instances when it does not.
"""

import numpy as np
import pytest

from lra_tpu import preset
from lra_tpu.ops.gapcost import from_options, pwl_np
from lra_tpu.ops.sdp_windowed import (chain_scores_windowed, far_schedule,
                                      resolve_far_np)


def oracle(qS, qE, tS, tE, sc, l1, l2, gp):
    """Vectorized-per-row exact DP (same semantics as chain_scores_np,
    fast enough for N in the thousands)."""
    n = len(qS)
    d1s, d1e = tS - qS, tE - qE
    d2s, d2e = tE + qS, tS + qE
    V = np.full(n, -3.0e38)
    bp = np.full(n, -1, np.int64)
    for i in range(n):
        vis = qE <= qS[i]
        m1 = vis & (tE <= tS[i]) & l1 & l1[i]
        m2 = vis & (tS >= tE[i]) & l2 & l2[i]
        c1 = np.where(m1, V - pwl_np(np.abs(d1s[i] - d1e) + 1, gp), -3e38)
        c2 = np.where(m2, V - pwl_np(np.abs(d2s[i] - d2e) + 1, gp), -3e38)
        cand = np.maximum(c1, c2)
        best = cand.max() if n else 0.0
        if best > 0:
            V[i] = sc[i] + best
            bp[i] = int(np.argmax(cand))
        else:
            V[i] = sc[i]
    return V, bp


def run_windowed(qS, qE, tS, tE, sc, l1, l2, gp, L=32, W=256):
    n = len(qS)
    N = ((n + L - 1) // L) * L
    valid = np.zeros(N, bool)
    valid[:n] = True

    def pad(a, fill=0, dtype=np.int32):
        out = np.full(N, fill, dtype)
        out[:n] = a
        return out

    s = far_schedule(qS, qE, tS, tE, l1, l2, np.ones(n, bool), L)
    nb = N // L
    sch = dict(
        perm1=pad(s["perm1"]), perm2=pad(s["perm2"]),
        ok1=pad(s["ok1"], False, bool), ok2=pad(s["ok2"], False, bool),
        qer1=pad(s["qer1"], 2 ** 30), qer2=pad(s["qer2"], 2 ** 30),
        rank1=pad(s["rank1"]), rank2=pad(s["rank2"]))
    ins_hi = np.zeros(nb, np.int32)
    ins_hi[:len(s["ins_hi"])] = s["ins_hi"]
    args = [pad(qS), pad(qE, 2 ** 30), pad(tS), pad(tE),
            pad(sc, 0, np.float32), pad(l1, False, bool),
            pad(l2, False, bool), valid,
            sch["perm1"], sch["perm2"], sch["ok1"], sch["ok2"],
            sch["qer1"], sch["qer2"], sch["rank1"], sch["rank2"], ins_hi]
    args = [a[None] for a in args]
    V, bp, lane = chain_scores_windowed(*args, gp.static_key(), L=L, W=W)
    return (np.asarray(V)[0, :n], np.asarray(bp)[0, :n],
            np.asarray(lane)[0, :n])


def random_instance(rng, n, span=200000, both_lanes=True):
    ln = rng.integers(15, 60, n)
    qS = np.sort(rng.integers(0, span, n)).astype(np.int64)
    tS = (qS + rng.integers(-2000, 2000, n)).clip(0).astype(np.int64)
    jump = rng.random(n) < 0.05
    tS[jump] = rng.integers(0, span, jump.sum())
    qE, tE = qS + ln, tS + ln
    sc = ln.astype(np.float32) * 2.0
    if both_lanes:
        l1 = np.ones(n, bool)
        l2 = np.ones(n, bool)
    else:
        l1 = rng.random(n) < 0.7
        l2 = ~l1
    return qS, qE, tS, tE, sc, l1, l2


@pytest.mark.parametrize("n,seed", [(50, 0), (180, 1), (500, 2)])
def test_exact_when_window_covers(n, seed):
    """W >= N: the windowed kernel must reproduce the oracle exactly."""
    rng = np.random.default_rng(seed)
    gp = from_options(preset("ccs"))
    inst = random_instance(rng, n, both_lanes=bool(seed % 2))
    Vo, _ = oracle(*inst, gp)
    Vw, bp, lane = run_windowed(*inst, gp, L=32, W=512)
    np.testing.assert_allclose(Vw, Vo, rtol=1e-5, atol=1.0)


def test_never_overestimates_small_window():
    rng = np.random.default_rng(7)
    gp = from_options(preset("ccs"))
    inst = random_instance(rng, 600)
    Vo, _ = oracle(*inst, gp)
    Vw, _, _ = run_windowed(*inst, gp, L=32, W=64)
    assert np.all(Vw <= Vo + 1.0)


def test_realistic_contig_small_window_top_chain():
    """Contig-like geometry (diagonal runs + SV jumps): a window far
    smaller than N still recovers the exact top chain value."""
    rng = np.random.default_rng(11)
    gp = from_options(preset("contig"))
    parts = []
    q = 0
    t = 5000
    for seg in range(6):
        m = 300
        ln = rng.integers(20, 80, m)
        dq = np.sort(rng.integers(0, 30000, m))
        qS = q + dq
        tS = t + dq + rng.integers(-40, 40, m)
        parts.append((qS, qS + ln, tS, tS + ln))
        q += 31000
        t += 31000 + int(rng.integers(-3000, 60000))  # SV jumps
    qS = np.concatenate([p[0] for p in parts]).astype(np.int64)
    qE = np.concatenate([p[1] for p in parts]).astype(np.int64)
    tS = np.concatenate([p[2] for p in parts]).astype(np.int64)
    tE = np.concatenate([p[3] for p in parts]).astype(np.int64)
    o = np.argsort(qS, kind="stable")
    qS, qE, tS, tE = qS[o], qE[o], tS[o], tE[o]
    sc = (qE - qS).astype(np.float32)
    l1 = np.ones(len(qS), bool)
    l2 = np.ones(len(qS), bool)
    Vo, _ = oracle(qS, qE, tS, tE, sc, l1, l2, gp)
    Vw, bp, lane = run_windowed(qS, qE, tS, tE, sc, l1, l2, gp,
                                L=32, W=256)
    assert np.all(Vw <= Vo + 1.0)
    np.testing.assert_allclose(Vw.max(), Vo.max(), rtol=1e-5, atol=1.0)


def test_adversarial_repeat_dense_density_guard():
    """VERDICT r2 item 6: repeat-dense instance (satellite-array decoy
    cloud) where a true predecessor is >W ranks back in q yet
    diag-unsaturated — missed by the base near window, under-charged by
    the saturated far term.  Quantifies the chain-value loss at the base
    W and shows the driver's density guard (chain/driver.py:_windowed_W)
    escalates W so the loss vanishes."""
    from lra_tpu.chain.driver import SPLIT_SPAN, _windowed_W

    rng = np.random.default_rng(19)
    gp = from_options(preset("contig"))
    sat = len(gp.table)          # diag distance where the PWL saturates
    # true chain: colinear anchors every 60bp, diag 100
    n_true = 400
    qT = np.arange(n_true, dtype=np.int64) * 60
    tT = qT + 100
    # satellite decoy cloud: 1200 anchors packed into the 59bp q-gap
    # between two adjacent true anchors, each on a distant (saturated)
    # diagonal — so the true edge across the cloud is >W ranks long in q
    # while being diag-unsaturated (cost ~free)
    n_dec = 1200
    mid = qT[n_true // 2]
    qD = mid + 1 + rng.integers(0, 58, n_dec).astype(np.int64)
    tD = qD + sat + rng.integers(10**6, 2 * 10**6, n_dec).astype(np.int64)
    ln = 50
    qS = np.concatenate([qT, qD])
    tS = np.concatenate([tT, tD])
    o = np.argsort(qS, kind="stable")
    qS, tS = qS[o], tS[o]
    qE, tE = qS + ln, tS + ln
    sc = np.where(tS > 10**6, 10.0, 120.0).astype(np.float32)  # decoys weak
    l1 = np.ones(len(qS), bool)
    l2 = np.zeros(len(qS), bool)

    # density check: the cloud packs ~1600 fragments into one 50k q-span
    W_esc = _windowed_W(qS, base=64, cap=4096)
    assert W_esc >= 2048, W_esc

    Vo, _ = oracle(qS, qE, tS, tE, sc, l1, l2, gp)
    Vw64, _, _ = run_windowed(qS, qE, tS, tE, sc, l1, l2, gp, L=32, W=64)
    # base window: never overestimates, and the miss is REAL — the chain
    # crossing the cloud loses (far term charges ceiling2 for a
    # diag-unsaturated true edge)
    assert np.all(Vw64 <= Vo + 1.0)
    loss64 = float((Vo - Vw64).max())
    assert loss64 > 10.0, loss64

    Vwg, _, _ = run_windowed(qS, qE, tS, tE, sc, l1, l2, gp, L=32, W=W_esc)
    np.testing.assert_allclose(Vwg, Vo, rtol=1e-5, atol=1.0)


def test_windowed_W_guard_basic():
    from lra_tpu.chain.driver import SPLIT_SPAN, WIN_W, WIN_WMAX, _windowed_W

    # sparse problem: density below base -> base W
    qS = np.arange(100_000, dtype=np.int64) * 1000
    assert _windowed_W(qS) == WIN_W
    # everything in one span -> escalates, capped
    qS = np.sort(np.random.default_rng(0).integers(
        0, SPLIT_SPAN // 2, 40_000)).astype(np.int64)
    assert _windowed_W(qS) == WIN_WMAX
    assert _windowed_W(np.array([], dtype=np.int64)) == WIN_W


def test_far_sentinel_resolution():
    """Predecessor outside the window at saturated diag distance: the far
    term must chain across it and the host must resolve the sentinel."""
    rng = np.random.default_rng(3)
    gp = from_options(preset("ccs"))
    sat = len(gp.table)  # diag distance with penalty == ceiling2
    m = 200
    ln = np.full(m, 50)
    qS1 = np.arange(m, dtype=np.int64) * 60
    tS1 = qS1 + 100
    qS2 = qS1 + m * 60 + 1000
    tS2 = qS2 + 100 + sat + 100000   # saturated jump
    qS = np.concatenate([qS1, qS2])
    tS = np.concatenate([tS1, tS2])
    qE = qS + 50
    tE = tS + 50
    sc = np.full(2 * m, 120.0, np.float32)
    l1 = np.ones(2 * m, bool)
    l2 = np.zeros(2 * m, bool)
    Vw, bp, lane = run_windowed(qS, qE, tS, tE, sc, l1, l2, gp,
                                L=32, W=64)
    Vo, _ = oracle(qS, qE, tS, tE, sc, l1, l2, gp)
    np.testing.assert_allclose(Vw, Vo, rtol=1e-5, atol=1.0)
    # chain from the top fragment must cross into the first run
    i = int(np.argmax(Vw))
    seen = set()
    while i >= 0 and i not in seen:
        seen.add(i)
        j = int(bp[i])
        if j < -1:
            j = resolve_far_np(i, qS, qE, tS, tE, Vw, l1, l2,
                               np.ones(2 * m, bool),
                               1 if j == -2 else 2, L=32)
        i = j
    assert any(x < m for x in seen) and any(x >= m for x in seen)
