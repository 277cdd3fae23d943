import numpy as np
import jax.numpy as jnp
import pytest

from lra_tpu.ops.gapcost import (GapParams, STOPS, from_options,
                                 gap_cost_np, make_gap_params, pwl_jnp, pwl_np)
from lra_tpu.ops.sdp import chain_scores, chain_scores_np, traceback
from lra_tpu import preset


@pytest.fixture(scope="module")
def gp():
    return make_gap_params(4.0, 15.0, 1.5, 2000, 3000)


def brute_pwl(x, gap_extend, gap_root, c1, c2):
    """Literal transcription of PWL_w semantics for cross-checking."""
    if x <= 2:
        return 0.0
    vals = [0.0] + [gap_extend * s ** (1.0 / gap_root) for s in STOPS[1:]]
    b = int(np.searchsorted(STOPS, x, side="right"))  # upper_bound index
    i = min(b - 1, len(STOPS) - 2)
    if STOPS[i] <= 10:
        return 0.0
    slope = (vals[i + 1] - vals[i]) / (STOPS[i + 1] - STOPS[i])
    inter = vals[i] - STOPS[i] * slope
    pen = float(int(slope * x + inter))
    if c1 <= pen < c2:
        return float(c1)
    if pen > c2:
        return float(c2)
    return pen


def test_pwl_matches_brute(gp):
    xs = np.array([1, 2, 3, 5, 10, 11, 20, 21, 40, 99, 100, 101, 500, 999,
                   1000, 4999, 9000, 14999, 50000, 99999, 100000, 200000])
    got = pwl_np(xs, gp)
    want = np.array([brute_pwl(int(x), 15.0, 1.5, 2000, 3000) for x in xs])
    np.testing.assert_allclose(got, want)


def test_pwl_free_region(gp):
    # pieces with left breakpoint <= 10 are zeroed; piece (10,20) is free,
    # x=20 falls in piece [20,40) which is sloped (upper_bound semantics)
    assert pwl_np(np.arange(0, 20), gp).max() == 0.0
    assert pwl_np(np.array([20]), gp)[0] > 0


def test_pwl_ceilings(gp):
    big = pwl_np(np.array([100000, 1000000]), gp)
    assert (big == 3000.0).all()


def test_pwl_jnp_matches_np(gp):
    xs = np.unique(np.concatenate([
        np.arange(1, 300),
        np.random.default_rng(0).integers(1, 200000, 500),
    ])).astype(np.int32)
    got = np.asarray(pwl_jnp(jnp.asarray(xs), jnp.asarray(gp.slope),
                             jnp.asarray(gp.inter), gp.ceiling1, gp.ceiling2))
    np.testing.assert_allclose(got, pwl_np(xs, gp))


def random_fragments(rng, n, span=20000, both_lanes=True):
    qS = np.sort(rng.integers(0, span, n)).astype(np.int64)
    length = rng.integers(20, 300, n)
    qE = qS + length
    tS = (qS + rng.integers(-400, 400, n) + 5000).astype(np.int64)
    tE = tS + length
    score = (length * 2.0).astype(np.float32)
    if both_lanes:
        lane1 = np.ones(n, bool)
        lane2 = np.ones(n, bool)
    else:
        strand = rng.random(n) < 0.5
        lane1, lane2 = ~strand, strand
    valid = np.ones(n, bool)
    return qS, qE, tS, tE, score, lane1, lane2, valid


@pytest.mark.parametrize("both_lanes", [True, False])
def test_device_matches_oracle(rng, gp, both_lanes):
    n = 64
    frags = random_fragments(rng, n, both_lanes=both_lanes)
    qS, qE, tS, tE, score, lane1, lane2, valid = frags
    Vn, bpn, lanen = chain_scores_np(*frags, gp)

    def dev(x, dt=jnp.int32):
        return jnp.asarray(x, dt)[None]

    V, bp, lane = chain_scores(
        dev(qS), dev(qE), dev(tS), dev(tE),
        jnp.asarray(score, jnp.float32)[None],
        dev(lane1, jnp.bool_), dev(lane2, jnp.bool_), dev(valid, jnp.bool_),
        jnp.asarray(gp.slope), jnp.asarray(gp.inter),
        gp.ceiling1, gp.ceiling2)
    np.testing.assert_allclose(np.asarray(V[0]), Vn, rtol=1e-5)
    # traced best chain score must agree even if tie-broken differently
    cn, _ = traceback(Vn, bpn, lanen, valid)
    cd, _ = traceback(np.asarray(V[0]), np.asarray(bp[0]),
                      np.asarray(lane[0]), valid)
    assert np.isclose(Vn[cn[-1]], np.asarray(V[0])[cd[-1]], rtol=1e-5)


def test_collinear_anchors_chain_fully(gp):
    """Perfectly collinear anchors all chain (free gaps <= 20)."""
    n = 10
    qS = np.arange(n) * 120
    qE = qS + 100
    tS = qS + 777
    tE = tS + 100
    score = np.full(n, 100.0, np.float32)
    lane = np.ones(n, bool)
    valid = np.ones(n, bool)
    V, bp, ln = chain_scores_np(qS, qE, tS, tE, score, lane, lane, valid, gp)
    chain, links = traceback(V, bp, ln, valid)
    assert len(chain) == n
    assert V[chain[-1]] == pytest.approx(1000.0)  # 20bp gaps are free
    assert not links.any()


def test_reverse_staircase_chains_via_lane2(gp):
    """A reverse-read staircase (q up, t down) chains fully through the
    back-diagonal lane with zero gap cost (4-point mode)."""
    qS = np.array([0, 300, 600], dtype=np.int64)
    qE = qS + 300
    tS = np.array([1800, 1500, 1200], dtype=np.int64)
    tE = tS + 300
    score = np.full(3, 300.0, np.float32)
    lane = np.ones(3, bool)
    valid = np.ones(3, bool)
    V, bp, ln = chain_scores_np(qS, qE, tS, tE, score, lane, lane, valid, gp)
    chain, links = traceback(V, bp, ln, valid)
    assert len(chain) == 3
    assert V[chain[-1]] == pytest.approx(900.0)   # back-diags equal: free
    assert links[1:].all()                         # lane-2 edges

    # lane 2 disabled (2-point forward-only insertion): nothing chains
    no2 = np.zeros(3, bool)
    V1, bp1, _ = chain_scores_np(qS, qE, tS, tE, score, lane, no2, valid, gp)
    assert (bp1 == -1).all()


def test_inversion_mixed_lane_chain(gp):
    """fwd cluster -> inverted cluster -> fwd cluster chains via lane 1 box
    geometry (the inversion cluster's bounding box stays on-diagonal); a
    duplication-style backward t-jump uses lane 2."""
    # fwd, inv (box on diagonal), fwd — boxes collinear
    qS = np.array([0, 300, 600], dtype=np.int64)
    qE = qS + 300
    tS = np.array([1000, 1300, 1600], dtype=np.int64)
    tE = tS + 300
    score = np.full(3, 300.0, np.float32)
    lane = np.ones(3, bool)
    valid = np.ones(3, bool)
    V, bp, ln = chain_scores_np(qS, qE, tS, tE, score, lane, lane, valid, gp)
    chain, links = traceback(V, bp, ln, valid)
    assert len(chain) == 3 and not links.any()

    # backward genome jump (duplication): t decreases between clusters 1,2;
    # the |dback|=100 jump costs PWL(101)=324, so scores must exceed that
    tS2 = np.array([1000, 1300, 900], dtype=np.int64)
    tE2 = tS2 + 300
    score = np.full(3, 500.0, np.float32)
    V, bp, ln = chain_scores_np(qS, qE, tS2, tE2, score, lane, lane, valid, gp)
    chain, links = traceback(V, bp, ln, valid)
    assert len(chain) == 3
    assert links[2]  # the jump edge went through lane 2


def test_distant_anchor_not_chained(gp):
    """An anchor 10Mb away scores worse than the local chain (ceiling cost)."""
    qS = np.array([0, 200, 400], dtype=np.int64)
    qE = qS + 100
    tS = np.array([1000, 1200, 10_000_000], dtype=np.int64)
    tE = tS + 100
    score = np.full(3, 50.0, np.float32)
    lane = np.ones(3, bool)
    valid = np.ones(3, bool)
    V, bp, ln = chain_scores_np(qS, qE, tS, tE, score, lane, lane, valid, gp)
    # chaining into the far anchor pays ceiling2=3000 > chain value
    assert bp[2] == -1


def test_padding_invalid_ignored(rng, gp):
    frags = random_fragments(rng, 32)
    qS, qE, tS, tE, score, lane1, lane2, valid = frags
    valid2 = valid.copy()
    valid2[10:20] = False
    V1, _, _ = chain_scores_np(qS, qE, tS, tE, score, lane1, lane2, valid2, gp)
    # removing the invalid rows entirely gives the same values on survivors
    keep = valid2
    V2, _, _ = chain_scores_np(qS[keep], qE[keep], tS[keep], tE[keep],
                               score[keep], lane1[keep], lane2[keep],
                               np.ones(keep.sum(), bool), gp)
    np.testing.assert_allclose(V1[keep], V2)
