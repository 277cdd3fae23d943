"""Giant-problem q-range sharding (chain/driver._shard_problem + stitch).

VERDICT r1 item 5: a megabase contig's anchor set is split on q ranges
with a left halo (> the reference's splitdist, Options.h:191), shards are
chained as independent batch rows (dp-shardable over the mesh), and the
stitched V/bp must reproduce the unsharded chain.
"""

import numpy as np

from lra_tpu import preset
from lra_tpu.chain import driver
from lra_tpu.chain.driver import ChainProblem, best_chain, solve_problems
from lra_tpu.ops.gapcost import from_options


def contig_problem(rng, n_segs=8, m=400, read_span=30000):
    """Contig-like fragments: diagonal runs separated by SV-scale
    t-jumps, fragments sorted by qS."""
    parts = []
    q, t = 0, 10000
    for _ in range(n_segs):
        dq = np.sort(rng.integers(0, read_span, m))
        ln = rng.integers(20, 80, m)
        qS = q + dq
        tS = t + dq + rng.integers(-50, 50, m)
        parts.append((qS, qS + ln, tS, tS + ln))
        q += read_span + 500
        t += read_span + int(rng.integers(-2000, 20000))
    qS = np.concatenate([p[0] for p in parts]).astype(np.int64)
    qE = np.concatenate([p[1] for p in parts]).astype(np.int64)
    tS = np.concatenate([p[2] for p in parts]).astype(np.int64)
    tE = np.concatenate([p[3] for p in parts]).astype(np.int64)
    o = np.argsort(qS, kind="stable")
    qS, qE, tS, tE = qS[o], qE[o], tS[o], tE[o]
    n = len(qS)
    return ChainProblem(qS, qE, tS, tE,
                        (qE - qS).astype(np.float32),
                        np.ones(n, bool), np.ones(n, bool),
                        np.arange(n, dtype=np.int64), 0)


def clone(p):
    return ChainProblem(p.qS.copy(), p.qE.copy(), p.tS.copy(), p.tE.copy(),
                        p.score.copy(), p.lane1.copy(), p.lane2.copy(),
                        p.order.copy(), p.tbase)


def test_sharded_matches_unsharded(monkeypatch):
    rng = np.random.default_rng(5)
    gp = from_options(preset("contig"))
    p_ref = contig_problem(rng)
    p_sh = clone(p_ref)

    monkeypatch.setattr(driver, "SHARD_N", 10 ** 9)
    solve_problems([p_ref], gp, use_device=True)
    monkeypatch.setattr(driver, "SHARD_N", 512)
    monkeypatch.setattr(driver, "SHARD_HALO", 60000)
    solve_problems([p_sh], gp, use_device=True)

    chain_ref = best_chain(p_ref)
    chain_sh = best_chain(p_sh)
    assert chain_ref, "unsharded produced no chain"
    assert chain_sh == chain_ref
    np.testing.assert_allclose(p_sh.V.max(), p_ref.V.max(), rtol=1e-5,
                               atol=1.0)


def test_shard_geometry():
    rng = np.random.default_rng(9)
    p = contig_problem(rng, n_segs=4, m=300)
    childs = driver._shard_problem(p, 256, 60000)
    # cores tile [0, n) exactly
    n = len(p.qS)
    covered = np.zeros(n, bool)
    for (c, lo, hi, off) in childs:
        assert off <= lo < hi <= n
        assert not covered[lo:hi].any()
        covered[lo:hi] = True
        # halo spans at most halo bases before the core start
        assert p.qS[off] >= p.qS[lo] - 60000
        if off > 0:
            assert p.qS[off - 1] < p.qS[lo] - 60000
        assert len(c.qS) == hi - off
    assert covered.all()
