"""Masked chain download (device-side traceback bitmask) vs full path."""

import numpy as np

from lra_tpu import preset
from lra_tpu.chain.driver import (ChainProblem, best_chain, chain_vmax,
                                  solve_problems)
from lra_tpu.ops.gapcost import from_options


def rand_problem(rng, n, need_full):
    ln = rng.integers(15, 60, n)
    qS = np.sort(rng.integers(0, 50000, n)).astype(np.int64)
    tS = (qS + rng.integers(-1500, 1500, n)).clip(0).astype(np.int64)
    qE, tE = qS + ln, tS + ln
    strand = rng.random(n) < 0.8
    return ChainProblem(qS, qE, tS, tE, ln.astype(np.float32) * 2.0,
                        strand, ~strand, np.arange(n, dtype=np.int64), 0,
                        need_full=need_full)


def test_masked_matches_full():
    rng = np.random.default_rng(31)
    gp = from_options(preset("ccs"))
    pairs = []
    for seed in range(6):
        r2 = np.random.default_rng(seed)
        n = int(r2.integers(40, 700))
        full = rand_problem(np.random.default_rng(1000 + seed), n, True)
        masked = ChainProblem(full.qS.copy(), full.qE.copy(),
                              full.tS.copy(), full.tE.copy(),
                              full.score.copy(), full.lane1.copy(),
                              full.lane2.copy(), full.order.copy(), 0,
                              need_full=False)
        pairs.append((full, masked))
    solve_problems([p for pr in pairs for p in pr], gp, use_device=True)
    for full, masked in pairs:
        cf = best_chain(full)
        cm = best_chain(masked)
        assert cm == cf, (len(cf), len(cm))
        if cf:
            np.testing.assert_allclose(chain_vmax(masked),
                                       chain_vmax(full), rtol=1e-6)
