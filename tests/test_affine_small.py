"""Host tiny-gap DP vs the banded kernel path: identical blocks.

solve_small_jobs must reproduce the banded-global kernel's alignment
(same scores, same ins>del>diag tie order) for every job it takes over,
so routing by size never changes output.
"""

import numpy as np

from lra_tpu.ops.affine_kernel import banded_global_np, traceback_banded
from lra_tpu.ops.affine_small import SMALL_MAX, solve_small_jobs

M, MM, IND = 4, -3, -4


def kernel_blocks(qs, ts, kbs):
    K = max(kbs)
    n = len(qs)
    S = SMALL_MAX
    q = np.full((n, S), 4, np.int8)
    t = np.full((n, S), 4, np.int8)
    ql = np.zeros(n, np.int32)
    tl = np.zeros(n, np.int32)
    for i, (a, b) in enumerate(zip(qs, ts)):
        q[i, :len(a)] = a
        t[i, :len(b)] = b
        ql[i], tl[i] = len(a), len(b)
    _score, arrows = banded_global_np(q, t, ql, tl, K, M, MM, IND,
                                      np.asarray(kbs, np.int32))
    out = []
    for i in range(n):
        blocks, _ = traceback_banded(arrows[i], ql[i], tl[i], K)
        out.append(blocks)
    return out


def random_jobs(rng, n):
    qs, ts, kbs = [], [], []
    for _ in range(n):
        tl = int(rng.integers(1, SMALL_MAX + 1))
        t = rng.integers(0, 4, tl).astype(np.int8)
        # mutate t into q: SNPs + small indels
        q = list(t)
        for _ in range(int(rng.integers(0, 8))):
            op = rng.integers(0, 3)
            pos = int(rng.integers(0, max(1, len(q))))
            if op == 0 and q:
                q[pos] = int(rng.integers(0, 4))
            elif op == 1 and len(q) < SMALL_MAX:
                q.insert(pos, int(rng.integers(0, 4)))
            elif op == 2 and len(q) > 1:
                q.pop(pos)
        q = np.array(q, np.int8)
        drift = abs(len(q) - len(t))
        band_in = min(2 * drift + 1, 30)
        k = min(max(1, min(len(q), len(t))), band_in)
        if min(len(q), len(t)) + 2 * k < max(len(q), len(t)):
            continue  # one-gap regime, not routed to small DP
        qs.append(q)
        ts.append(t)
        kbs.append(2 * k)
    return qs, ts, kbs


def test_small_dp_matches_kernel():
    rng = np.random.default_rng(77)
    qs, ts, kbs = random_jobs(rng, 400)
    assert len(qs) > 300
    ours = solve_small_jobs(qs, ts, M, MM, IND, kbands=kbs)
    ref = kernel_blocks(qs, ts, kbs)
    for i, (a, b) in enumerate(zip(ours, ref)):
        assert a == b, (i, qs[i], ts[i], kbs[i], a, b)


def test_small_dp_identity():
    qs = [np.array([0, 1, 2, 3], np.int8)]
    out = solve_small_jobs(qs, [qs[0].copy()], M, MM, IND)
    assert out == [[(0, 0, 4)]]
