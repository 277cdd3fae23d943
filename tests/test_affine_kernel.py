import numpy as np
import jax.numpy as jnp

from lra_tpu.align.affine import affine_one_gap_align
from lra_tpu.ops.affine_kernel import banded_global_kernel, traceback_banded

M, MM, IND = 4, -3, -4


def run_device(qs, ts, K):
    B = len(qs)
    Q = max(len(x) for x in qs)
    T = max(len(x) for x in ts)
    q = np.full((B, Q), 4, np.int8)
    t = np.full((B, T), 4, np.int8)
    for b, (a, c) in enumerate(zip(qs, ts)):
        q[b, :len(a)] = a
        t[b, :len(c)] = c
    qlen = np.array([len(x) for x in qs], np.int32)
    tlen = np.array([len(x) for x in ts], np.int32)
    score, arrows = banded_global_kernel(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen), jnp.asarray(tlen),
        K, M, MM, IND)
    return np.asarray(score), np.asarray(arrows), qlen, tlen


def test_device_matches_host_oracle(rng):
    k = 10
    qs, ts = [], []
    for _ in range(16):
        n = int(rng.integers(30, 120))
        t = rng.integers(0, 4, n).astype(np.uint8)
        q = t.copy()
        for _ in range(int(rng.integers(0, 5))):
            p = int(rng.integers(0, len(q)))
            q[p] = (q[p] + 1) % 4
        # small indel inside the band
        if rng.random() < 0.5 and len(q) > 20:
            p = int(rng.integers(5, len(q) - 5))
            q = np.delete(q, slice(p, p + int(rng.integers(1, 4))))
        qs.append(q)
        ts.append(t)

    # host oracle doubles k in the banded-global regime; device K must match
    K = 2 * k
    score, arrows, qlen, tlen = run_device(qs, ts, K)
    for b in range(len(qs)):
        ref = affine_one_gap_align(qs[b], ts[b], M, MM, IND, k)
        assert score[b] == ref.score, (b, score[b], ref.score)
        blocks, ops = traceback_banded(arrows[b], qlen[b], tlen[b], K)
        assert blocks == ref.blocks, (b, blocks, ref.blocks)


def test_device_batch_padding_independence(rng):
    """A problem's result must not depend on its batch neighbors."""
    k = 8
    t = rng.integers(0, 4, 60).astype(np.uint8)
    q = t.copy()
    q[10] = (q[10] + 1) % 4
    s1, a1, ql, tl = run_device([q], [t], 2 * k)
    s2, a2, _, _ = run_device([q, rng.integers(0, 4, 100).astype(np.uint8)],
                              [t, rng.integers(0, 4, 90).astype(np.uint8)],
                              2 * k)
    assert s1[0] == s2[0]
    b1, _ = traceback_banded(a1[0], ql[0], tl[0], 2 * k)
    b2, _ = traceback_banded(a2[0], ql[0], tl[0], 2 * k)
    assert b1 == b2


def test_device_traceback_matches_host(rng):
    """banded_global_traced + blocks_from_ops_row must reproduce the
    host traceback_banded blocks exactly."""
    from lra_tpu.ops.affine_kernel import (banded_global_traced,
                                           blocks_from_ops_row)

    k = 15
    qs, ts = [], []
    for i in range(12):
        n = int(rng.integers(10, 120))
        t = rng.integers(0, 4, n).astype(np.uint8)
        q = t.copy()
        for _ in range(int(rng.integers(0, 5))):
            p = int(rng.integers(0, len(q)))
            q[p] = (q[p] + 1) % 4
        if rng.random() < 0.5 and len(q) > 20:
            p = int(rng.integers(5, len(q) - 5))
            q = np.delete(q, slice(p, p + int(rng.integers(1, 4))))
        if rng.random() < 0.3 and len(q) > 20:
            p = int(rng.integers(5, len(q) - 5))
            q = np.insert(q, p, rng.integers(0, 4, 2).astype(np.uint8))
        qs.append(q)
        ts.append(t)

    K = 2 * k
    B = len(qs)
    S = max(max(len(x) for x in qs), max(len(x) for x in ts))
    q = np.full((B, S), 4, np.int8)
    t = np.full((B, S), 4, np.int8)
    for b, (a, c) in enumerate(zip(qs, ts)):
        q[b, :len(a)] = a
        t[b, :len(c)] = c
    qlen = np.array([len(x) for x in qs], np.int32)
    tlen = np.array([len(x) for x in ts], np.int32)
    _, arrows, _, _ = run_device(qs, ts, K)
    ops = np.asarray(banded_global_traced(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen),
        jnp.asarray(tlen), K, M, MM, IND))
    for b in range(B):
        ref_blocks, _ = traceback_banded(arrows[b], qlen[b], tlen[b], K)
        got = blocks_from_ops_row(ops[b])
        assert got == ref_blocks, (b, got, ref_blocks)


def test_pallas_rowsync_matches_xla():
    """The fused Pallas banded kernel must produce the same blocks as
    the XLA traced path (runs on real TPU only: Mosaic interpret mode is
    too slow for CI; the TPU run is exercised by bench/driver rounds)."""
    import jax
    import pytest
    if jax.default_backend() != "tpu":
        pytest.skip("pallas kernel equivalence needs a TPU")
    from lra_tpu.ops.affine_kernel import (banded_global_traced_packed,
                                           blocks_from_ops_batch,
                                           unpack_ops)
    from lra_tpu.ops.affine_pallas import (banded_pallas_rowsync,
                                           blocks_from_rowsync)

    rng2 = np.random.default_rng(9)
    B, S, K = 8, 64, 15
    t = rng2.integers(0, 4, (B, S)).astype(np.int8)
    q = t.copy()
    for b in range(B):
        for _ in range(int(rng2.integers(0, 6))):
            p = int(rng2.integers(0, S))
            q[b, p] = (q[b, p] + 1) % 4
    qlen = rng2.integers(S // 2, S + 1, B).astype(np.int32)
    tlen = np.clip(qlen + rng2.integers(-6, 6, B), 8, S).astype(np.int32)
    kb = np.maximum(np.full(B, 30, np.int32),
                    np.abs(qlen - tlen) + 1)
    args = (jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen),
            jnp.asarray(tlen), K, M, MM, IND, jnp.asarray(kb))
    ref = blocks_from_ops_batch(unpack_ops(np.asarray(
        banded_global_traced_packed(*args))))
    P = np.asarray(banded_pallas_rowsync(*args))
    got = blocks_from_rowsync(P, qlen, tlen, S)
    assert got == ref
