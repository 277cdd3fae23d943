import numpy as np
import pytest

from lra_tpu import seq as sequtils
from lra_tpu.align.affine import (DIAG, DOWN, GAPDOWN, GAPLEFT, LEFT,
                                  AlnResult, affine_one_gap_align)

M, MM, IND = 4, -3, -4


def recompute_score(q, t, res: AlnResult):
    """Score from the op list: m/mm per diag base, indel per in-band gap
    base, 0 for the long gap (its cost is deferred to the CIGAR scorer)."""
    s = 0
    qp = tp = 0
    for op, ln in res.ops:
        if op == DIAG:
            for x in range(ln):
                s += M if q[qp + x] == t[tp + x] else MM
            qp += ln
            tp += ln
        elif op == LEFT:
            s += IND * ln
            qp += ln
        elif op == DOWN:
            s += IND * ln
            tp += ln
        elif op == GAPLEFT:
            qp += ln
        elif op == GAPDOWN:
            tp += ln
    assert qp == len(q) and tp == len(t), (qp, len(q), tp, len(t))
    return s


def test_identical():
    q = sequtils.encode("ACGTACGTACGTACGTACGT")
    res = affine_one_gap_align(q, q.copy(), M, MM, IND, 5)
    assert res.blocks == [(0, 0, 20)]
    assert res.score == 20 * M


def test_single_snp(rng):
    q = rng.integers(0, 4, 60).astype(np.uint8)
    t = q.copy()
    t[30] = (t[30] + 1) % 4
    res = affine_one_gap_align(q, t, M, MM, IND, 8)
    assert res.score == 59 * M + MM
    covered = sum(b[2] for b in res.blocks)
    assert covered == 59 or covered == 60  # mismatch may sit between blocks


def test_small_insertion(rng):
    base = rng.integers(0, 4, 80).astype(np.uint8)
    ins = rng.integers(0, 4, 3).astype(np.uint8)
    q = np.concatenate([base[:40], ins, base[40:]])
    res = affine_one_gap_align(q, base, M, MM, IND, 8)
    assert res.score >= 80 * M + 3 * IND
    assert sum(b[2] for b in res.blocks) >= 78
    assert res.score == recompute_score(q, base, res)


def test_long_query_gap_one_gap_path(rng):
    """500bp insertion far beyond the band: must use the free long gap."""
    a = rng.integers(0, 4, 300).astype(np.uint8)
    b = rng.integers(0, 4, 300).astype(np.uint8)
    x = rng.integers(0, 4, 500).astype(np.uint8)
    q = np.concatenate([a, x, b])
    t = np.concatenate([a, b])
    res = affine_one_gap_align(q, t, M, MM, IND, 10)
    assert any(op == GAPLEFT for op, _ in res.ops)
    gap = sum(ln for op, ln in res.ops if op == GAPLEFT)
    assert 480 <= gap <= 520
    assert res.score >= int(0.95 * 600 * M)
    assert res.score == recompute_score(q, t, res)


def test_long_target_gap(rng):
    """500bp deletion from the query: free long gap on the target axis."""
    a = rng.integers(0, 4, 300).astype(np.uint8)
    b = rng.integers(0, 4, 300).astype(np.uint8)
    x = rng.integers(0, 4, 500).astype(np.uint8)
    q = np.concatenate([a, b])
    t = np.concatenate([a, x, b])
    res = affine_one_gap_align(q, t, M, MM, IND, 10)
    assert any(op == GAPDOWN for op, _ in res.ops)
    gap = sum(ln for op, ln in res.ops if op == GAPDOWN)
    assert 480 <= gap <= 520
    assert res.score == recompute_score(q, t, res)


def test_blocks_monotonic_and_consistent(rng):
    for trial in range(10):
        n = int(rng.integers(20, 200))
        q = rng.integers(0, 4, n).astype(np.uint8)
        t = q.copy()
        # random small edits
        for _ in range(int(rng.integers(0, 6))):
            p = int(rng.integers(0, len(t)))
            t[p] = (t[p] + 1) % 4
        res = affine_one_gap_align(q, t, M, MM, IND, 12)
        qp = tp = -1
        for (bq, bt, ln) in res.blocks:
            assert bq > qp and bt > tp
            qp, tp = bq + ln - 1, bt + ln - 1
            assert bq + ln <= len(q) and bt + ln <= len(t)
        assert res.score == recompute_score(q, t, res)


def test_tiny_and_empty():
    q = sequtils.encode("A")
    t = sequtils.encode("A")
    res = affine_one_gap_align(q, t, M, MM, IND, 5)
    assert res.score == M
    res = affine_one_gap_align(sequtils.encode("ACGT"), sequtils.encode("TTTT"),
                               M, MM, IND, 5)
    assert res.score <= 0
