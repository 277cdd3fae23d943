"""Device one-long-gap kernel == host oracle (bit-identical blocks).

The host oracle align.affine.affine_one_gap_align is the reference-
faithful implementation (AffineOneGapAlign.h:157); ops/one_gap.py must
reproduce its integer scores AND its exact traceback tie order."""

import numpy as np
import pytest

from lra_tpu.align.affine import affine_one_gap_align
from lra_tpu.ops.one_gap import (blocks_from_one_gap_ops, one_gap_traced)
from lra_tpu.utils import pow2_at_least


def _run_batch(cases, m, mm, indel):
    """cases: list of (q, t, k).  Returns list of (blocks, score)."""
    from lra_tpu.ops.one_gap import pack_one_gap_bucket

    K = 16
    D = 1
    for q, t, k in cases:
        D = max(D, min(len(q), len(t)) + 1)
        assert k <= K
    D = pow2_at_least(D, 16)
    B = len(cases)
    kb = np.array([min(min(len(q), len(t)), k) for q, t, k in cases],
                  np.int32)
    qh, th, qt, tt, qlen, tlen = pack_one_gap_bucket(
        [q for q, _, _ in cases], [t for _, t, _ in cases], K, D)
    L = 2 * (D + K) + 8
    ops, jump, score = one_gap_traced(qh, th, qt, tt, qlen, tlen, kb,
                                      K, D, m, mm, indel, L)
    ops = np.asarray(ops)
    jump = np.asarray(jump)
    score = np.asarray(score)
    return [(blocks_from_one_gap_ops(ops[b], int(jump[b])),
             float(score[b])) for b in range(B)]


def _gen_case(rng, maxlen=200):
    """Random (q, t, k) in the one-gap regime: min + 2k < max."""
    k = int(rng.integers(1, 16))
    small = int(rng.integers(1, maxlen))
    gap = int(rng.integers(2 * k + 1 - min(small, 0) + 1, 3 * maxlen))
    big = small + gap
    # ensure regime: min + 2*min(k, small) < max
    kk = min(k, small)
    if small + 2 * kk >= big:
        big = small + 2 * kk + 1
    # target derives from query with noise so alignments are realistic
    base = rng.integers(0, 4, max(small, big) + 8).astype(np.uint8)
    sm = base[:small].copy()
    bg = np.concatenate([base[:small // 2],
                         rng.integers(0, 4, big - small).astype(np.uint8),
                         base[small // 2:small]])[:big]
    mut = rng.random(small) < 0.1
    sm[mut] = rng.integers(0, 4, int(mut.sum()))
    if rng.random() < 0.5:
        q, t = sm, bg        # deletion-like (tLen > qLen)
    else:
        q, t = bg, sm        # insertion-like (qLen > tLen)
    return q, t, k


@pytest.mark.parametrize("scores", [(4, -3, -4), (4, -1, -2)])
def test_one_gap_matches_host_random(scores):
    m, mm, indel = scores
    rng = np.random.default_rng(17)
    cases = [_gen_case(rng) for _ in range(48)]
    got = _run_batch(cases, m, mm, indel)
    for (q, t, k), (blocks, score) in zip(cases, got):
        ref = affine_one_gap_align(q, t, m, mm, indel, k)
        assert blocks == ref.blocks, (len(q), len(t), k, blocks, ref.blocks)
        assert int(score) == ref.score


def test_one_gap_low_entropy_ties():
    """Homopolymers and dinucleotide repeats maximize score ties — the
    tie-break order must still match the host exactly."""
    m, mm, indel = 4, -3, -4
    rng = np.random.default_rng(23)
    cases = []
    for _ in range(24):
        k = int(rng.integers(1, 12))
        small = int(rng.integers(3, 60))
        big = small + int(rng.integers(2 * k + 2, 300))
        unit = rng.integers(0, 4, int(rng.integers(1, 3)))
        sm = np.tile(unit, small // len(unit) + 1)[:small].astype(np.uint8)
        bg = np.tile(unit, big // len(unit) + 1)[:big].astype(np.uint8)
        if rng.random() < 0.5:
            cases.append((sm, bg, k))
        else:
            cases.append((bg, sm, k))
    got = _run_batch(cases, m, mm, indel)
    for (q, t, k), (blocks, score) in zip(cases, got):
        ref = affine_one_gap_align(q, t, m, mm, indel, k)
        assert blocks == ref.blocks, (len(q), len(t), k, blocks, ref.blocks)
        assert int(score) == ref.score


def test_one_gap_sv_scale():
    """SV-scale: a 2kb deletion and a 1.5kb insertion flanked by
    near-identical sequence."""
    m, mm, indel = 4, -3, -4
    rng = np.random.default_rng(31)
    flank = rng.integers(0, 4, 400).astype(np.uint8)
    sv = rng.integers(0, 4, 2000).astype(np.uint8)
    q_del = np.concatenate([flank[:200], flank[200:]])
    t_del = np.concatenate([flank[:200], sv, flank[200:]])
    ins = rng.integers(0, 4, 1500).astype(np.uint8)
    q_ins = np.concatenate([flank[:150], ins, flank[150:300]])
    t_ins = flank[:300].copy()
    cases = [(q_del, t_del, 15), (q_ins, t_ins, 15)]
    got = _run_batch(cases, m, mm, indel)
    for (q, t, k), (blocks, score) in zip(cases, got):
        ref = affine_one_gap_align(q, t, m, mm, indel, k)
        assert blocks == ref.blocks
        assert int(score) == ref.score


def test_solve_gap_jobs_routes_one_gap_to_device():
    """Out-of-regime jobs through solve_gap_jobs produce the same blocks
    as the host one-gap aligner (the use_device=False reference path)."""
    from lra_tpu import preset
    from lra_tpu.pipeline.gap_align import GapJob, solve_gap_jobs

    opts = preset("ccs")
    rng = np.random.default_rng(41)
    jobs_d, jobs_h = [], []
    for n in range(20):
        q, t, _k = _gen_case(rng, maxlen=120)
        jobs_d.append(GapJob(q.copy(), t.copy(), ("a", n)))
        jobs_h.append(GapJob(q.copy(), t.copy(), ("a", n)))
    # plus two SV-scale cases
    flank = rng.integers(0, 4, 500).astype(np.uint8)
    sv = rng.integers(0, 4, 3000).astype(np.uint8)
    q1, t1 = flank, np.concatenate([flank[:250], sv, flank[250:]])
    jobs_d.append(GapJob(q1, t1, ("a", 100)))
    jobs_h.append(GapJob(q1.copy(), t1.copy(), ("a", 100)))
    solve_gap_jobs(jobs_d, opts, use_device=True)
    solve_gap_jobs(jobs_h, opts, use_device=False)
    for jd, jh in zip(jobs_d, jobs_h):
        bd = [tuple(b) for b in jd.blocks]
        bh = [tuple(b) for b in jh.blocks]
        assert bd == bh, (jd.key, len(jd.q), len(jd.t), bd[:3], bh[:3])


def test_one_gap_wide_band_class():
    """kband up to 50 (contig refine_band tiny-window jobs) rides the
    K=64 class; blocks must stay bit-identical to the host."""
    from lra_tpu.ops.one_gap import pack_one_gap_bucket

    m, mm, indel = 4, -3, -4
    rng = np.random.default_rng(47)
    K = 64
    cases = []
    for _ in range(12):
        k = int(rng.integers(16, 51))
        small = int(rng.integers(20, 200))
        big = small + int(rng.integers(2 * k + 2, 800))
        base = rng.integers(0, 4, big + 8).astype(np.uint8)
        sm = base[:small].copy()
        mut = rng.random(small) < 0.08
        sm[mut] = rng.integers(0, 4, int(mut.sum()))
        bg = base[:big]
        cases.append((sm, bg, k) if rng.random() < 0.5 else (bg, sm, k))
    D = pow2_at_least(max(min(len(q), len(t)) for q, t, _ in cases) + 1,
                      16)
    kb = np.array([min(min(len(q), len(t)), k) for q, t, k in cases],
                  np.int32)
    qh, th, qt, tt, qlen, tlen = pack_one_gap_bucket(
        [q for q, _, _ in cases], [t for _, t, _ in cases], K, D)
    L = 2 * (D + K) + 8
    ops, jump, score = one_gap_traced(qh, th, qt, tt, qlen, tlen, kb,
                                      K, D, m, mm, indel, L)
    ops, jump, score = map(np.asarray, (ops, jump, score))
    for b, (q, t, k) in enumerate(cases):
        ref = affine_one_gap_align(q, t, m, mm, indel, k)
        blocks = blocks_from_one_gap_ops(ops[b], int(jump[b]))
        assert blocks == ref.blocks, (b, len(q), len(t), k)
        assert int(score[b]) == ref.score
