"""Batched banded alignment on device.

Device version of the banded-global variant of the reference's
``AffineOneGapAlign`` (reference: AffineOneGapAlign.h:194-201 doubled-band
case; the separated prefix/suffix one-long-gap case — |qLen-tLen| > 2k —
runs as its own batched device kernel in ops/one_gap.py).

Formulation: rows j = 1..T, the band is 2K+1 diagonal offsets d with
i = j + d.  Within-row query-gap chains (LEFT arrows) are a max-plus
prefix closure over d, computed with log2(band) doubling steps — no
scalar inner loop.  Tie-break order (ins > del > match) and the i=0 /
j=0 boundary initialization match the reference exactly, so host
traceback over the emitted arrow planes reproduces the reference's op
list.

Layout: problems are bucketed by (Q, T, K) on host; all arrays here are
fixed-shape [B, ...].  Arrows (int8 [B, T+1, 2K+1]) are downloaded for
host traceback — O(band * T) bytes per problem.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..align.affine import DIAG, DONE, DOWN, LEFT, MISSING

NEGF = jnp.float32(-1.0e30)


def _banded_arrows(q, t, qlen, tlen, K, m, mm, indel, kband=None):
    """Core banded DP; returns (score f32[B], arrows int8[T+1, B, band]).

    q: int8[B,Q] codes, t: int8[B,T], qlen/tlen: int32[B].

    kband: optional int32[B] per-problem band halfwidth <= K (cells with
    |i - j| > kband are rails); defaults to K.  Requires
    |qlen - tlen| <= kband.  arrows[j, b, d] is the op at cell
    i = j + d - K.
    """
    B, Q = q.shape
    T = t.shape[1]
    band = 2 * K + 1
    offs = jnp.arange(-K, K + 1, dtype=jnp.int32)  # d values
    if kband is None:
        kband = jnp.full((B,), K, dtype=jnp.int32)
    in_band = (offs[None, :] >= -kband[:, None]) & \
              (offs[None, :] <= kband[:, None])    # [B, band]

    # pad query so gathers q[j-1-K .. j-1+K] are always in range
    qpad = jnp.pad(q.astype(jnp.int32), ((0, 0), (K + 1, K + T + 1)),
                   constant_values=5)

    # row 0: P[i, 0] = indel*i for 0 <= i <= kband (d = i)
    row0 = jnp.where((offs[None, :] >= 0) & in_band,
                     indel * offs[None, :].astype(jnp.float32), NEGF)
    arrows0 = jnp.where(offs[None, :] > 0, LEFT,
                        jnp.where(offs[None, :] == 0, DONE, -1)).astype(jnp.int8)
    arrows0 = jnp.where(in_band, arrows0, jnp.int8(-1))

    log_steps = int(np.ceil(np.log2(band)))

    def row_update(prev, j):
        # one DP row; prev = f32[B, band] row j-1
        # q codes at i-1 = j-1+d  -> slice qpad at offset (j-1-K) + (K+1)
        qrow = jax.lax.dynamic_slice_in_dim(qpad, j, band, axis=1)  # [B, band]
        tj = t[:, jnp.minimum(j - 1, T - 1)]   # clip: unroll-padded rows
        sub = jnp.where(qrow == tj[:, None], float(m), float(mm))

        sMat = prev + sub
        # sDel: predecessor (i, j-1) at offset d+1 in row j-1
        prev_shift = jnp.concatenate(
            [prev[:, 1:], jnp.full((B, 1), NEGF)], axis=1)
        sDel = prev_shift + float(indel)
        base = jnp.maximum(sMat, sDel)

        i_vals = j + offs[None, :]  # [1, band] broadcast
        # boundary column i=0: P[0, j] = indel*j  (reference inits j <= k+1,
        # beyond that the cell is out of band anyway)
        is_i0 = (i_vals == 0)
        base = jnp.where(is_i0, float(indel) * j, base)

        # mask out-of-range cells before the closure so they can't seed it
        valid = (i_vals >= 0) & (i_vals <= qlen[:, None]) & \
                (j <= tlen[:, None]) & in_band
        base = jnp.where(valid, base, NEGF)

        # LEFT-arrow closure: row[d] = max_e<=d base[e] + indel*(d-e)
        row = base
        for s in range(log_steps):
            sh = 1 << s
            shifted = jnp.concatenate(
                [jnp.full((B, sh), NEGF), row[:, :-sh]], axis=1)
            row = jnp.maximum(row, shifted + float(indel) * sh)
        row = jnp.where(valid, row, NEGF)

        # arrows with reference tie order: ins(LEFT) > del(DOWN) > mat(DIAG)
        row_left = jnp.concatenate([jnp.full((B, 1), NEGF), row[:, :-1]],
                                   axis=1)
        arr = jnp.where(
            row == row_left + float(indel), LEFT,
            jnp.where(row == sDel, DOWN, DIAG)).astype(jnp.int8)
        arr = jnp.where(is_i0, jnp.int8(DOWN), arr)
        arr = jnp.where(valid, arr, jnp.int8(-1))

        return row, arr

    # multi-row unroll: R sequential row updates per scan step.  The
    # per-row tile ([B, band]) is far below the VPU width, so the scan's
    # per-step fixed cost dominates; unrolling amortizes it over R rows
    # (VERDICT r4 item 5).  Row math is IDENTICAL to the single-row
    # scan — rows beyond T (unroll padding) are computed on clipped
    # inputs and sliced off below.
    R = 8
    nblk = (T + R - 1) // R

    def step(carry, jb):
        prev = carry
        rows_l, arrs_l = [], []
        for r in range(R):
            j = jb * R + 1 + r
            prev, arr = row_update(prev, j)
            rows_l.append(prev)
            arrs_l.append(arr)
        return prev, (jnp.stack(rows_l), jnp.stack(arrs_l))

    _, (rows, arrows) = jax.lax.scan(step, row0, jnp.arange(nblk))
    rows = rows.reshape(nblk * R, B, band)[:T]
    arrows = arrows.reshape(nblk * R, B, band)[:T]
    # rows: [T, B, band] -> final score at j = tlen, d = qlen - tlen
    rows = jnp.concatenate([row0[None], rows], axis=0)      # [T+1, B, band]
    arrows = jnp.concatenate([arrows0[None], arrows], axis=0)
    d_final = (qlen - tlen + K).astype(jnp.int32)
    score = rows[tlen, jnp.arange(B), d_final]
    return score, arrows


@functools.partial(jax.jit, static_argnames=("K", "m", "mm", "indel"))
def banded_global_kernel(q, t, qlen, tlen, K, m, mm, indel, kband=None):
    """(score f32[B], arrows int8[B, T+1, 2K+1]); see _banded_arrows."""
    score, arrows = _banded_arrows(q, t, qlen, tlen, K, m, mm, indel, kband)
    return score, jnp.transpose(arrows, (1, 0, 2))


def _traceback_ops_device(arrows, qlen, tlen, K, L):
    """Device traceback over arrows [T+1, B, band]: walk each problem from
    (qlen, tlen) to (0, 0) simultaneously, emitting one op per step into a
    fixed [B, L] int8 plane (-1 past the end).  Downloading this plane is
    O(path length) instead of O(band * T) — on the tunneled TPU where d2h
    has a ~28ms latency floor and ~12MB/s bandwidth, this is the
    difference between ~0.1MB and ~4MB per bucket."""
    T1, B, band = arrows.shape
    # [B, T1, band] so the gather below stays sharded on the batch axis
    arr_b = jnp.transpose(arrows, (1, 0, 2))
    barange = jnp.arange(B, dtype=jnp.int32)

    def one(state):
        i, j, active = state
        d = i - j + K
        ok = active & (i >= 0) & (j >= 0) & (d >= 0) & (d < band)
        jc = jnp.clip(j, 0, T1 - 1)
        dc = jnp.clip(d, 0, band - 1)
        a = arr_b[barange, jc, dc]
        a = jnp.where(ok & (a != DONE), a, jnp.int8(-1))
        active2 = a >= 0
        di = jnp.where((a == DIAG) | (a == LEFT), 1, 0)
        dj = jnp.where((a == DIAG) | (a == DOWN), 1, 0)
        return ((i - di).astype(jnp.int32), (j - dj).astype(jnp.int32),
                active2), a

    # unrolled by R steps per scan iteration: the per-step tile ([B])
    # is tiny, so scan fixed cost dominates the walk
    R = 8
    nblk = (L + R - 1) // R

    def step(state, _):
        outs = []
        for _r in range(R):
            state, a = one(state)
            outs.append(a)
        return state, jnp.stack(outs)

    init = (qlen.astype(jnp.int32), tlen.astype(jnp.int32),
            jnp.ones(qlen.shape, bool))
    _, ops = jax.lax.scan(step, init, None, length=nblk)
    ops = ops.reshape(nblk * R, -1)[:L]
    return jnp.transpose(ops)    # [B, L], end-of-alignment first


@functools.partial(jax.jit, static_argnames=("K", "m", "mm", "indel"))
def banded_global_traced(q, t, qlen, tlen, K, m, mm, indel, kband=None):
    """Banded DP + on-device traceback.

    Returns ops int8[B, Q+T]: per problem, the op codes (DIAG/LEFT/DOWN)
    walking backward from (qlen, tlen), -1-padded after termination.
    """
    score, arrows = _banded_arrows(q, t, qlen, tlen, K, m, mm, indel, kband)
    L = q.shape[1] + t.shape[1]
    return _traceback_ops_device(arrows, qlen, tlen, K, L)


@functools.partial(jax.jit, static_argnames=("K", "m", "mm", "indel"))
def banded_global_traced_packed(q, t, qlen, tlen, K, m, mm, indel,
                                kband=None):
    """banded_global_traced with the op plane packed 2 bits/op on device
    (LEFT/DOWN/DIAG = 1/2/3, terminator 0) — a 4x smaller d2h transfer on
    a link with ~12MB/s effective bandwidth."""
    assert (q.shape[1] + t.shape[1]) % 4 == 0, \
        "packed traceback requires Q+T to be a multiple of 4"
    ops = banded_global_traced(q, t, qlen, tlen, K, m, mm, indel, kband)
    o = jnp.where(ops < 0, 0, ops).astype(jnp.uint8)
    return (o[:, 0::4] | (o[:, 1::4] << 2) | (o[:, 2::4] << 4)
            | (o[:, 3::4] << 6))


def unpack_ops(packed: np.ndarray, mark_term: bool = True) -> np.ndarray:
    """Host inverse of the device 2-bit packing -> int8 [B, L] with -1
    after termination (blocks_from_ops_batch's input format).

    mark_term=False skips the 0 -> -1 rewrite pass: the packed
    terminator 0 (== DONE) is neither DIAG nor LEFT/DOWN, so consumers
    that only classify ops (blocks_from_ops_batch) don't need it."""
    B, L4 = packed.shape
    out = np.empty((B, L4 * 4), np.int8)
    out[:, 0::4] = packed & 3
    out[:, 1::4] = (packed >> 2) & 3
    out[:, 2::4] = (packed >> 4) & 3
    out[:, 3::4] = (packed >> 6) & 3
    if mark_term:
        out[out == 0] = -1
    return out


def blocks_from_ops_batch(ops: np.ndarray):
    """Vectorized blocks_from_ops_row over the whole bucket.

    ops: int8[B, L] device-traceback planes (end-first, -1 padded).
    Returns a list of B block lists [(q_off, t_off, len)].
    """
    B, L = ops.shape
    # ops are end-of-alignment-first; instead of reversing each row,
    # compute alignment-order offsets from suffix counts: the q offset of
    # an element is the number of q-consuming ops AFTER it in array order.
    is_diag = ops == DIAG
    qstep = is_diag | (ops == LEFT)
    tstep = is_diag | (ops == DOWN)
    cdtype = np.int16 if L < 32768 else np.int32
    cq = qstep.cumsum(axis=1, dtype=cdtype)          # inclusive prefix
    ct = tstep.cumsum(axis=1, dtype=cdtype)
    tq = cq[:, -1]
    tt = ct[:, -1]
    prev_diag = np.concatenate(
        [np.zeros((B, 1), bool), is_diag[:, :-1]], axis=1)
    next_diag = np.concatenate(
        [is_diag[:, 1:], np.zeros((B, 1), bool)], axis=1)
    sb, sj = np.nonzero(is_diag & ~prev_diag)        # run starts (array order)
    _, ej = np.nonzero(is_diag & ~next_diag)         # run ends (paired)
    lens = ej - sj + 1
    # run's first base in alignment order is its LAST array element (ej)
    qv = tq[sb] - cq[sb, ej]
    tv = tt[sb] - ct[sb, ej]
    rows = list(zip(qv.tolist(), tv.tolist(), lens.tolist()))
    # nonzero is row-major: split at row boundaries; array order is
    # end-first, so reverse each row's slice into ascending-q order
    cuts = np.searchsorted(sb, np.arange(1, B))
    out = []
    prev = 0
    for c in list(cuts) + [len(rows)]:
        out.append(rows[prev:c][::-1])
        prev = c
    return out


def blocks_from_ops_row(row: np.ndarray):
    """One problem's device-traceback ops (end-first, -1 padded) ->
    [(q_off, t_off, len)] match blocks, same semantics as
    traceback_banded."""
    neg = np.nonzero(row < 0)[0]
    n = int(neg[0]) if len(neg) else len(row)
    if n == 0:
        return []
    ops = row[:n][::-1]
    change = np.nonzero(np.diff(ops))[0]
    starts = np.concatenate(([0], change + 1))
    lens = np.diff(np.concatenate((starts, [n])))
    vals = ops[starts]
    dq = np.where((vals == LEFT) | (vals == DIAG), lens, 0)
    dt = np.where((vals == DOWN) | (vals == DIAG), lens, 0)
    qoff = np.cumsum(dq) - dq
    toff = np.cumsum(dt) - dt
    sel = vals == DIAG
    return list(zip(qoff[sel].tolist(), toff[sel].tolist(),
                    lens[sel].tolist()))


def traceback_banded(arrows: np.ndarray, qlen: int, tlen: int, K: int):
    """Host traceback of one problem's arrow plane.

    Returns (blocks, ops) like align.affine.affine_one_gap_align.
    """
    i, j = int(qlen), int(tlen)
    ops: list = []
    lengths: list = []
    while i >= 0 and j >= 0:
        d = i - j + K
        if d < 0 or d >= arrows.shape[1]:
            break
        a = int(arrows[j, d])
        if a in (DONE, -1):
            break
        if not ops or ops[-1] != a:
            ops.append(a)
            lengths.append(1)
        else:
            lengths[-1] += 1
        if a == DIAG:
            i -= 1
            j -= 1
        elif a == LEFT:
            i -= 1
        elif a == DOWN:
            j -= 1
        else:
            break
    blocks = []
    out_ops = []
    qPos = tPos = 0
    for op, ln in zip(ops[::-1], lengths[::-1]):
        if op == LEFT:
            qPos += ln
        elif op == DOWN:
            tPos += ln
        elif op == DIAG:
            blocks.append((qPos, tPos, ln))
            qPos += ln
            tPos += ln
        out_ops.append((op, ln))
    return blocks, out_ops


# ---------------------------------------------------------------------------
# Indel-refine DP: the reference's IndelRefineAlignment matrix
# (reference: IndelRefine.h:339-612) — linear single-step gaps (cost
# `indel`) PLUS affine lanes with gapOpen = 2*indel+1 and gapExtend = 0,
# so a gap run of length g costs max(g*indel, open): length-1 gaps stay
# linear, longer gaps consolidate under one open.  Main-matrix tie order
# is match > ins(linear) > del(linear) > delClose > insClose
# (IndelRefine.h:585-612); within each lane, open beats extend on ties
# (IndelRefine.h:504-512).  The first q/t base of the window is force-
# paired at zero score (IndelRefine.h:674 pushes the final diag;
# "The first base is always aligned here") — callers pass the window
# SHIFTED by one base and prepend the (0,0,1) block — and the i=0
# column is a rail for j >= 1 (IndelRefine.h:414: row-start cells BAD),
# so the region cannot open with a target deletion.
#
# With gapExtend = 0 the within-row recurrence collapses: the ins lane
# is I[d] = prefixmax(base)[d-1] + open (one open covers any run
# length), and S[d] = max(leftclosure(base)[d], I[d]) — two log-doubling
# closures, same cost class as the linear kernel.
# ---------------------------------------------------------------------------

REF_DELC = 4   # main arrow: close a target-gap (del) affine run
REF_INSC = 5   # main arrow: close a query-gap (ins) affine run
_DEL_OPEN_BIT = 8
_INS_OPEN_BIT = 16


def _refine_arrows(q, t, qlen, tlen, K, m, mm, indel, kband=None):
    """Refine-DP banded scan; returns (score f32[B],
    planes int8[T+1, B, band]) where plane = main arrow (bits 0-2) |
    delOpen (bit 3) | insOpen (bit 4), -1 at rails."""
    B, Q = q.shape
    T = t.shape[1]
    band = 2 * K + 1
    open_ = 2 * indel + 1
    offs = jnp.arange(-K, K + 1, dtype=jnp.int32)
    if kband is None:
        kband = jnp.full((B,), K, dtype=jnp.int32)
    in_band = (offs[None, :] >= -kband[:, None]) & \
              (offs[None, :] <= kband[:, None])

    qpad = jnp.pad(q.astype(jnp.int32), ((0, 0), (K + 1, K + T + 1)),
                   constant_values=5)

    row0 = jnp.where((offs[None, :] >= 0) & in_band
                     & (offs[None, :] <= qlen[:, None]),
                     indel * offs[None, :].astype(jnp.float32), NEGF)
    arrows0 = jnp.where(offs[None, :] > 0, LEFT,
                        jnp.where(offs[None, :] == 0, DONE, -1)
                        ).astype(jnp.int8)
    arrows0 = jnp.where(in_band & (offs[None, :] <= qlen[:, None]),
                        arrows0, jnp.int8(-1))

    log_steps = int(np.ceil(np.log2(band)))

    def row_update(carry, j):
        Sp, Dp = carry                     # rows j-1: [B, band]
        qrow = jax.lax.dynamic_slice_in_dim(qpad, j, band, axis=1)
        tj = t[:, jnp.minimum(j - 1, T - 1)]   # clip: unroll-padded rows
        sub = jnp.where(qrow == tj[:, None], float(m), float(mm))

        shiftS = jnp.concatenate([Sp[:, 1:], jnp.full((B, 1), NEGF)], axis=1)
        shiftD = jnp.concatenate([Dp[:, 1:], jnp.full((B, 1), NEGF)], axis=1)

        # del lane (target-gap run at fixed i): open from S or extend (+0)
        D_new = jnp.maximum(shiftS + float(open_), shiftD)
        del_open = D_new == shiftS + float(open_)

        sMat = Sp + sub
        delLin = shiftS + float(indel)
        base = jnp.maximum(jnp.maximum(sMat, delLin), D_new)

        i_vals = j + offs[None, :]
        # i >= 1: the i=0 column is a rail for j >= 1 (IndelRefine.h:414)
        valid = (i_vals >= 1) & (i_vals <= qlen[:, None]) & \
                (j <= tlen[:, None]) & in_band
        base = jnp.where(valid, base, NEGF)

        # within-row closures over d
        L0 = base
        for s in range(log_steps):
            sh = 1 << s
            shifted = jnp.concatenate(
                [jnp.full((B, sh), NEGF), L0[:, :-sh]], axis=1)
            L0 = jnp.maximum(L0, shifted + float(indel) * sh)
        PM = base
        for s in range(log_steps):
            sh = 1 << s
            shifted = jnp.concatenate(
                [jnp.full((B, sh), NEGF), PM[:, :-sh]], axis=1)
            PM = jnp.maximum(PM, shifted)
        I_row = jnp.concatenate(
            [jnp.full((B, 1), NEGF), PM[:, :-1]], axis=1) + float(open_)
        S_row = jnp.maximum(L0, I_row)
        S_row = jnp.where(valid, S_row, NEGF)
        I_row = jnp.where(valid, I_row, NEGF)

        S_left = jnp.concatenate([jnp.full((B, 1), NEGF), S_row[:, :-1]],
                                 axis=1)
        ins_open = I_row == S_left + float(open_)

        # main tie order: match > ins > del > delClose > insClose
        arr = jnp.where(
            S_row == sMat, DIAG,
            jnp.where(S_row == S_left + float(indel), LEFT,
                      jnp.where(S_row == delLin, DOWN,
                                jnp.where(S_row == D_new, REF_DELC,
                                          REF_INSC)))).astype(jnp.int8)
        plane = (arr
                 | jnp.where(del_open, _DEL_OPEN_BIT, 0).astype(jnp.int8)
                 | jnp.where(ins_open, _INS_OPEN_BIT, 0).astype(jnp.int8))
        plane = jnp.where(valid, plane, jnp.int8(-1))

        D_out = jnp.where(valid, D_new, NEGF)
        return (S_row, D_out), plane

    # multi-row unroll (see _banded_arrows): amortize the scan's
    # per-step fixed cost over R rows; identical row math, padded rows
    # sliced off
    R = 8
    nblk = (T + R - 1) // R

    def step(carry, jb):
        st = carry
        rows_l, planes_l = [], []
        for r in range(R):
            j = jb * R + 1 + r
            st, plane = row_update(st, j)
            rows_l.append(st[0])
            planes_l.append(plane)
        return st, (jnp.stack(rows_l), jnp.stack(planes_l))

    D0 = jnp.full((B, band), NEGF)
    _, (rows, planes) = jax.lax.scan(step, (row0, D0), jnp.arange(nblk))
    rows = rows.reshape(nblk * R, B, band)[:T]
    planes = planes.reshape(nblk * R, B, band)[:T]
    rows = jnp.concatenate([row0[None], rows], axis=0)
    planes = jnp.concatenate([arrows0[None], planes], axis=0)
    d_final = (qlen - tlen + K).astype(jnp.int32)
    score = rows[tlen, jnp.arange(B), d_final]
    return score, planes


def _traceback_refine_device(planes, qlen, tlen, K, L):
    """Lane-aware device traceback over refine planes [T+1, B, band].
    Emits one op per step (LEFT/DOWN/DIAG), -1 past the end — identical
    output format to _traceback_ops_device, so the packed download and
    host unpack/blocks code are shared."""
    T1, B, band = planes.shape
    arr_b = jnp.transpose(planes, (1, 0, 2))
    barange = jnp.arange(B, dtype=jnp.int32)
    MAIN, DEL, INS = 0, 1, 2

    def one(state):
        i, j, lane, active = state
        d = i - j + K
        ok = active & (i >= 0) & (j >= 0) & (d >= 0) & (d < band)
        jc = jnp.clip(j, 0, T1 - 1)
        dc = jnp.clip(d, 0, band - 1)
        p = arr_b[barange, jc, dc].astype(jnp.int32)
        code = p & 7
        rail = (p < 0) | ~ok
        dopen = (p & _DEL_OPEN_BIT) != 0
        iopen = (p & _INS_OPEN_BIT) != 0
        # del-lane action: in the del lane, or main cell says delClose
        act_del = (lane == DEL) | ((lane == MAIN) & (code == REF_DELC))
        act_ins = (lane == INS) | ((lane == MAIN) & (code == REF_INSC))
        act_del &= ~rail
        act_ins &= ~rail
        plain = (lane == MAIN) & ~rail & (code != REF_DELC) & \
            (code != REF_INSC) & (code != DONE)
        a = jnp.where(
            act_del, DOWN,
            jnp.where(act_ins, LEFT,
                      jnp.where(plain, code, -1))).astype(jnp.int8)
        lane2 = jnp.where(act_del, jnp.where(dopen, MAIN, DEL),
                          jnp.where(act_ins, jnp.where(iopen, MAIN, INS),
                                    MAIN)).astype(jnp.int32)
        di = jnp.where((a == DIAG) | (a == LEFT), 1, 0)
        dj = jnp.where((a == DIAG) | (a == DOWN), 1, 0)
        return ((i - di).astype(jnp.int32), (j - dj).astype(jnp.int32),
                lane2, a >= 0), a

    # unrolled by R steps per scan iteration (see _traceback_ops_device)
    R = 8
    nblk = (L + R - 1) // R

    def step(state, _):
        outs = []
        for _r in range(R):
            state, a = one(state)
            outs.append(a)
        return state, jnp.stack(outs)

    init = (qlen.astype(jnp.int32), tlen.astype(jnp.int32),
            jnp.zeros(qlen.shape, jnp.int32), jnp.ones(qlen.shape, bool))
    _, ops = jax.lax.scan(step, init, None, length=nblk)
    ops = ops.reshape(nblk * R, -1)[:L]
    return jnp.transpose(ops)


@functools.partial(jax.jit, static_argnames=("K", "m", "mm", "indel"))
def banded_refine_traced_packed(q, t, qlen, tlen, K, m, mm, indel,
                                kband=None):
    """Refine DP + lane-aware device traceback, 2-bit packed like
    banded_global_traced_packed (shared unpack/blocks path)."""
    assert (q.shape[1] + t.shape[1]) % 4 == 0
    _score, planes = _refine_arrows(q, t, qlen, tlen, K, m, mm, indel,
                                    kband)
    L = q.shape[1] + t.shape[1]
    ops = _traceback_refine_device(planes, qlen, tlen, K, L)
    o = jnp.where(ops < 0, 0, ops).astype(jnp.uint8)
    return (o[:, 0::4] | (o[:, 1::4] << 2) | (o[:, 2::4] << 4)
            | (o[:, 3::4] << 6))


def banded_refine_np(q, t, qlen, tlen, K, m, mm, indel, kband):
    """Numpy mirror of _refine_arrows (host fallback; identical
    recurrence and tie order)."""
    B, Q = q.shape
    T = t.shape[1]
    band = 2 * K + 1
    open_ = 2 * indel + 1
    offs = np.arange(-K, K + 1, dtype=np.int64)
    in_band = (offs[None, :] >= -kband[:, None]) & \
              (offs[None, :] <= kband[:, None])
    NEGF_ = np.float32(-1.0e30)

    qpad = np.full((B, Q + 2 * K + T + 2), 5, np.int32)
    qpad[:, K + 1:K + 1 + Q] = q

    Sp = np.where((offs[None, :] >= 0) & in_band
                  & (offs[None, :] <= qlen[:, None]),
                  indel * offs[None, :].astype(np.float32), NEGF_)
    planes = np.full((B, T + 1, band), -1, np.int8)
    planes[:, 0] = np.where(offs[None, :] > 0, LEFT,
                            np.where(offs[None, :] == 0, DONE, -1))
    planes[:, 0][~(in_band & (offs[None, :] <= qlen[:, None]))] = -1

    log_steps = int(np.ceil(np.log2(band)))
    rows_all = np.full((B, T + 1, band), NEGF_, np.float32)
    rows_all[:, 0] = Sp
    Dp = np.full((B, band), NEGF_, np.float32)
    for j in range(1, T + 1):
        qrow = qpad[:, j:j + band]
        sub = np.where(qrow == t[:, j - 1][:, None], float(m), float(mm))
        shiftS = np.concatenate([Sp[:, 1:], np.full((B, 1), NEGF_)], axis=1)
        shiftD = np.concatenate([Dp[:, 1:], np.full((B, 1), NEGF_)], axis=1)
        D_new = np.maximum(shiftS + float(open_), shiftD)
        del_open = D_new == shiftS + float(open_)
        sMat = Sp + sub
        delLin = shiftS + float(indel)
        base = np.maximum(np.maximum(sMat, delLin), D_new)
        i_vals = j + offs[None, :]
        valid = (i_vals >= 1) & (i_vals <= qlen[:, None]) & \
                (j <= tlen[:, None]) & in_band
        base = np.where(valid, base, NEGF_)
        L0 = base
        PM = base
        for s in range(log_steps):
            sh = 1 << s
            L0 = np.maximum(L0, np.concatenate(
                [np.full((B, sh), NEGF_), L0[:, :-sh]], axis=1)
                + float(indel) * sh)
            PM = np.maximum(PM, np.concatenate(
                [np.full((B, sh), NEGF_), PM[:, :-sh]], axis=1))
        I_row = np.concatenate(
            [np.full((B, 1), NEGF_), PM[:, :-1]], axis=1) + float(open_)
        S_row = np.where(valid, np.maximum(L0, I_row), NEGF_)
        I_row = np.where(valid, I_row, NEGF_)
        S_left = np.concatenate([np.full((B, 1), NEGF_), S_row[:, :-1]],
                                axis=1)
        ins_open = I_row == S_left + float(open_)
        arr = np.where(
            S_row == sMat, DIAG,
            np.where(S_row == S_left + float(indel), LEFT,
                     np.where(S_row == delLin, DOWN,
                              np.where(S_row == D_new, REF_DELC,
                                       REF_INSC)))).astype(np.int8)
        plane = (arr | np.where(del_open, _DEL_OPEN_BIT, 0)
                 | np.where(ins_open, _INS_OPEN_BIT, 0)).astype(np.int8)
        planes[:, j] = np.where(valid, plane, np.int8(-1))
        Dp = np.where(valid, D_new, NEGF_).astype(np.float32)
        Sp = S_row.astype(np.float32)
        rows_all[:, j] = S_row
    d_final = (qlen - tlen + K).astype(np.int64)
    score = rows_all[np.arange(B), tlen, d_final]
    return score, planes


def traceback_refine(planes: np.ndarray, qlen: int, tlen: int, K: int):
    """Host lane-aware traceback of one problem's refine plane
    [T+1, band].  Returns blocks [(q_off, t_off, len)]."""
    i, j = int(qlen), int(tlen)
    lane = 0    # 0 main, 1 del, 2 ins
    ops: list = []
    band = planes.shape[1]
    while i >= 0 and j >= 0:
        d = i - j + K
        if d < 0 or d >= band:
            break
        p = int(planes[j, d])
        if p < 0:
            break
        code = p & 7
        if lane == 1 or (lane == 0 and code == REF_DELC):
            ops.append(DOWN)
            lane = 0 if (p & _DEL_OPEN_BIT) else 1
            j -= 1
        elif lane == 2 or (lane == 0 and code == REF_INSC):
            ops.append(LEFT)
            lane = 0 if (p & _INS_OPEN_BIT) else 2
            i -= 1
        elif code == DONE:
            break
        elif code == DIAG:
            ops.append(DIAG)
            i -= 1
            j -= 1
        elif code == LEFT:
            ops.append(LEFT)
            i -= 1
        elif code == DOWN:
            ops.append(DOWN)
            j -= 1
        else:
            break
    blocks = []
    qPos = tPos = 0
    run = 0
    for op in ops[::-1]:
        if op == DIAG:
            run += 1
            qPos += 1
            tPos += 1
        else:
            if run:
                blocks.append((qPos - run, tPos - run, run))
                run = 0
            if op == LEFT:
                qPos += 1
            else:
                tPos += 1
    if run:
        blocks.append((qPos - run, tPos - run, run))
    return blocks


def banded_global_np(q, t, qlen, tlen, K, m, mm, indel, kband):
    """Batched numpy mirror of banded_global_kernel (identical recurrence,
    used as the host fallback so CPU-only runs get the same batching).

    q: int8[B,Q], t: int8[B,T], qlen/tlen/kband: int[B].
    Returns (score f32[B], arrows int8[B, T+1, 2K+1]).
    """
    B, Q = q.shape
    T = t.shape[1]
    band = 2 * K + 1
    offs = np.arange(-K, K + 1, dtype=np.int64)
    in_band = (offs[None, :] >= -kband[:, None]) & \
              (offs[None, :] <= kband[:, None])
    NEGF = np.float32(-1.0e30)

    qpad = np.full((B, Q + 2 * K + T + 2), 5, np.int32)
    qpad[:, K + 1:K + 1 + Q] = q

    row = np.where((offs[None, :] >= 0) & in_band,
                   indel * offs[None, :].astype(np.float32), NEGF)
    arrows = np.full((B, T + 1, band), -1, np.int8)
    arrows[:, 0] = np.where(offs[None, :] > 0, LEFT,
                            np.where(offs[None, :] == 0, DONE, -1))
    arrows[:, 0][~in_band] = -1

    log_steps = int(np.ceil(np.log2(band)))
    rows_all = np.full((B, T + 1, band), NEGF, np.float32)
    rows_all[:, 0] = row
    for j in range(1, T + 1):
        prev = row
        qrow = qpad[:, j:j + band]
        sub = np.where(qrow == t[:, j - 1][:, None], float(m), float(mm))
        sMat = prev + sub
        prev_shift = np.concatenate(
            [prev[:, 1:], np.full((B, 1), NEGF)], axis=1)
        sDel = prev_shift + float(indel)
        base = np.maximum(sMat, sDel)
        i_vals = j + offs[None, :]
        is_i0 = i_vals == 0
        base = np.where(is_i0, float(indel) * j, base)
        valid = (i_vals >= 0) & (i_vals <= qlen[:, None]) & \
                (j <= tlen[:, None]) & in_band
        base = np.where(valid, base, NEGF)
        row = base
        for s in range(log_steps):
            sh = 1 << s
            shifted = np.concatenate(
                [np.full((B, sh), NEGF), row[:, :-sh]], axis=1)
            row = np.maximum(row, shifted + float(indel) * sh)
        row = np.where(valid, row, NEGF)
        row_left = np.concatenate([np.full((B, 1), NEGF), row[:, :-1]],
                                  axis=1)
        arr = np.where(row == row_left + float(indel), LEFT,
                       np.where(row == sDel, DOWN, DIAG)).astype(np.int8)
        arr = np.where(is_i0, np.int8(DOWN), arr)
        arr = np.where(valid, arr, np.int8(-1))
        arrows[:, j] = arr
        rows_all[:, j] = row
    d_final = (qlen - tlen + K).astype(np.int64)
    score = rows_all[np.arange(B), tlen, d_final]
    return score, arrows
