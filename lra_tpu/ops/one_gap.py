"""Device one-long-gap banded aligner.

Batched TPU kernel for the separated prefix/suffix band regime of the
reference's ``AffineOneGapAlign`` (reference: AffineOneGapAlign.h:157,
194-201): when |qLen - tLen| > 2k the alignment is a k-banded prefix
matrix from (0,0), a k-banded suffix matrix anchored at (qLen,tLen), and
ONE free arbitrarily-long gap joining them (a column-max closure when
the query is longer, a row-max closure when the target is longer).

Bit-identical to the host oracle ``align.affine.affine_one_gap_align``
(same integer scores, same tie order LEFT > DOWN > DIAG > GAPLEFT >
GAPDOWN, same >=-latest / >-earliest closure argmax conventions, same
border seeding) — enforced by tests/test_one_gap.py fuzzing.

Data layout per (K, D) bucket: lanes are band offsets.  Prefix lanes
d = i - j + K (width 2K+1).  Suffix lanes e = i - j - (qlen - tlen) + K
extended two lanes down and one up (width 2K+4, index e + 2) to carry
the reference's border-seed rails.  Scans run over the target axis j;
per-problem offsets (tLow) are absorbed by pre-shifting the input code
planes with one gather so the scan body stays uniform.

The free gap spans the middle of the longer sequence, which the DP
never reads — inputs are therefore COMPACTED to a head window (first
D+K codes, feeding the prefix band) and a tail window (last D+K+4
codes, feeding the suffix band).  Bucket shapes depend only on (K, D),
never on the gap length: a 50kb SV gap costs the same as a 200bp one.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

# op codes shared with align.affine
DONE, LEFT, DOWN, DIAG, BORDER, GAPLEFT, GAPDOWN = range(7)

NEGF = np.float32(-1e9)


def _closure_left(row, B, width, indel):
    """row[e] = max_{e' <= e} row[e'] + indel * (e - e')  (the in-column
    insertion chain, linear gap => log-step max-plus closure)."""
    log_steps = int(np.ceil(np.log2(max(2, width))))
    for s in range(log_steps):
        sh = 1 << s
        shifted = jnp.concatenate(
            [jnp.full((B, sh), NEGF), row[:, :-sh]], axis=1)
        row = jnp.maximum(row, shifted + float(indel) * sh)
    return row


def _prefix_pass(q, qlen, tlen, kband, K, D, m, mm, indel, t):
    """Banded prefix DP from (0,0).

    Returns (arrows [TP+1, B, 2K+1], rows [TP+1, B, 2K+1],
             lower_max/lower_idx [B, TP+1] per column j,
             upper_max/upper_idx [B, UP] per row i, padded by K).
    """
    B = q.shape[0]
    LP = 2 * K + 1
    TPs = D + K - 1          # scan j = 1 .. TPs
    offs = jnp.arange(-K, K + 1, dtype=jnp.int32)
    in_band = jnp.abs(offs)[None, :] <= kband[:, None]
    diag = jnp.minimum(qlen, tlen)
    qB1 = jnp.minimum(diag + kband - 1, qlen)   # qBoundary - 1
    tB1 = jnp.minimum(diag + kband - 1, tlen)   # tBoundary - 1

    # row j=0: P[i,0] = indel*i for 0 <= i <= kband
    row0 = jnp.where((offs[None, :] >= 0) & in_band,
                     float(indel) * offs[None, :].astype(jnp.float32), NEGF)
    arrows0 = jnp.where(offs[None, :] > 0, LEFT,
                        jnp.where(offs[None, :] == 0, DONE, -1)
                        ).astype(jnp.int8)
    arrows0 = jnp.where(in_band & (offs[None, :] <= qB1[:, None]),
                        arrows0, jnp.int8(-1))
    row0 = jnp.where(offs[None, :] <= qB1[:, None], row0, NEGF)

    qpad = jnp.pad(q.astype(jnp.int32), ((0, 0), (K + 1, K + TPs + 2)),
                   constant_values=9)

    UP = D + 3 * K + 4       # upper arrays padded: row i at index i + K
    up0 = jnp.full((B, UP), NEGF)
    upi0 = jnp.zeros((B, UP), jnp.int32)
    # init upperMax[0] = 0 (idx 0) when qlen <= tlen
    up0 = up0.at[:, K].set(jnp.where(qlen <= tlen, 0.0, NEGF))

    def row_update(carry, j):
        prev, up, upi = carry
        qrow = jax.lax.dynamic_slice_in_dim(qpad, j, LP, axis=1)
        tj = t[:, jnp.minimum(j - 1, t.shape[1] - 1)]  # clip: unroll pad
        sub = jnp.where(qrow == tj[:, None], float(m), float(mm))
        i_vals = j + offs[None, :]                    # [1,LP] -> [B,LP]
        i_vals = jnp.broadcast_to(i_vals, (B, LP))

        sMat = prev + sub
        prev_shift = jnp.concatenate(
            [prev[:, 1:], jnp.full((B, 1), NEGF)], axis=1)
        sDel = prev_shift + float(indel)
        base = jnp.maximum(sMat, sDel)

        # main-loop cell range: 1 <= i <= qB1, j <= tB1, |i-j| <= kband
        valid = (i_vals >= 1) & (i_vals <= qB1[:, None]) & \
                (j <= tB1[:, None]) & in_band
        # i=0 rail: P[0,j] = indel*j exists for j <= kband+1; the lane
        # for i=0 is outside the band at j = kband+1, so the i=1 cell's
        # insertion from the rail is injected explicitly
        rail_ins = jnp.where(
            (i_vals == 1) & (j <= kband[:, None] + 1) & valid,
            float(indel) * (j + 1), NEGF)
        base = jnp.maximum(base, rail_ins)
        base = jnp.where(valid, base, NEGF)

        row = _closure_left(base, B, LP, indel)
        row = jnp.where(valid, row, NEGF)
        # i=0 lane value (in band while j <= kband): P[0,j] = indel*j
        is_i0 = (i_vals == 0) & in_band & (j <= tB1[:, None])
        row = jnp.where(is_i0, float(indel) * j, row)

        row_left = jnp.concatenate(
            [jnp.full((B, 1), NEGF), row[:, :-1]], axis=1)
        is_ins = (row == row_left + float(indel)) | (row == rail_ins)
        arr = jnp.where(
            is_ins, LEFT,
            jnp.where(row == sDel, DOWN, DIAG)).astype(jnp.int8)
        arr = jnp.where(is_i0, jnp.int8(DOWN), arr)
        arr = jnp.where(valid | is_i0, arr, jnp.int8(-1))

        # lowerMax[j]: last (largest-i) max over main cells with
        # i < qlen - kband  (host uses >=, ascending i => last wins)
        lm_ok = valid & (i_vals < qlen[:, None] - kband[:, None]) & \
            (j <= diag[:, None])
        lm_vals = jnp.where(lm_ok, row, NEGF)
        rev = lm_vals[:, ::-1]
        amax_rev = jnp.argmax(rev, axis=1)
        amax = LP - 1 - amax_rev
        lower_max = jnp.max(lm_vals, axis=1)
        lower_idx = (j + offs[amax]).astype(jnp.int32)

        # upperMax[i] strict >, earliest j wins: window update at rows
        # i = j + offs  (padded index i + K => window start j)
        um_ok = valid & (i_vals <= diag[:, None]) & (j < tlen[:, None])
        cand = jnp.where(um_ok, row, NEGF)
        win = jax.lax.dynamic_slice_in_dim(up, j, LP, axis=1)
        wini = jax.lax.dynamic_slice_in_dim(upi, j, LP, axis=1)
        upd = cand > win
        win = jnp.where(upd, cand, win)
        wini = jnp.where(upd, j, wini)
        up = jax.lax.dynamic_update_slice_in_dim(up, win, j, axis=1)
        upi = jax.lax.dynamic_update_slice_in_dim(upi, wini, j, axis=1)

        return (row, up, upi), (row, arr, lower_max, lower_idx)

    # R-row unroll (see affine_kernel._banded_arrows): scan fixed cost
    # dominates the tiny per-row tiles; padded rows are masked invalid
    # (j > tB1) so their up/upi window writes are no-ops, and their
    # stacked outputs are sliced off below
    R = 8
    nblk = (TPs + R - 1) // R

    def step(carry, jb):
        outs = []
        for r in range(R):
            j = jb * R + 1 + r
            carry, out = row_update(carry, j)
            outs.append(out)
        return carry, tuple(jnp.stack(x) for x in zip(*outs))

    (_, up, upi), (rows, arrows, lmax, lidx) = jax.lax.scan(
        step, (row0, up0, upi0), jnp.arange(nblk))
    rows = rows.reshape(nblk * R, *rows.shape[2:])[:TPs]
    arrows = arrows.reshape(nblk * R, *arrows.shape[2:])[:TPs]
    lmax = lmax.reshape(nblk * R, *lmax.shape[2:])[:TPs]
    lidx = lidx.reshape(nblk * R, *lidx.shape[2:])[:TPs]
    rows = jnp.concatenate([row0[None], rows], axis=0)
    arrows = jnp.concatenate([arrows0[None], arrows], axis=0)
    # lower arrays indexed by j: prepend j=0 (P[0,0]=0 when qlen>=tlen)
    lm0 = jnp.where(qlen >= tlen, 0.0, NEGF)
    lmax = jnp.concatenate([lm0[None], lmax], axis=0)   # [TPs+1, B]
    lidx = jnp.concatenate([jnp.zeros((1, B), jnp.int32), lidx], axis=0)
    return arrows, rows, jnp.transpose(lmax), jnp.transpose(lidx), up, upi


def _suffix_pass(q_tail, t_tail, qlen, tlen, kband, K, D, m, mm, indel,
                 lmax, up, upi):
    """Banded suffix DP anchored at (qlen, tlen) with free-gap closures.

    q_tail/t_tail: int32[B, HS] with HS = D+K+4, tail[b, z] =
    seq[b, len - HS + z] (out-of-range positions = PAD code).

    Lanes e_idx = i - j - (qlen - tlen) + K + 2, width 2K+4.
    Returns (arrows [TSs+1, B, 2K+4], score [B], rows)."""
    B = q_tail.shape[0]
    LS = 2 * K + 4
    HS = D + K + 4
    TSs = D + K + 2          # scan s = 0 .. TSs-1, j = tLow + 1 + s
    diag = jnp.minimum(qlen, tlen)
    isA = qlen > tlen
    dqt = qlen - tlen
    qStart = qlen - diag
    tStart = tlen - diag
    tLow = jnp.maximum(0, tlen - diag - kband - 2)
    qLow = jnp.maximum(0, qlen - diag - kband - 1)

    eoffs = jnp.arange(LS, dtype=jnp.int32) - (K + 2)   # e_static values

    # pre-shift gathers (one take_along_axis each):
    #  t codes for step s: t[j-1] = t[tLow + s] -> tail z = tLow+s-tlen+HS
    sidx = jnp.arange(TSs, dtype=jnp.int32)
    PAD = 9
    tpadded = jnp.pad(t_tail, ((0, 0), (0, TSs + 2)),
                      constant_values=PAD)
    tzoff = tLow - tlen + HS
    tsh = jnp.take_along_axis(
        tpadded, jnp.clip(tzoff[:, None] + sidx[None, :], 0,
                          tpadded.shape[1] - 1), axis=1)
    #  q codes at i-1, i = j + dqt + e: absolute i-1 = qoff + (s + e_idx)
    #  with qoff = tLow + dqt - K - 2  (e = e_idx - K - 2, j = tLow+1+s);
    #  tail z = (i-1) - qlen + HS  =>  zoff = tLow - tlen - K - 2 + HS
    uidx = jnp.arange(TSs + LS, dtype=jnp.int32)
    qpadded = jnp.pad(q_tail, ((0, 0), (HS + LS + 4, TSs + LS + 4)),
                      constant_values=PAD)
    qzoff = tLow - tlen - K - 2 + HS + (HS + LS + 4)
    qsh = jnp.take_along_axis(
        qpadded, jnp.clip(qzoff[:, None] + uidx[None, :], 0,
                          qpadded.shape[1] - 1), axis=1)
    #  lowerMax at column j: lmsh[s] = lmax[tLow + 1 + s]; lm0 = lmax[tLow]
    TPcols = lmax.shape[1]
    lmpad = jnp.pad(lmax, ((0, 0), (0, TSs + 2)), constant_values=NEGF)
    lmsh = jnp.take_along_axis(
        lmpad, jnp.clip(tLow[:, None] + 1 + sidx[None, :], 0,
                        lmpad.shape[1] - 1), axis=1)
    lm_at_tlow = jnp.take_along_axis(lmax, jnp.clip(
        tLow[:, None], 0, TPcols - 1), axis=1)[:, 0]
    #  upperMax at row i (padded by K): index = i + K = uoff2 + (s+e_idx)
    #  with uoff2 = tLow + 1 + dqt - K - 2 + K = tLow + 1 + dqt - 2
    UPW = up.shape[1]
    uppad = jnp.pad(up, ((0, 0), (0, TSs + LS + 2)), constant_values=NEGF)
    uoff2 = tLow + 1 + dqt - 2
    upsh = jnp.take_along_axis(
        uppad, jnp.clip(uoff2[:, None] + uidx[None, :], 0,
                        uppad.shape[1] - 1), axis=1)
    #  border-b' (case B) upper gather at i_b = j - tStart + kband + 1:
    #  ubsh[s] = up[i_b + K] with i_b = tLow + 1 + s - tStart + kband + 1
    ubidx = tLow + 1 - tStart + kband + 1 + K
    ubsh = jnp.take_along_axis(
        uppad, jnp.clip(ubidx[:, None] + sidx[None, :], 0,
                        uppad.shape[1] - 1), axis=1)

    # carry init, column j = tLow
    i0_vals = tLow[:, None] + dqt[:, None] + eoffs[None, :]   # i at j=tLow
    # case A (tLow == 0): border-a cells i in [qLow, qStart+kband]
    bA = isA[:, None] & (i0_vals >= qLow[:, None]) & \
        (i0_vals <= qStart[:, None] + kband[:, None])
    # case B: border-a' cell i = 0 at column tLow (value upperMax[0] = 0)
    bB = (~isA[:, None]) & (i0_vals == 0)
    row0 = jnp.where(bA, lm_at_tlow[:, None],
                     jnp.where(bB, up[:, K][:, None], NEGF))
    arrows0 = jnp.where(bA, GAPLEFT,
                        jnp.where(bB, GAPDOWN, -1)).astype(jnp.int8)

    eA_idx = qLow - 1 - dqt + K + 2       # case A border-b lane index
    eB_idx = K + kband + 3                # case B border-b' lane index

    def row_update(carry, s):
        prev, acc = carry
        j = tLow + 1 + s                                  # [B]
        i_vals = j[:, None] + dqt[:, None] + eoffs[None, :]
        sc = jnp.minimum(s, tsh.shape[1] - 1)   # clip: unroll pad
        tcode = tsh[:, sc][:, None]
        qcode = jax.lax.dynamic_slice_in_dim(qsh, s, LS, axis=1)
        sub = jnp.where(qcode == tcode, float(m), float(mm))

        sMat = prev + sub
        prev_shift = jnp.concatenate(
            [prev[:, 1:], jnp.full((B, 1), NEGF)], axis=1)
        sDel = prev_shift + float(indel)

        # main-loop range: max(qLow+1, center-k) <= i <= min(qlen,
        # center+k), j <= tlen; center = j + dqt, so |e| <= kband
        e_ok = jnp.abs(eoffs[None, :]) <= kband[:, None]
        valid = e_ok & (i_vals >= qLow[:, None] + 1) & \
            (i_vals <= qlen[:, None]) & (j[:, None] <= tlen[:, None])

        delC = jnp.where(
            isA[:, None] & (j[:, None] <= diag[:, None]) & valid,
            lmsh[:, s][:, None], NEGF)
        insC = jnp.where(
            (~isA[:, None]) & (i_vals <= diag[:, None]) & valid,
            jax.lax.dynamic_slice_in_dim(upsh, s, LS, axis=1), NEGF)

        base = jnp.maximum(jnp.maximum(sMat, sDel),
                           jnp.maximum(delC, insC))
        base = jnp.where(valid, base, NEGF)

        # border seeds of this column, injected before the insertion
        # closure so cells above can chain from them
        bAcell = isA[:, None] & \
            (eoffs[None, :] + K + 2 == eA_idx[:, None]) & \
            (j[:, None] <= diag[:, None]) & \
            (i_vals >= 0) & (i_vals <= qlen[:, None]) & \
            (j[:, None] <= tlen[:, None])
        bBcell = (~isA[:, None]) & (i_vals == 0) & \
            (j[:, None] >= tLow[:, None]) & \
            (j[:, None] <= jnp.minimum(tStart + kband + 1, tlen)[:, None])
        i_b = j - tStart + kband + 1
        bB2cell = (~isA[:, None]) & \
            (eoffs[None, :] + K + 2 == eB_idx[:, None]) & \
            (i_b[:, None] >= 1) & (i_b[:, None] <= diag[:, None]) & \
            (i_vals <= qlen[:, None]) & (j[:, None] <= tlen[:, None])
        bval = jnp.where(
            bAcell, lmsh[:, s][:, None],
            jnp.where(bBcell, up[:, K][:, None],
                      jnp.where(bB2cell, ubsh[:, s][:, None], NEGF)))
        border = bAcell | bBcell | bB2cell
        base = jnp.where(border & ~valid, bval, base)

        row = _closure_left(base, B, LS, indel)
        row = jnp.where(valid | (border & ~valid), row, NEGF)
        # border cells outside the main range keep the pure seed (the
        # reference assigns, never maxes, at seed cells)
        row = jnp.where(border & ~valid, bval, row)

        row_left = jnp.concatenate(
            [jnp.full((B, 1), NEGF), row[:, :-1]], axis=1)
        arr = jnp.where(
            row == row_left + float(indel), LEFT,
            jnp.where(row == sDel, DOWN,
                      jnp.where(row == sMat, DIAG,
                                jnp.where(row == delC, GAPLEFT,
                                          GAPDOWN)))).astype(jnp.int8)
        arr = jnp.where(border & ~valid,
                        jnp.where(bAcell, GAPLEFT, GAPDOWN).astype(jnp.int8),
                        arr)
        arr = jnp.where(valid | (border & ~valid), arr, jnp.int8(-1))
        # capture the final score in the carry instead of gathering from
        # the stacked rows afterwards — lets XLA drop the f32 row stack
        # entirely (only the int8 arrows are needed downstream)
        acc2 = jnp.where(j == tlen, row[:, K + 2], acc)
        return (row, acc2), (row, arr)

    # R-row unroll; padded rows (j > tlen) are fully masked and sliced
    R = 8
    nblk = (TSs + R - 1) // R

    def step(carry, sb):
        outs = []
        for r in range(R):
            carry, out = row_update(carry, sb * R + r)
            outs.append(out)
        return carry, tuple(jnp.stack(x) for x in zip(*outs))

    acc0 = jnp.full((B,), NEGF)
    (_, score), (rows, arrows) = jax.lax.scan(step, (row0, acc0),
                                              jnp.arange(nblk))
    rows = rows.reshape(nblk * R, *rows.shape[2:])[:TSs]
    arrows = arrows.reshape(nblk * R, *arrows.shape[2:])[:TSs]
    arrows = jnp.concatenate([arrows0[None], arrows], axis=0)
    rows = jnp.concatenate([row0[None], rows], axis=0)
    return arrows, score, rows


def _traceback(parr, sarr, qlen, tlen, kband, K, D, lidx, upi, L):
    """Device traceback: suffix walk -> gap jump -> prefix walk.

    Returns (ops int8 [B, L] end-first, -1 padded; jump_len int32 [B];
    the single GAPLEFT/GAPDOWN op in the stream marks where the free
    gap sits)."""
    B = qlen.shape[0]
    diag = jnp.minimum(qlen, tlen)
    dqt = qlen - tlen
    tLow = jnp.maximum(0, tlen - diag - kband - 2)
    barange = jnp.arange(B, dtype=jnp.int32)
    # planes as [B, rows, lanes] for batched gathers
    pa = jnp.transpose(parr, (1, 0, 2))
    sa = jnp.transpose(sarr, (1, 0, 2))
    TP1 = pa.shape[1]
    TS1 = sa.shape[1]
    UPW = upi.shape[1]

    def one(state):
        i, j, phase, active, jump = state
        # phase 0 = suffix, 1 = prefix
        srow = jnp.clip(j - tLow, 0, TS1 - 1)
        slane = jnp.clip(i - j - dqt + K + 2, 0, 2 * K + 3)
        prow = jnp.clip(j, 0, TP1 - 1)
        plane = jnp.clip(i - j + K, 0, 2 * K)
        a_s = sa[barange, srow, slane]
        a_p = pa[barange, prow, plane]
        a = jnp.where(phase == 0, a_s, a_p)
        ok = active & (i >= 0) & (j >= 0) & (a >= 0) & (a != DONE)
        a = jnp.where(ok, a, jnp.int8(-1))
        is_gl = a == GAPLEFT
        is_gd = a == GAPDOWN
        land_i = lidx[barange, jnp.clip(j, 0, lidx.shape[1] - 1)]
        land_j = upi[barange, jnp.clip(i + K, 0, UPW - 1)]
        jump2 = jnp.where(is_gl, i - land_i,
                          jnp.where(is_gd, j - land_j, jump))
        i2 = jnp.where(is_gl, land_i,
                       jnp.where((a == DIAG) | (a == LEFT), i - 1, i))
        j2 = jnp.where(is_gd, land_j,
                       jnp.where((a == DIAG) | (a == DOWN), j - 1, j))
        phase2 = jnp.where(is_gl | is_gd, 1, phase)
        active2 = a >= 0
        return ((i2.astype(jnp.int32), j2.astype(jnp.int32), phase2,
                 active2, jump2.astype(jnp.int32)), a)

    # R-step unroll of the walk
    R = 8
    nblk = (L + R - 1) // R

    def step(state, _):
        outs = []
        for _r in range(R):
            state, a = one(state)
            outs.append(a)
        return state, jnp.stack(outs)

    init = (qlen.astype(jnp.int32), tlen.astype(jnp.int32),
            jnp.zeros(B, jnp.int32), jnp.ones(B, bool),
            jnp.zeros(B, jnp.int32))
    (_, _, _, _, jump), ops = jax.lax.scan(step, init, None, length=nblk)
    ops = ops.reshape(nblk * R, -1)[:L]
    return jnp.transpose(ops), jump


HEAD = lambda K, D: D + K            # head window width
TAIL = lambda K, D: D + K + 4        # tail window width


@functools.partial(jax.jit,
                   static_argnames=("K", "D", "m", "mm", "indel", "L"))
def one_gap_traced(q_head, t_head, q_tail, t_tail, qlen, tlen, kband,
                   K, D, m, mm, indel, L):
    """Batched one-long-gap alignment with device traceback.

    q_head/t_head: int32[B, D+K] (codes from position 0), q_tail/t_tail:
    int32[B, D+K+4] (tail[z] = seq[len - (D+K+4) + z], out-of-range
    slots arbitrary), qlen/tlen/kband: int32[B] with kband <= K,
    min(qlen,tlen) <= D, and the one-gap regime min + 2*kband < max
    for every problem.

    Returns (ops int8[B, L] end-first with codes LEFT/DOWN/DIAG/
    GAPLEFT/GAPDOWN and -1 padding, jump_len int32[B], score f32[B])."""
    parr, _rows, lmax, lidx, up, upi = _prefix_pass(
        q_head, qlen, tlen, kband, K, D, m, mm, indel, t_head)
    sarr, score, _srows = _suffix_pass(q_tail, t_tail, qlen, tlen, kband,
                                       K, D, m, mm, indel, lmax, up, upi)
    ops, jump = _traceback(parr, sarr, qlen, tlen, kband, K, D,
                           lidx, upi, L)
    return ops, jump, score


def pack_one_gap_bucket(qs: list, ts: list, K: int, D: int):
    """Host packing of a job list into head/tail windows + length arrays
    (numpy, no per-base python loops beyond the slice copies)."""
    B = len(qs)
    HP, HS = HEAD(K, D), TAIL(K, D)
    qh = np.full((B, HP), 4, np.int32)
    th = np.full((B, HP), 4, np.int32)
    qt = np.full((B, HS), 4, np.int32)
    tt = np.full((B, HS), 4, np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    for b, (qa, ta) in enumerate(zip(qs, ts)):
        nq, nt = len(qa), len(ta)
        qlen[b], tlen[b] = nq, nt
        qh[b, :min(nq, HP)] = qa[:HP]
        th[b, :min(nt, HP)] = ta[:HP]
        zq = min(nq, HS)
        qt[b, HS - zq:] = qa[nq - zq:]
        zt = min(nt, HS)
        tt[b, HS - zt:] = ta[nt - zt:]
    return qh, th, qt, tt, qlen, tlen


def blocks_from_one_gap_ops(ops_row: np.ndarray, jump: int):
    """Host assembly of ascending blocks from one problem's end-first op
    stream (mirror of align.affine's final block emission)."""
    neg = np.nonzero(ops_row < 0)[0]
    n = int(neg[0]) if len(neg) else len(ops_row)
    seq = ops_row[:n][::-1]
    blocks = []
    qPos = tPos = 0
    run = 0
    for op in seq.tolist():
        if op == DIAG:
            if run == 0:
                rq, rt = qPos, tPos
            run += 1
            qPos += 1
            tPos += 1
            continue
        if run:
            blocks.append((rq, rt, run))
            run = 0
        if op == LEFT:
            qPos += 1
        elif op == DOWN:
            tPos += 1
        elif op == GAPLEFT:
            qPos += jump
        elif op == GAPDOWN:
            tPos += jump
    if run:
        blocks.append((rq, rt, run))
    return blocks
