"""Pallas TPU kernel: fused banded alignment + row-synchronous traceback.

The XLA formulation (ops/affine_kernel.py) is bottlenecked by the
traceback's per-step [B] gather from the [B, T+1, band] arrow tensor —
XLA lowers each gather step at ~0.01-0.25ms, 30-45ms per bucket.

This kernel fuses the banded DP forward pass (identical recurrence,
masks, and tie-break order to ops/affine_kernel._banded_arrows) with a
traceback reformulated to be *row-synchronous*: every alignment path
visits each DP row at most once (a run of LEFT ops within the row, then
exactly one DIAG or DOWN that moves to the previous row), so all
problems of a tile trace back together, one vectorized step per row:

    rl  = length of the LEFT run ending at the current cell
          (a log-step prefix scan over the row's LEFT arrows)
    a2  = the arrow after the run: DIAG (1), DOWN (2), or stop (3)
    emit P[b, j] = rl << 2 | code;  i -= rl + (a2 == DIAG);  j -= 1

The [B, S+1] uint8 P plane is the only output; the host reconstructs
match blocks from it with cumulative sums (blocks_from_rowsync).

Constraints: square buckets (Q == T == S, S % 8 == 0), band 2K+1 <= 63
so the run length fits 6 bits (the narrow gap-closing tier; the wide
indel tier falls back to the XLA path), and Mosaic's layout rules:
dynamic indexing only on the leading dim (arrows live as [S+1, BT,
BANDP] scratch), no dynamic lane slices (the substitution plane is
precomputed outside from static shifted slices).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..align.affine import DIAG, DONE, DOWN, LEFT

NEGF = -1.0e30   # python float: jnp scalars would be captured consts


def _kernel(eq_ref, qlen_ref, tlen_ref, kband_ref, p_ref,
            arrows_ref, row_ref, *, S, K, BANDP, SP, m, mm, indel, BT, R):
    band = 2 * K + 1
    jblk = pl.program_id(1)            # R DP rows per grid step
    col = jax.lax.broadcasted_iota(jnp.int32, (BT, BANDP), 1)
    offs = col - K
    kb = kband_ref[:, :1]
    # int32 mask: i1 vectors captured across pl.when/loop regions trip
    # Mosaic's relayout inference
    ib = jnp.where((offs >= -kb) & (offs <= kb) & (col < band), 1, 0)
    qlen = qlen_ref[:, :1]
    tlen = tlen_ref[:, :1]

    @pl.when(jblk == 0)
    def _():
        row0 = jnp.where((offs >= 0) & (ib > 0),
                         float(indel) * offs.astype(jnp.float32), NEGF)
        a0 = jnp.where(offs > 0, LEFT,
                       jnp.where(offs == 0, DONE, -1))
        arrows_ref[0, :, :] = jnp.where(ib > 0, a0, -1).astype(jnp.int8)
        row_ref[:, :] = row0

    for r in range(R):
        j1 = jblk * R + r + 1          # DP row index, 1..S
        prev = row_ref[:, :]
        # astype before compare: an i1 derived straight from an int8
        # middle-dim block slice trips Mosaic's relayout inference
        sub = jnp.where(eq_ref[:, r, :].astype(jnp.int32) != 0,
                        float(m), float(mm))
        sMat = prev + sub
        prev_shift = jnp.concatenate(
            [prev[:, 1:], jnp.full((BT, 1), NEGF)], axis=1)
        sDel = prev_shift + float(indel)
        base = jnp.maximum(sMat, sDel)
        i_vals = j1 + offs
        is_i0 = i_vals == 0
        base = jnp.where(is_i0, float(indel) * j1.astype(jnp.float32),
                         base)
        valid = (i_vals >= 0) & (i_vals <= qlen) & (j1 <= tlen) & (ib > 0)
        base = jnp.where(valid, base, NEGF)
        row = base
        for s in range(int(np.ceil(np.log2(band)))):
            sh = 1 << s
            shifted = jnp.concatenate(
                [jnp.full((BT, sh), NEGF), row[:, :-sh]], axis=1)
            row = jnp.maximum(row, shifted + float(indel) * sh)
        row = jnp.where(valid, row, NEGF)
        row_left = jnp.concatenate(
            [jnp.full((BT, 1), NEGF), row[:, :-1]], axis=1)
        arr = jnp.where(
            row == row_left + float(indel), LEFT,
            jnp.where(row == sDel, DOWN, DIAG))
        arr = jnp.where(is_i0, DOWN, arr)
        arr = jnp.where(valid, arr, -1)
        arrows_ref[pl.ds(j1, 1), :, :] = arr.astype(jnp.int8)[None]
        row_ref[:, :] = row

    @pl.when(jblk == S // R - 1)
    def _():
        spiota = jax.lax.broadcasted_iota(jnp.int32, (BT, SP), 1)

        zb = jnp.zeros((BT, BANDP), jnp.int32)
        zp = jnp.zeros((BT, SP), jnp.int32)

        def tb_row(rr, st):
            # iv/active: [BT, BANDP] i32, lane-replicated (Mosaic rejects
            # explicit broadcast_to of lane-0 vectors; implicit binop
            # broadcasts of keepdims reductions are fine)
            iv, active, P = st
            j = S - rr
            slab = arrows_ref[pl.ds(j, 1), :, :] \
                .reshape(BT, BANDP).astype(jnp.int32)
            started = jnp.where(tlen >= j, 1, 0) + zb   # [BT, BANDP]
            here = active * started
            d = jnp.clip(iv - j + K, 0, BANDP - 1)
            is_left = jnp.where(slab == LEFT, 1, 0) * ib
            # LEFT-run length ending at each cell (log-step doubling)
            rl = is_left
            sh = 1
            while sh < 64:
                shifted = jnp.concatenate(
                    [jnp.zeros((BT, sh), jnp.int32), rl[:, :-sh]], axis=1)
                rl = jnp.where(rl == sh, rl + shifted, rl)
                sh *= 2
            rl_b = jnp.max(jnp.where(col == d, rl, 0), axis=1,
                           keepdims=True) + zb
            d2 = jnp.clip(d - rl_b, 0, BANDP - 1)
            a2 = jnp.max(jnp.where(col == d2, slab, -128), axis=1,
                         keepdims=True) + zb
            dk = iv - j + K
            ok = here * jnp.where(dk >= 0, 1, 0) \
                * jnp.where(dk < band, 1, 0)
            is_diag = jnp.where(a2 == DIAG, 1, 0)
            is_down = jnp.where(a2 == DOWN, 1, 0)
            moved = ok * jnp.where(is_diag + is_down > 0, 1, 0)
            code = jnp.where(a2 == DIAG, 1,
                             jnp.where(a2 == DOWN, 2, 3))
            val = ((rl_b << 2) | code) * ok              # [BT, BANDP]
            val1 = jnp.max(val, axis=1, keepdims=True)   # [BT, 1]
            ok1 = jnp.max(ok, axis=1, keepdims=True)
            P = jnp.where((spiota == j) & (ok1 + zp > 0), val1 + zp, P)
            iv = iv - moved * (rl_b + is_diag)
            active = active * jnp.where(started > 0, moved, 1)
            return (iv, active, P)

        init = (qlen.astype(jnp.int32) + zb,
                jnp.ones((BT, BANDP), jnp.int32),
                jnp.zeros((BT, SP), jnp.int32))
        _, _, P = jax.lax.fori_loop(0, S + 1, tb_row, init)
        p_ref[:, :] = P.astype(jnp.uint8)


def _tile_rows(S: int, BANDP: int) -> int:
    budget = 4 * 1024 * 1024
    bt = max(1, budget // ((S + 1) * BANDP))
    p = 1
    while p * 2 <= bt:
        p *= 2
    return min(p, 128)


@functools.partial(jax.jit,
                   static_argnames=("S", "K", "m", "mm", "indel",
                                    "interpret"))
def _call(q, t, qlen2, tlen2, kband2, S, K, m, mm, indel,
          interpret=False):
    B = t.shape[0]
    BANDP = 128
    BT = min(_tile_rows(S, BANDP), B)
    SP = ((S + 1 + 127) // 128) * 128
    R = min(S, 64)                       # DP rows per grid step
    # eq[b, j, d] = (q[b, j+d-K] == t[b, j]) for DP row j+1 — built from
    # static shifted slices (no gather, no dynamic lane slicing).  The
    # slices concatenate on a dense axis first: stacking size-1-lane
    # [B, S, 1] pieces would pad each one 128x in HBM.
    qpad = jnp.pad(q.astype(jnp.int8), ((0, 0), (K, BANDP - K)),
                   constant_values=5)
    wins = jnp.concatenate([qpad[:, d:d + S] for d in range(BANDP)],
                           axis=1).reshape(B, BANDP, S)
    eq = (wins == t.astype(jnp.int8)[:, None, :]) \
        .astype(jnp.int8).transpose(0, 2, 1)

    grid = (B // BT, S // R)
    return pl.pallas_call(
        functools.partial(_kernel, S=S, K=K, BANDP=BANDP, SP=SP, m=m,
                          mm=mm, indel=indel, BT=BT, R=R),
        out_shape=jax.ShapeDtypeStruct((B, SP), jnp.uint8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BT, R, BANDP), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, SP), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((S + 1, BT, BANDP), jnp.int8),
            pltpu.VMEM((BT, BANDP), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(eq, qlen2, tlen2, kband2)


def pallas_supported(S: int, K: int, B: int) -> bool:
    """Square buckets, band within one lane tile, 6-bit run lengths, and
    exact grid tiling (grid=(B//BT, S//R) floors silently otherwise)."""
    if not (2 * K + 1 <= 63 and S % 8 == 0):
        return False
    BT = min(_tile_rows(S, 128), B)
    R = min(S, 64)
    return B % BT == 0 and S % R == 0


def banded_pallas_rowsync(q, t, qlen, tlen, K, m, mm, indel, kband=None,
                          interpret=False):
    """Banded DP + traceback; returns the P row-code plane uint8[B, SP].

    Decode with blocks_from_rowsync.  Requires pallas_supported(S, K, B).
    """
    B, S = q.shape
    if kband is None:
        kband = jnp.full((B,), K, jnp.int32)
    return _call(jnp.asarray(q), jnp.asarray(t),
                 jnp.asarray(qlen).reshape(B, 1).astype(jnp.int32),
                 jnp.asarray(tlen).reshape(B, 1).astype(jnp.int32),
                 jnp.asarray(kband).reshape(B, 1).astype(jnp.int32),
                 S, K, m, mm, indel, interpret=interpret)


def blocks_from_rowsync(P: np.ndarray, qlen: np.ndarray,
                        tlen: np.ndarray, S: int):
    """Vectorized host decode of the P plane -> per-problem block lists.

    P[b, j] = rl << 2 | code for each visited DP row j (code 1 DIAG,
    2 DOWN, 3 stop); the q position of the row-j match is recovered from
    suffix sums of per-row q consumption (rl + DIAG).
    """
    B = P.shape[0]
    P = P[:, :S + 1].astype(np.int64)
    code = P & 3
    rl = P >> 2
    # a stop row consumes its LEFT run but emits no match; rows after the
    # stop (smaller j) are unvisited (code 0)
    visited = code != 0
    dq = np.where(visited, rl + (code == 1), 0)
    # i BEFORE processing row j = qlen - (q consumed at rows > j)
    csum = np.cumsum(dq[:, ::-1], axis=1)[:, ::-1]       # sum over j' >= j
    q_match = qlen[:, None] - csum                        # i after row j
    is_m = code == 1
    # match at row j aligns q_match[b, j] (0-based) to t = j-1.  Row j's
    # LEFT run sits BETWEEN match j and match j+1 in alignment order, so
    # a new block starts at row j when row j-1 wasn't a match or row
    # j-1's run was nonzero
    prev_m = np.zeros_like(is_m)
    prev_m[:, 1:] = is_m[:, :-1]
    prev_rl = np.zeros_like(rl)
    prev_rl[:, 1:] = rl[:, :-1]
    start = is_m & (~prev_m | (prev_rl > 0))
    sb, sj = np.nonzero(start)
    # run continues at j+1 iff j+1 matches and row j's run is zero
    nxt_cont = np.zeros_like(is_m)
    nxt_cont[:, :-1] = is_m[:, 1:] & (rl[:, :-1] == 0)
    eb, ej = np.nonzero(is_m & ~nxt_cont)
    lens = ej - sj + 1
    qv = q_match[sb, sj]
    tv = sj - 1
    cuts = np.searchsorted(sb, np.arange(1, B))
    rows = list(zip(qv.tolist(), tv.tolist(), lens.tolist()))
    out = []
    prev = 0
    for c in list(cuts) + [len(rows)]:
        out.append(rows[prev:c])
        prev = c
    return out
