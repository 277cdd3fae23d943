"""Blocked chaining DP kernel — the production SDP path.

Same semantics as ops/sdp.py:chain_scores (see there for the recurrence
derivation from the reference's event sweep) but restructured for TPU
latency: instead of N sequential scan steps of O(N) work, fragments are
processed in blocks of L.  Each scan step computes one [B, L, N] masked
max against the value vector (all cross-block predecessors at once — a
single wide VPU op) and then resolves within-block dependencies with an
unrolled L-step triangle of [B, L] ops.  Step count drops from N to N/L.

Backpointers are recovered with argmax over the same masked candidate
tensors, so host traceback is unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .gapcost import pwl_select_jnp

NEG = jnp.float32(-3.0e38)


def _pair_cost(d_i, d_j, pwl_key):
    return -pwl_select_jnp(jnp.abs(d_i - d_j) + 1, pwl_key)


@functools.partial(jax.jit, static_argnames=("pwl_key", "L"))
def chain_scores_blocked(qS, qE, tS, tE, score, lane1, lane2, valid,
                         pwl_key, L=64):
    """Batched DP; all args [B, N] with N % L == 0, fragments sorted by qS.

    Returns (V[B,N] f32, bp[B,N] int32, bplane[B,N] int32).
    """
    B, N = qS.shape
    nb = N // L
    d1s = tS - qS
    d1e = tE - qE
    d2s = tE + qS
    d2e = tS + qE

    col_ids = jnp.arange(N, dtype=jnp.int32)

    def blk(a, b0):
        return jax.lax.dynamic_slice_in_dim(a, b0, L, axis=1)

    def step(V, b):
        b0 = b * L
        # block-row data [B, L]
        bqS = blk(qS, b0)
        bqE = blk(qE, b0)
        btS = blk(tS, b0)
        btE = blk(tE, b0)
        bsc = blk(score, b0)
        bl1 = blk(lane1, b0)
        bl2 = blk(lane2, b0)
        bva = blk(valid, b0)
        bd1s = blk(d1s, b0)
        bd2s = blk(d2s, b0)

        # --- cross-block candidates: [B, L, N] against V (pre-block) ---
        vis = (qE[:, None, :] <= bqS[:, :, None]) & valid[:, None, :]
        m1 = vis & (tE[:, None, :] <= btS[:, :, None]) & \
            lane1[:, None, :] & bl1[:, :, None]
        m2 = vis & (tS[:, None, :] >= btE[:, :, None]) & \
            lane2[:, None, :] & bl2[:, :, None]
        w1 = _pair_cost(bd1s[:, :, None], d1e[:, None, :], pwl_key)
        w2 = _pair_cost(bd2s[:, :, None], d2e[:, None, :], pwl_key)
        c1 = jnp.where(m1, V[:, None, :] + w1, NEG)
        c2 = jnp.where(m2, V[:, None, :] + w2, NEG)
        cand = jnp.maximum(c1, c2)
        best_prev = jnp.max(cand, axis=2)                      # [B, L]
        arg_prev = jnp.argmax(cand, axis=2).astype(jnp.int32)  # [B, L]
        lane_prev = jnp.where(
            jnp.take_along_axis(c2, arg_prev[:, :, None], axis=2)[:, :, 0]
            > jnp.take_along_axis(c1, arg_prev[:, :, None], axis=2)[:, :, 0],
            2, 1).astype(jnp.int32)

        # --- within-block triangle: weights [B, L, L] (j pred of i) ---
        tvis = (bqE[:, None, :] <= bqS[:, :, None])            # j -> i
        tm1 = tvis & (btE[:, None, :] <= btS[:, :, None]) & \
            bl1[:, None, :] & bl1[:, :, None]
        tm2 = tvis & (btS[:, None, :] >= btE[:, :, None]) & \
            bl2[:, None, :] & bl2[:, :, None]
        tw1 = _pair_cost(bd1s[:, :, None], blk(d1e, b0)[:, None, :], pwl_key)
        tw2 = _pair_cost(bd2s[:, :, None], blk(d2e, b0)[:, None, :], pwl_key)
        tc1 = jnp.where(tm1, tw1, NEG)
        tc2 = jnp.where(tm2, tw2, NEG)
        # within-block valid-j mask applied at use time via bva
        tcand = jnp.maximum(tc1, tc2)                          # [B, L, L]
        tlane = jnp.where(tc2 > tc1, 2, 1).astype(jnp.int32)

        # sequential resolution, unrolled over L
        vloc = jnp.full((B, L), NEG)
        bploc = jnp.full((B, L), -1, dtype=jnp.int32)
        laneloc = jnp.zeros((B, L), dtype=jnp.int32)
        rows_v = []
        rows_bp = []
        rows_lane = []
        for l in range(L):
            in_cand = tcand[:, l, :] + vloc                    # [B, L]
            in_cand = jnp.where(blk(valid, b0), in_cand, NEG)
            in_best = jnp.max(in_cand, axis=1)
            in_arg = jnp.argmax(in_cand, axis=1).astype(jnp.int32)
            use_in = in_best > best_prev[:, l]
            best = jnp.maximum(in_best, best_prev[:, l])
            take = best > 0.0
            v_l = bsc[:, l] + jnp.where(take, best, 0.0)
            v_l = jnp.where(bva[:, l], v_l, NEG)
            bp_l = jnp.where(
                take,
                jnp.where(use_in, b0 + in_arg, arg_prev[:, l]),
                -1).astype(jnp.int32)
            lane_l = jnp.where(
                take,
                jnp.where(use_in,
                          jnp.take_along_axis(tlane[:, l, :],
                                              in_arg[:, None], axis=1)[:, 0],
                          lane_prev[:, l]),
                0).astype(jnp.int32)
            vloc = vloc.at[:, l].set(v_l)
            rows_v.append(v_l)
            rows_bp.append(bp_l)
            rows_lane.append(lane_l)

        V = jax.lax.dynamic_update_slice_in_dim(V, vloc, b0, axis=1)
        return V, (jnp.stack(rows_v, 1), jnp.stack(rows_bp, 1),
                   jnp.stack(rows_lane, 1))

    V0 = jnp.full((B, N), NEG)
    _, (v, bp, lane) = jax.lax.scan(step, V0, jnp.arange(nb))
    # outputs stacked [nb, B, L] -> [B, N]
    v = jnp.transpose(v, (1, 0, 2)).reshape(B, N)
    bp = jnp.transpose(bp, (1, 0, 2)).reshape(B, N)
    lane = jnp.transpose(lane, (1, 0, 2)).reshape(B, N)
    return v, bp, lane


def chain_mask_from_scores(V, bp, valid):
    """Device-side single-best traceback: walk bp from argmax(V) and
    return (vmax f32[B], maskbits int32[B, N//32]) — the chain as a
    bitmask.  Downloading ~N/8 bytes instead of 12N (V+bp+lane) matters
    on links where d2h transfers dominate; the chain's walk order is
    recoverable on host because a backpointer always targets a strictly
    earlier q-sorted row (qS_j < qE_j <= qS_i).  Requires N % 32 == 0.
    """
    B, N = V.shape
    Vm = jnp.where(valid, V, NEG)
    vmax = jnp.max(Vm, axis=1)
    start = jnp.argmax(Vm, axis=1).astype(jnp.int32)
    start = jnp.where(vmax > 0.0, start, -1)
    rows = jnp.arange(B)

    def step(carry, _):
        cur, mask = carry
        mask = mask.at[rows, jnp.maximum(cur, 0)].max(cur >= 0)
        nxt = jnp.where(cur >= 0, bp[rows, jnp.maximum(cur, 0)], -1)
        return (nxt, mask), None

    mask0 = jnp.zeros((B, N), bool)
    (_, mask), _ = jax.lax.scan(step, (start, mask0), None, length=N)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    bits = (mask.reshape(B, N // 32, 32).astype(jnp.uint32)
            * weights[None, None, :]).sum(axis=2)
    return vmax, jax.lax.bitcast_convert_type(bits, jnp.int32)
