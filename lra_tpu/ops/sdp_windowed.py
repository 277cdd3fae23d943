"""Large-N chaining DP kernel: banded near window + saturated far term.

The blocked kernel (ops/sdp_blocked.py) evaluates every predecessor pair
exactly — O(N^2) work and [B, L, N] candidate tensors, intractable for a
megabase contig with 10^5 anchors.  This kernel bounds per-step work by
splitting predecessors of fragment i (q-sorted rank r_i) into:

* NEAR: the previous W fragments by q-rank, evaluated exactly with the
  same masked pairwise costs ([B, L, W] per block step);
* FAR: everything earlier, charged the PWL's terminal plateau ``ceiling2``
  (reference: SubRountine.h:113-119 — the penalty saturates there, so for
  any truly saturated pair this is *exact*, and for any other pair it is
  an underestimate, never an overestimate).  The far maximum respects both
  dominance constraints exactly: q-visibility via a host-precomputed
  insertion schedule (fragments enter the structure once their qE is <=
  the minimum qS of the current block), t-dominance via a prefix-max over
  a host-precomputed t-sorted permutation.

Why not fully exact at bounded cost: the live PWL is non-convex (free
region below x=20, the ceiling1 plateau), so cost(|ddiag|) cannot be
written as a max of linear functions of the predecessor diagonal; exact
bounded-work chaining would need true 2-D (t-rank x diag-range) queries —
the reference's ~4.7k-LoC divide-and-conquer (SparseDP.h:1834-1837).
Instead W is sized so the near window's q-span exceeds the reference's own
``splitdist`` (50k, Options.h:191): a missed-by-both-terms predecessor is
q-distant AND diag-unsaturated, i.e. a chain edge the reference's
SPLITChain would cut anyway.  A second, refresh-granularity miss also
exists: the far structures (activation set + t-sorted prefix maxima)
are rebuilt every R = W/(2L) blocks rather than per block (rebuilding
costs two full-N gather+cummax passes — doing it per block made the
far term the kernel's latency wall), so a predecessor older than W by
q-rank whose qE only recently dropped <= qS (a long anchor spanning
back) is visible to NEITHER term until the next refresh.  Fragments
finalized since the refresh need no far coverage at all: they are at
most R*L = W/2 q-ranks back, inside the near window's exact scan.
Both misses only ever LOWER a chain score (an edge goes unseen);
scores are never overestimated.

Backpointers: near/in-block predecessors by index, far predecessors as
sentinels FAR1/FAR2 that the host resolves during traceback (it knows V
and the exact schedule).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .gapcost import pwl_select_jnp

NEG = jnp.float32(-3.0e38)
FAR1 = -2   # bp sentinel: far predecessor via the forward (lane-1) term
FAR2 = -3   # bp sentinel: far predecessor via the back-diagonal term


def _pair_cost(d_i, d_j, pwl_key):
    return -pwl_select_jnp(jnp.abs(d_i - d_j) + 1, pwl_key)


def _refresh_blocks(L: int, W: int, N: int) -> int:
    """Far-structure refresh cadence in blocks: R = W/(2L), halved until
    it divides the block count N/L.  The kernel schedules refreshes with
    this R and resolve_far_np reconstructs round boundaries from it —
    both MUST call this one function."""
    nb = max(1, N // L)
    R = max(1, W // (2 * L))
    while nb % R:
        R //= 2
    return R


def far_schedule(qS, qE, tS, tE, lane1, lane2, valid, L):
    """Host precompute of the far-term structures for ONE problem
    (1-D numpy arrays, fragments sorted by qS).

    Returns dict of int32/bool arrays:
      perm1/perm2: q-rank indices sorted by tE asc / tS desc
      ok1/ok2:     lane&valid of the permuted fragments
      qer1/qer2:   qE-rank of the permuted fragments
      rank1/rank2: per-query prefix lengths (# j with tE_j <= tS_i /
                   # j with tS_j >= tE_i)
      ins_hi:      per-block insertion counts (# j with qE_j <= qS[b*L])
    """
    n = len(qS)
    nb = (n + L - 1) // L
    qe_rank = np.empty(n, np.int32)
    qe_order = np.argsort(qE, kind="stable")
    qe_rank[qe_order] = np.arange(n, dtype=np.int32)
    qE_sorted = qE[qe_order]

    perm1 = np.argsort(tE, kind="stable").astype(np.int32)
    perm2 = np.argsort(-tS, kind="stable").astype(np.int32)
    ok1 = (lane1 & valid)[perm1]
    ok2 = (lane2 & valid)[perm2]
    qer1 = qe_rank[perm1]
    qer2 = qe_rank[perm2]
    rank1 = np.searchsorted(tE[perm1], tS, side="right").astype(np.int32)
    ts_desc = -tS[perm2]
    rank2 = np.searchsorted(ts_desc, -tE, side="right").astype(np.int32)
    block_qs = qS[np.minimum(np.arange(nb) * L, n - 1)]
    ins_hi = np.searchsorted(qE_sorted, block_qs, side="right") \
        .astype(np.int32)
    return dict(perm1=perm1, perm2=perm2, ok1=ok1, ok2=ok2,
                qer1=qer1, qer2=qer2, rank1=rank1, rank2=rank2,
                ins_hi=ins_hi)


@functools.partial(jax.jit, static_argnames=("pwl_key", "L", "W"))
def chain_scores_windowed(qS, qE, tS, tE, score, lane1, lane2, valid,
                          perm1, perm2, ok1, ok2, qer1, qer2,
                          rank1, rank2, ins_hi,
                          pwl_key, L=64, W=4096):
    """Batched large-N DP; fragment args [B, N] sorted by qS, N % L == 0;
    schedule args from far_schedule (stacked [B, N] / ins_hi [B, nb]).

    Returns (V[B,N] f32, bp[B,N] int32, bplane[B,N] int32) with bp using
    the FAR1/FAR2 sentinels for far predecessors.
    """
    B, N = qS.shape
    nb = N // L
    c2 = jnp.float32(pwl_key[3])
    d1s = tS - qS
    d1e = tE - qE
    d2s = tE + qS
    d2e = tS + qE

    # front-pad per-fragment arrays with W invalid rows so the near
    # window [b0-W, b0) is a static-length in-bounds slice
    def fpad(a, fill):
        return jnp.concatenate(
            [jnp.full((B, W), fill, a.dtype), a], axis=1)
    p_qE = fpad(qE, jnp.int32(2 ** 30))
    p_tS = fpad(tS, jnp.int32(0))
    p_tE = fpad(tE, jnp.int32(0))
    p_d1e = fpad(d1e, jnp.int32(0))
    p_d2e = fpad(d2e, jnp.int32(0))
    p_l1 = fpad(lane1, False)
    p_l2 = fpad(lane2, False)
    p_valid = fpad(valid, False)

    # far-structure refresh cadence: R*L <= W/2 keeps every
    # fragment finalized since the refresh inside the exact near window.
    # nb must divide into whole rounds, so R shrinks for small nb;
    # resolve_far_np derives the SAME R via _refresh_blocks(L, W, N) to
    # reconstruct the refresh-round boundary a sentinel was scored
    # against — keep the two derivations in lockstep
    R = _refresh_blocks(L, W, N)

    def blk(a, b0, ln=L):
        return jax.lax.dynamic_slice_in_dim(a, b0, ln, axis=1)

    def step(carry, b):
        V, P1, P2 = carry
        b0 = b * L
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

        # --- near window: previous W fragments by q-rank, exact ---
        pV = fpad(V, NEG)
        wV = blk(pV, b0, W)
        wqE = blk(p_qE, b0, W)
        wtS = blk(p_tS, b0, W)
        wtE = blk(p_tE, b0, W)
        wd1e = blk(p_d1e, b0, W)
        wd2e = blk(p_d2e, b0, W)
        wl1 = blk(p_l1, b0, W)
        wl2 = blk(p_l2, b0, W)
        wva = blk(p_valid, b0, W)
        vis = (wqE[:, None, :] <= bqS[:, :, None]) & wva[:, None, :]
        m1 = vis & (wtE[:, None, :] <= btS[:, :, None]) & \
            wl1[:, None, :] & bl1[:, :, None]
        m2 = vis & (wtS[:, None, :] >= btE[:, :, None]) & \
            wl2[:, None, :] & bl2[:, :, None]
        w1 = _pair_cost(bd1s[:, :, None], wd1e[:, None, :], pwl_key)
        w2 = _pair_cost(bd2s[:, :, None], wd2e[:, None, :], pwl_key)
        c1n = jnp.where(m1, wV[:, None, :] + w1, NEG)
        c2n = jnp.where(m2, wV[:, None, :] + w2, NEG)
        cand = jnp.maximum(c1n, c2n)
        near_best = jnp.max(cand, axis=2)                       # [B, L]
        near_arg = jnp.argmax(cand, axis=2).astype(jnp.int32)
        near_lane = jnp.where(
            jnp.take_along_axis(c2n, near_arg[:, :, None], 2)[:, :, 0]
            > jnp.take_along_axis(c1n, near_arg[:, :, None], 2)[:, :, 0],
            2, 1).astype(jnp.int32)
        near_idx = b0 - W + near_arg                            # q-rank

        # --- far term: stale prefix-max over t-sorted fragments
        # (refreshed once per R-block round; see module docstring) ---
        r1 = blk(rank1, b0)                                     # [B, L]
        g1 = jnp.take_along_axis(P1, jnp.maximum(r1 - 1, 0), axis=1)
        far1 = jnp.where((r1 > 0) & bl1, g1 - c2, NEG)

        r2 = blk(rank2, b0)
        g2 = jnp.take_along_axis(P2, jnp.maximum(r2 - 1, 0), axis=1)
        far2 = jnp.where((r2 > 0) & bl2, g2 - c2, NEG)

        # exact terms win ties against the far underestimate
        far_best = jnp.maximum(far1, far2)
        far_bp = jnp.where(far1 >= far2, FAR1, FAR2).astype(jnp.int32)
        far_lane = jnp.where(far1 >= far2, 1, 2).astype(jnp.int32)
        use_far = far_best > near_best
        best_prev = jnp.maximum(near_best, far_best)
        arg_prev = jnp.where(use_far, far_bp, near_idx)
        lane_prev = jnp.where(use_far, far_lane, near_lane)

        # --- within-block triangle: max-plus closure (log-doubling) ---
        # The L-row in-block recurrence
        #   v_l = sc_l + max(0, best_prev_l, max_{j<l} (v_j + tcand_jl))
        # is a longest path over the strict row-order DAG with per-node
        # source injection W0_l = sc_l + max(best_prev_l, 0); instead of
        # an unrolled chain of L tiny sequential ops (the latency wall
        # that capped this kernel at ~49k anchors/s) it is solved as a
        # max-plus closure: 6 = log2(L) squarings of the [B, L, L] edge
        # matrix, then one vector product.  f32 path sums group
        # differently than the sequential per-node rounding (ULP-level),
        # so bp/lane tie rules are recovered in one exact pass against
        # the final values afterwards.
        tvis = (bqE[:, None, :] <= bqS[:, :, None])
        tm1 = tvis & (btE[:, None, :] <= btS[:, :, None]) & \
            bl1[:, None, :] & bl1[:, :, None]
        tm2 = tvis & (btS[:, None, :] >= btE[:, :, None]) & \
            bl2[:, None, :] & bl2[:, :, None]
        tw1 = _pair_cost(bd1s[:, :, None], blk(d1e, b0)[:, None, :],
                         pwl_key)
        tw2 = _pair_cost(bd2s[:, :, None], blk(d2e, b0)[:, None, :],
                         pwl_key)
        tc1 = jnp.where(tm1, tw1, NEG)
        tc2 = jnp.where(tm2, tw2, NEG)
        tcand = jnp.maximum(tc1, tc2)
        tlane = jnp.where(tc2 > tc1, 2, 1).astype(jnp.int32)

        # the sequential loop only ever saw j < l as in-block predecessor
        # (later rows were NEG in its running vloc); edges through or out
        # of invalid rows must die too
        ltri = jnp.tril(jnp.ones((L, L), bool), k=-1)[None]      # [1,l,j]
        edge_ok = ltri & bva[:, None, :] & bva[:, :, None]
        M = jnp.where(edge_ok, tcand + bsc[:, :, None], NEG)
        eye = jnp.where(jnp.eye(L, dtype=bool)[None],
                        jnp.float32(0.0), NEG)
        C = jnp.maximum(M, eye)                                  # I (+) M
        for _ in range(max(1, L.bit_length() - 1)):              # log2(L)
            C = jnp.max(C[:, :, :, None] + C[:, None, :, :], axis=2)
        W0 = jnp.where(bva, bsc + jnp.maximum(best_prev, 0.0), NEG)
        vfin = jnp.max(W0[:, None, :] + C, axis=2)               # [B, L]

        # exact bp/lane recovery with the sequential tie rules, against
        # the (final) in-block values
        in_cand = jnp.where(edge_ok, tcand + vfin[:, None, :], NEG)
        in_best = jnp.max(in_cand, axis=2)
        in_arg = jnp.argmax(in_cand, axis=2).astype(jnp.int32)
        use_in = in_best > best_prev
        best = jnp.maximum(in_best, best_prev)
        take = best > 0.0
        vloc = bsc + jnp.where(take, best, 0.0)
        vloc = jnp.where(bva, vloc, NEG)
        bploc = jnp.where(
            take, jnp.where(use_in, b0 + in_arg, arg_prev),
            -1).astype(jnp.int32)
        lane_sel = jnp.take_along_axis(tlane, in_arg[:, :, None],
                                       axis=2)[:, :, 0]
        laneloc = jnp.where(
            take, jnp.where(use_in, lane_sel, lane_prev),
            0).astype(jnp.int32)

        V = jax.lax.dynamic_update_slice_in_dim(V, vloc, b0, axis=1)
        return (V, P1, P2), (vloc, bploc, laneloc)

    def round_step(V, r):
        # rebuild far structures from values finalized before this round;
        # activation uses the round's FIRST block (a subset of every
        # inner block's true activation — all finalized, never more)
        r0b = r * R
        hi = jax.lax.dynamic_slice_in_dim(ins_hi, r0b, 1, axis=1)
        Vt1 = jnp.take_along_axis(V, perm1, axis=1)
        P1 = jax.lax.cummax(jnp.where(ok1 & (qer1 < hi), Vt1, NEG), axis=1)
        Vt2 = jnp.take_along_axis(V, perm2, axis=1)
        P2 = jax.lax.cummax(jnp.where(ok2 & (qer2 < hi), Vt2, NEG), axis=1)
        (V, _, _), outs = jax.lax.scan(step, (V, P1, P2),
                                       r0b + jnp.arange(R))
        return V, outs

    V0 = jnp.full((B, N), NEG)
    _, (v, bp, lane) = jax.lax.scan(round_step, V0, jnp.arange(nb // R))
    # outputs stacked [nr, R, B, L] -> [B, N]
    v = jnp.transpose(v, (2, 0, 1, 3)).reshape(B, N)
    bp = jnp.transpose(bp, (2, 0, 1, 3)).reshape(B, N)
    lane = jnp.transpose(lane, (2, 0, 1, 3)).reshape(B, N)
    return v, bp, lane


def resolve_far_np(i, qS, qE, tS, tE, V, lane1, lane2, valid, which,
                   L=64, W=4096, N=None):
    """Host resolution of a FAR1/FAR2 sentinel at q-rank i: the argmax the
    device's far term saw (its schedule: qE_j <= qS at the refresh-round
    start, t-dominance, lane), so the chain stays consistent with V.
    ``N`` is the PADDED fragment count the kernel ran with (defaults to
    len(qS) rounded up to a block) — it fixes the refresh cadence R."""
    if N is None:
        N = ((len(qS) + L - 1) // L) * L
    R = _refresh_blocks(L, W, N)
    b0 = (i // (L * R)) * (L * R)
    vis = valid & (qE <= qS[b0])
    if which == 1:
        vis = vis & lane1 & (tE <= tS[i])
    else:
        vis = vis & lane2 & (tS >= tE[i])
    if not vis.any():
        return -1
    cand = np.where(vis, V, -np.inf)
    return int(np.argmax(cand))
