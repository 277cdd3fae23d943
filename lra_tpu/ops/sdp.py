"""Batched concave-gap chaining DP (the SDP core) on device.

This replaces the reference's Eppstein-style divide-and-conquer event sweep
(reference: SparseDP.h:1766-2440, SubProblem.h, SubRountine.h:317-458,
DivideSubByRow1/2.h, DivideSubByCol1/2.h — ~4700 LoC of pointer-chasing)
with a formulation chosen for the TPU's vector unit: a masked O(N^2) scan
over fragments sorted by start row, batched over many chaining problems.
The *semantics* (which optimum is computed) are identical; the mechanism is
not a translation.

Recurrence (derived from ProcessPoint, SparseDP.h:313-662):

    V[i] = score[i] + max(0, max_j  V[j] + w(lane))

with predecessor j valid through
  lane 1 (forward diagonal, subproblems R1/C1):
      qE[j] <= qS[i]  and  tE[j] <= tS[i],
      w = -PWL(|(tS[i]-qS[i]) - (tE[j]-qE[j])| + 1)
  lane 2 (back diagonal, subproblems R2/C2):
      qE[j] <= qS[i]  and  tS[j] >= tE[i],
      w = -PWL(|(tE[i]+qS[i]) - (tS[j]+qE[j])| + 1)

Lane membership encodes the reference's two insertion rules: SDP-1 inserts
all four points per fragment (both lanes; inversion-aware chaining,
SparseDP.h:1957-2040), SDP-2 inserts one lane per strand
(SparseDP.h:1797-1807).  A strand flip along the traceback is a `link`
(inversion edge, SparseDP.h:1537-1565).

Coordinates must be rebased per problem so that t + q fits int32 (host does
this; a chaining problem spans at most a few Mb).

Why not the per-slope prefix-max decomposition: the live PWL has a convex
kink at x=20 (free region -> jump), so the concave "max over extended
linear pieces" identity does not hold; the masked evaluation is exact for
any cost shape and keeps the inner loop a pure VPU op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .gapcost import GapParams, pwl_jnp

NEG = jnp.float32(-3.0e38)


@functools.partial(jax.jit)
def chain_scores(qS, qE, tS, tE, score, lane1, lane2, valid,
                 slope, inter, ceiling1, ceiling2):
    """Batched DP. All args [B, N] (bool/int32/f32); params are f32[24]/scalars.

    Returns (V[B,N], bp[B,N] int32, bplane[B,N] int32).
    bp = -1 marks a chain start; bplane = 2 where the predecessor edge used
    the back-diagonal lane.
    """
    d1s = tS - qS
    d1e = tE - qE
    d2s = tE + qS
    d2e = tS + qE

    def one(qS, qE, tS, tE, score, lane1, lane2, valid, d1s, d1e, d2s, d2e):
        n = qS.shape[0]

        def step(V, i):
            vis = (qE <= qS[i]) & valid
            m1 = vis & (tE <= tS[i]) & lane1 & lane1[i]
            m2 = vis & (tS >= tE[i]) & lane2 & lane2[i]
            w1 = -pwl_jnp(jnp.abs(d1s[i] - d1e) + 1, slope, inter,
                          ceiling1, ceiling2)
            w2 = -pwl_jnp(jnp.abs(d2s[i] - d2e) + 1, slope, inter,
                          ceiling1, ceiling2)
            c1 = jnp.where(m1, V + w1, NEG)
            c2 = jnp.where(m2, V + w2, NEG)
            cand = jnp.maximum(c1, c2)
            best = jnp.max(cand)
            take = best > 0.0
            v_i = score[i] + jnp.where(take, best, 0.0)
            V = V.at[i].set(jnp.where(valid[i], v_i, NEG))
            arg = jnp.argmax(cand).astype(jnp.int32)
            bp = jnp.where(take, arg, -1)
            # lane-1 wins ties (reference updates strictly, R1 before R2)
            lane = jnp.where(take & (c2[arg] > c1[arg]), 2, 1)
            lane = jnp.where(take, lane, 0).astype(jnp.int32)
            return V, (v_i, bp, lane)

        V0 = jnp.full((n,), NEG, dtype=jnp.float32)
        _, (v, bp, lane) = jax.lax.scan(step, V0, jnp.arange(n))
        v = jnp.where(valid, v, NEG)
        return v, bp, lane

    return jax.vmap(one)(qS, qE, tS, tE, score, lane1, lane2, valid,
                         d1s, d1e, d2s, d2e)


# ------------------------------------------------------------------ host ---

def chain_scores_np(qS, qE, tS, tE, score, lane1, lane2, valid, gp: GapParams):
    """Single-problem numpy oracle with identical semantics (for tests and
    small host-side fallbacks)."""
    from .gapcost import gap_cost_np

    n = len(qS)
    V = np.full(n, -3.0e38, dtype=np.float64)
    bp = np.full(n, -1, dtype=np.int64)
    lane = np.zeros(n, dtype=np.int64)
    d1s, d1e = tS - qS, tE - qE
    d2s, d2e = tE + qS, tS + qE
    for i in range(n):
        if not valid[i]:
            continue
        best, bj, bl = 0.0, -1, 0
        for j in range(n):
            if not valid[j] or qE[j] > qS[i]:
                continue
            if lane1[i] and lane1[j] and tE[j] <= tS[i]:
                c = V[j] + gap_cost_np(d1s[i], d1e[j], gp)
                if c > best:
                    best, bj, bl = c, j, 1
            if lane2[i] and lane2[j] and tS[j] >= tE[i]:
                c = V[j] + gap_cost_np(d2s[i], d2e[j], gp)
                if c > best:
                    best, bj, bl = c, j, 2
        V[i] = score[i] + best
        bp[i], lane[i] = bj, bl
    return V, bp, lane


def traceback(V, bp, lane, valid, used=None):
    """Extract the best chain (host).  Returns (indices ascending by qS,
    links) where links[k]=True marks a lane flip between step k and k+1 —
    the reference's inversion edge (SparseDP.h:1537-1565)."""
    V = np.where(valid, V, -np.inf)
    if used is not None:
        V = np.where(used, -np.inf, V)
    i = int(np.argmax(V))
    if not np.isfinite(V[i]):
        return np.zeros(0, np.int64), np.zeros(0, bool)
    chain = []
    lanes = []
    while i >= 0:
        chain.append(i)
        lanes.append(lane[i])
        i = int(bp[i])
    chain = np.array(chain[::-1], dtype=np.int64)
    lanes = np.array(lanes[::-1], dtype=np.int64)
    links = np.zeros(len(chain), dtype=bool)
    if len(chain) > 1:
        links[1:] = lanes[1:] == 2
    return chain, links
