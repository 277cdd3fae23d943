"""Chaining drivers: SDP-1 over split clusters, SDP-2 over merged anchors.

Host-side wrappers around the device chaining kernel (ops/sdp.py) that
reproduce the reference's fragment-insertion rules, scoring, and
multi-chain traceback:

* SDP-1 (reference: SparseDP.h:1956-2137): 4 points per split cluster
  (both lanes), event coords (qStart+1, qEnd-1, tStart+1, tEnd-1), score =
  split-cluster value * rate; ``DecidePrimaryChains``
  (SparseDP.h:1586-1658): fragments by value desc, threshold
  max(alnthres*best, best - 130*globalK), used-flag collision aborts a
  candidate chain, >0.5% read-span requirement, NumAln cap.
* SDP-2 (reference: SparseDP.h:1766-1953): one lane per strand over merged
  same-diagonal anchor groups, score = group q-span * second_anchorbonus;
  single best traceback.

Batching: problems are padded to bucket sizes and dispatched in one
device call per bucket; tiny problems run on the numpy oracle (device
dispatch overhead dominates below ~64 fragments).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..ops.gapcost import GapParams
from ..ops.sdp import chain_scores_np
from ..ops.sdp_blocked import chain_mask_from_scores, chain_scores_blocked
from ..ops.sdp_windowed import (chain_scores_windowed, far_schedule,
                                resolve_far_np)
from ..options import Options
from ..utils import pow2_at_least as _pow2

_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096, 8192)
# problems beyond the top bucket run on the windowed kernel: exact within
# the last WIN_W fragments + saturated-cost far term (ops/sdp_windowed.py)
WIN_W = 4096
WIN_L = 64
# density guard for the windowed kernel: its coverage argument (a
# predecessor missed by both the W-rank near window and the saturated far
# term is an edge SPLITChain would cut, ops/sdp_windowed.py:19-36) needs
# the W-rank window to span >= splitdist (50k, reference Options.h:191)
# bases of q.  Repeat-dense problems (satellite arrays, nested dups) can
# pack more than W anchors into one 50k q-span; _windowed_W escalates W
# to cover the densest span, capped at WIN_WMAX (beyond which the miss is
# accepted and documented — PARITY.md).
WIN_WMAX = 16384
SPLIT_SPAN = 50000


def _windowed_W(qS, base: int = WIN_W, cap: int = WIN_WMAX) -> int:
    """Pick the near-window size for one q-sorted problem: the smallest
    power-of-two >= the max number of fragments in any SPLIT_SPAN q-span
    (so every unsaturated predecessor candidate is seen exactly), floored
    at `base` and capped at `cap`."""
    n = len(qS)
    if n == 0:
        return base
    lo = np.searchsorted(qS, qS - SPLIT_SPAN, side="left")
    dens = int((np.arange(n) - lo).max()) + 1
    W = base
    while W < min(dens, cap):
        W *= 2
    return W
# giant problems (megabase contigs) are additionally split into q-range
# shards with a left halo and stitched (SURVEY.md §5's sequence-parallel
# analog).  The halo exceeds the reference's splitdist (50k,
# Options.h:191): a predecessor edge that sharding can drop spans a gap
# the reference's SPLITChain would cut into separate segments anyway.
SHARD_N = 32768
SHARD_HALO = 60000


def _shard_problem(p: "ChainProblem", shard_n: int, halo: int) -> list:
    """Split one huge q-sorted problem into left-haloed shards.

    Returns [(child, core_lo, core_hi, sel_off)]: child rows
    [core_lo-sel_off : core_hi-sel_off] are the shard's OWNED rows
    (parent rows [core_lo:core_hi]); earlier child rows are halo
    predecessors (fragments within `halo` bases of q before the core).
    Only a LEFT halo is needed: V[i] depends on predecessors alone."""
    n = len(p.qS)
    shard_n = max(1, shard_n)
    k = (n + shard_n - 1) // shard_n
    out = []
    for s in range(k):
        lo = s * n // k
        hi = (s + 1) * n // k
        off = int(np.searchsorted(p.qS, p.qS[lo] - halo, side="left"))
        sel = slice(off, hi)
        # copies, not views: halo rows are frozen in place (score := V,
        # qS := -1) without touching the parent
        child = ChainProblem(
            p.qS[sel].copy(), p.qE[sel].copy(), p.tS[sel].copy(),
            p.tE[sel].copy(), p.score[sel].astype(np.float32),
            np.asarray(p.lane1)[sel].copy(),
            np.asarray(p.lane2)[sel].copy(),
            np.arange(hi - off, dtype=np.int64), p.tbase)
        out.append((child, lo, hi, off))
    return out


def _chain_packed(qS, qE, tS, tE, sc, l1, l2, valid, key):
    """One int32[2, B, N] result (V bitcast; bp*4+lane): a single d2h
    transfer per bucket instead of three (the tunneled TPU pays a ~28ms
    latency floor per download), with lane folded into bp's low bits
    (bp >= -3, lane in 0..2, so bp*4+lane round-trips via >>2 / &3)."""
    import jax
    import jax.numpy as jnp

    V, bp, lane = chain_scores_blocked(qS, qE, tS, tE, sc, l1, l2, valid,
                                       key)
    return jnp.stack([jax.lax.bitcast_convert_type(V, jnp.int32),
                      bp * 4 + lane])


def _chain_packed_masked(qS, qE, tS, tE, sc, l1, l2, valid, key):
    """Single-best-chain rounds (SDP-2/2'/...): device traceback + chain
    bitmask download — int32[B, N//32 + 1] (vmax bitcast in the last
    column) instead of int32[3, B, N]."""
    import jax
    import jax.numpy as jnp

    V, bp, _lane = chain_scores_blocked(qS, qE, tS, tE, sc, l1, l2,
                                        valid, key)
    vmax, bits = chain_mask_from_scores(V, bp, valid)
    return jnp.concatenate(
        [bits, jax.lax.bitcast_convert_type(vmax, jnp.int32)[:, None]],
        axis=1)


def _chain_packed_windowed(args, key, W=WIN_W):
    import jax
    import jax.numpy as jnp

    V, bp, lane = chain_scores_windowed(*args, key, L=WIN_L, W=W)
    return jnp.stack([jax.lax.bitcast_convert_type(V, jnp.int32),
                      bp * 4 + lane])


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return ((n + 8191) // 8192) * 8192


@dataclass
class ChainProblem:
    """One chaining problem in kernel form (fragments sorted by qS)."""
    qS: np.ndarray
    qE: np.ndarray
    tS: np.ndarray
    tE: np.ndarray
    score: np.ndarray
    lane1: np.ndarray
    lane2: np.ndarray
    order: np.ndarray       # original fragment index per sorted row
    tbase: int = 0
    # need_full=False: the caller only wants the single best chain
    # (best_chain/chain_vmax) — the device tracebacks and downloads a
    # ~100x smaller chain bitmask instead of V/bp/lane
    need_full: bool = True
    # windowed-kernel near-window size used for this problem (set by
    # _solve_batch; needed to resolve FAR sentinels consistently)
    win_W: int = WIN_W
    # results
    V: np.ndarray | None = None
    bp: np.ndarray | None = None
    lane: np.ndarray | None = None
    chain_rows: np.ndarray | None = None   # masked path: rows, descending
    vmax: float = 0.0


def solve_problems(problems: list, gp: GapParams, use_device: bool = True):
    """Run chain DP for many problems, bucketed+batched on device.

    Giant problems (len > SHARD_N) are split into q-range shards with a
    left halo and solved in SEQUENTIAL device rounds: shard r's halo rows
    are frozen to their final V from rounds < r (score := V, qS := -1 so
    they accept no predecessors), so chain values accumulate across shard
    boundaries exactly; only predecessor edges spanning more than
    SHARD_HALO bases of q with no intermediate chain fragment are lost —
    gaps the reference's SPLITChain would cut regardless.  Shards of
    different problems batch together per round (dp-sharded on the mesh).
    """
    sharded = [p for p in problems if len(p.qS) > SHARD_N]
    normal = [p for p in problems if len(p.qS) <= SHARD_N]
    plans = []
    for p in sharded:
        childs = _shard_problem(p, SHARD_N, SHARD_HALO)
        n = len(p.qS)
        p.V = np.full(n, -3.0e38, np.float32)
        p.bp = np.full(n, -1, np.int32)
        p.lane = np.zeros(n, np.int32)
        plans.append((p, childs))
    rounds = max((len(c) for _, c in plans), default=0)
    for r in range(max(1, rounds)):
        batch = normal if r == 0 else []
        stitches = []
        for p, childs in plans:
            if r < len(childs):
                child, lo, hi, off = childs[r]
                nh = lo - off
                if nh > 0:
                    child.score[:nh] = p.V[off:lo]
                    child.qS[:nh] = -1
                batch.append(child)
                stitches.append((p, childs[r]))
        _solve_batch(batch, gp, use_device)
        for p, (c, lo, hi, off) in stitches:
            local = slice(lo - off, hi - off)
            p.V[lo:hi] = c.V[local]
            bp = c.bp[local]
            p.bp[lo:hi] = np.where(bp >= 0, bp + off, -1)
            p.lane[lo:hi] = c.lane[local]


def _solve_batch(problems: list, gp: GapParams, use_device: bool = True):
    """One bucketed+batched device round over ready problems.

    Both N (fragments) and B (problems per bucket) are padded to fixed
    sizes so the compiled kernels are reused across batches — remote
    compiles cost ~10s on the tunneled TPU, cached dispatches ~50ms."""
    import jax.numpy as jnp

    from ..utils import devstats

    t_enter = devstats.now() if devstats.ENABLED else 0.0

    # N == 1 is trivial: the only chain is the fragment itself
    for p in problems:
        if len(p.qS) == 1:
            p.V = p.score.astype(np.float32).copy()
            p.bp = np.full(1, -1, np.int32)
            p.lane = np.where(p.lane1, 0, 1).astype(np.int32)
    rest = [p for p in problems if len(p.qS) > 1]
    small = rest if not use_device else []
    large = rest if use_device else []
    for p in small:
        valid = np.ones(len(p.qS), bool)
        p.V, p.bp, p.lane = chain_scores_np(
            p.qS, p.qE, p.tS, p.tE, p.score, p.lane1, p.lane2, valid, gp)

    from ..parallel.mesh import batch_multiple, place_many

    by_bucket: dict = {}
    windowed: dict = {}
    for p in large:
        n = len(p.qS)
        if n <= _BUCKETS[-1]:
            by_bucket.setdefault((_bucket(n), p.need_full), []).append(p)
        else:
            # windowed kernel may emit FAR sentinels the host must
            # resolve, so it always downloads the full result; W is
            # escalated per problem by the repeat-density guard
            N = ((n + 8191) // 8192) * 8192
            windowed.setdefault((N, _windowed_W(p.qS)), []).append(p)
    key = gp.static_key()
    pending = []
    for bkey, plist in list(by_bucket.items()) + \
            list(windowed.items()):
        N = bkey[0]
        is_win = N > _BUCKETS[-1]
        win_W = bkey[1] if is_win else 0
        full = True if is_win else bkey[1]
        B = batch_multiple(_pow2(len(plist), 1 if is_win else 8))
        def pad(attr, dtype, fill=0):
            out = np.full((B, N), fill, dtype)
            for b, p in enumerate(plist):
                a = getattr(p, attr)
                out[b, :len(a)] = a
            return out
        qS = pad("qS", np.int32)
        qE = pad("qE", np.int32, fill=2**30)   # padding never a predecessor
        tS = pad("tS", np.int32)
        tE = pad("tE", np.int32)
        sc = pad("score", np.float32)
        l1 = pad("lane1", bool, fill=False)
        l2 = pad("lane2", bool, fill=False)
        valid = np.zeros((B, N), bool)
        for b, p in enumerate(plist):
            valid[b, :len(p.qS)] = True
        if is_win:
            # host precompute of the far-term schedules, padded
            nb = N // WIN_L
            sch = {k: np.full((B, N), f, np.int32) for k, f in
                   (("perm1", 0), ("perm2", 0), ("qer1", 2 ** 30),
                    ("qer2", 2 ** 30), ("rank1", 0), ("rank2", 0))}
            sch["ok1"] = np.zeros((B, N), bool)
            sch["ok2"] = np.zeros((B, N), bool)
            sch["ins_hi"] = np.zeros((B, nb), np.int32)
            for b, p in enumerate(plist):
                n = len(p.qS)
                s = far_schedule(p.qS, p.qE, p.tS, p.tE,
                                 np.asarray(p.lane1, bool),
                                 np.asarray(p.lane2, bool),
                                 np.ones(n, bool), WIN_L)
                for k2 in ("perm1", "perm2", "ok1", "ok2", "qer1",
                           "qer2", "rank1", "rank2"):
                    sch[k2][b, :n] = s[k2]
                sch["ins_hi"][b, :len(s["ins_hi"])] = s["ins_hi"]
            args = place_many(
                qS, qE, tS, tE, sc, l1, l2, valid,
                sch["perm1"], sch["perm2"], sch["ok1"], sch["ok2"],
                sch["qer1"], sch["qer2"], sch["rank1"], sch["rank2"],
                sch["ins_hi"])
            for p in plist:
                p.win_W = win_W
            packed = _chain_packed_windowed(args, key, win_W)
        elif full:
            # async dispatch across all buckets before any download
            packed = _chain_packed(
                *place_many(qS, qE, tS, tE, sc, l1, l2, valid), key)
        else:
            packed = _chain_packed_masked(
                *place_many(qS, qE, tS, tE, sc, l1, l2, valid), key)
        pending.append((plist, full or is_win, packed))
    # one flat d2h transfer for all buckets (latency floor per transfer)
    merged = None
    t_pack = t_compute = t_copy = 0.0
    nbytes = 0
    if pending:
        flats = [pk.reshape(-1) for _, _, pk in pending]
        merged = flats[0] if len(flats) == 1 else jnp.concatenate(flats)
        if devstats.ENABLED:
            t0 = devstats.now()
            t_pack = t0 - t_enter
            merged.block_until_ready()
            t_compute = devstats.now() - t0
            nbytes = merged.size * merged.dtype.itemsize
        t0 = devstats.now() if devstats.ENABLED else 0.0
        merged.copy_to_host_async()
        merged = np.asarray(merged)
        if devstats.ENABLED:
            t_copy = devstats.now() - t0
    t_post0 = devstats.now() if devstats.ENABLED else 0.0
    off = 0
    for plist, full, pk in pending:
        size = pk.size
        packed = merged[off:off + size].reshape(pk.shape)
        off += size
        if not full:
            # masked path: [B, N//32 + 1] (bits + vmax bitcast)
            vmax = packed[:, -1].view(np.float32)
            bits = np.ascontiguousarray(packed[:, :-1]).view(np.uint8)
            mask = np.unpackbits(bits, axis=1, bitorder="little")
            for b, p in enumerate(plist):
                n = len(p.qS)
                p.vmax = float(vmax[b])
                rows = np.nonzero(mask[b, :n])[0]
                p.chain_rows = rows[::-1].astype(np.int64)  # end-first
            continue
        V = packed[0].view(np.float32)
        # decode bp*4+lane: arithmetic >>2 is floor-div (bp >= -3), &3
        # recovers lane from the two's-complement low bits
        bp, lane = packed[1] >> 2, packed[1] & 3
        for b, p in enumerate(plist):
            n = len(p.qS)
            p.V, p.bp, p.lane = V[b, :n].copy(), bp[b, :n].copy(), \
                lane[b, :n].copy()
            # windowed kernel: resolve FAR1/FAR2 backpointer sentinels on
            # host (rare; the device only records that the saturated far
            # term won, not which fragment achieved it)
            far = np.nonzero(p.bp < -1)[0]
            for i in far:
                p.bp[i] = resolve_far_np(
                    int(i), p.qS, p.qE, p.tS, p.tE, p.V,
                    np.asarray(p.lane1, bool), np.asarray(p.lane2, bool),
                    np.ones(n, bool), 1 if p.bp[i] == -2 else 2, WIN_L,
                    p.win_W, N=packed.shape[-1])
    if devstats.ENABLED:
        devstats.record(
            "chain_sdp", buckets=len(pending),
            jobs=sum(len(pl) for pl, _, _ in pending),
            pack_s=t_pack, compute_s=t_compute, copy_s=t_copy,
            post_s=devstats.now() - t_post0, bytes=nbytes)


@dataclass
class PrimaryChain:
    ch: list                 # fragment indices, chain END first (reference order)
    link: np.ndarray         # lane-2 edge markers, len(ch)-1
    value: float
    num_anchors: int
    qStart: int = 0
    qEnd: int = 0
    tStart: int = 0
    tEnd: int = 0


def make_sdp1_problem(split, rate: float, gp: GapParams) -> ChainProblem:
    n = len(split)
    qS = np.array([s.qStart + 1 for s in split], np.int64)
    qE = np.array([s.qEnd - 1 for s in split], np.int64)
    tS0 = np.array([s.tStart + 1 for s in split], np.int64)
    tE0 = np.array([s.tEnd - 1 for s in split], np.int64)
    tbase = int(tS0.min()) if n else 0
    score = np.array([s.value * rate for s in split], np.float32)
    order = np.argsort(qS, kind="stable")
    return ChainProblem(qS[order].astype(np.int64), qE[order].astype(np.int64),
                        (tS0[order] - tbase), (tE0[order] - tbase),
                        score[order],
                        np.ones(n, bool), np.ones(n, bool),
                        order, tbase)


def decide_primary_chains(p: ChainProblem, split, opts: Options,
                          read_len: int) -> list:
    """reference: DecidePrimaryChains (SparseDP.h:1586-1658)."""
    n = len(p.qS)
    if n == 0 or p.V is None:
        return []
    used = np.zeros(n, bool)
    by_val = np.argsort(-p.V, kind="stable")
    best = float(p.V[by_val[0]])
    thres = max(opts.aln_thres * best, best - 130 * opts.global_k)
    chains: list[PrimaryChain] = []
    fv = 0
    while fv < n and p.V[by_val[fv]] >= thres:
        d = int(by_val[fv])
        onechain: list[int] = []
        links: list[int] = []
        i = d
        aborted = used[i]
        while not aborted and i >= 0:
            onechain.append(i)
            used[i] = True
            j = int(p.bp[i])
            if j >= 0:
                if used[j]:
                    aborted = True
                    break
                links.append(1 if p.lane[i] == 2 else 0)
            i = j
        if aborted:
            for x in onechain:
                used[x] = False
            fv += 1
            continue
        if onechain:
            frag = [int(p.order[i]) for i in onechain]   # end-first order
            qE = max(split[f].qEnd for f in frag)
            qS = min(split[f].qStart for f in frag)
            tE = max(split[f].tEnd for f in frag)
            tS = min(split[f].tStart for f in frag)
            if (qE - qS) / read_len > 0.005:
                num_anchors = sum(split[f].num_anchors for f in frag)
                if not chains:
                    chains.append(PrimaryChain(frag, np.array(links, bool),
                                               float(p.V[d]), num_anchors,
                                               qS, qE, tS, tE))
                elif len(chains) < opts.num_aln:
                    chains.append(PrimaryChain(frag, np.array(links, bool),
                                               float(p.V[d]), num_anchors,
                                               qS, qE, tS, tE))
                else:
                    break
            else:
                break
        fv += 1
    return chains


def switchindex(chains: list, split, clusters: list) -> None:
    """Map split-cluster chains back to coarse clusters, dedupe repeats,
    compress interleavings, drop q-covered clusters
    (reference: Mapping_ultility.h:40-169)."""
    for ch in chains:
        coarse = [split[f].coarse for f in ch.ch]
        links = list(ch.link)
        # drop consecutive duplicates (and their links)
        newch, newlink = [], []
        for i, c in enumerate(coarse):
            if newch and c == newch[-1]:
                continue
            if newch:
                newlink.append(links[i - 1] if i - 1 < len(links) else False)
            newch.append(c)
        # compress repeated non-consecutive occurrences: keep first run only
        seen_first: dict = {}
        first_end: dict = {}
        for i, c in enumerate(newch):
            if c in seen_first:
                first_end[c] = i + 1
            else:
                seen_first[c] = i
                first_end[c] = i + 1
        spans = sorted((s, first_end[c]) for c, s in seen_first.items()
                       if first_end[c] > s + 1)
        if spans:
            keep, klink = [], []
            nc = 0
            for (s, e) in spans:
                while nc <= s:
                    keep.append(newch[nc])
                    if len(keep) > 1:
                        klink.append(newlink[nc - 1])
                    nc += 1
                nc = e
            while nc < len(newch):
                keep.append(newch[nc])
                if len(keep) > 1:
                    klink.append(newlink[nc - 1])
                nc += 1
            newch, newlink = keep, klink
        # remove clusters fully q-covered by their predecessor
        out, olink = [], []
        removed_prev = True
        for i, c in enumerate(newch):
            if (out and not removed_prev
                    and clusters[c].qStart >= clusters[out[-1]].qStart
                    and clusters[c].qEnd <= clusters[out[-1]].qEnd):
                removed_prev = True
                continue
            if out:
                olink.append(newlink[i - 1] if i - 1 < len(newlink) else False)
            out.append(c)
            removed_prev = False
        ch.ch = out
        ch.link = np.array(olink, bool)


def make_sdp2_problem(qpos, tpos, lengths, strand: int, starts, ends,
                      bonus: float) -> ChainProblem:
    """Merged same-diagonal groups -> kernel fragments (2-point insertion).

    qpos/tpos/lengths: anchors of ONE extended cluster (single strand);
    starts/ends: group slices from merge_same_diag.
    """
    g = len(starts)
    q_first = qpos[starts]
    q_last = qpos[ends - 1] + lengths[ends - 1]
    span = np.maximum(q_last - q_first, 0)
    if strand == 0:
        tS = tpos[starts]
    else:
        tS = tpos[ends - 1]
    qS = q_first
    qE = q_first + span
    tE = tS + span
    score = (span * bonus).astype(np.float32)
    lane1 = np.full(g, strand == 0)
    lane2 = np.full(g, strand == 1)
    order = np.argsort(qS, kind="stable")
    tbase = int(tS.min()) if g else 0
    # need_full stays True: on the tunneled dev TPU the masked-download
    # path's device traceback (an N-step scan) costs ~10x more than the
    # full download it replaces (SDP-2 round 0.06s -> 0.65s measured);
    # flip to need_full=False on links where d2h bandwidth dominates
    return ChainProblem(qS[order], qE[order], tS[order] - tbase,
                        tE[order] - tbase, score[order],
                        lane1[order], lane2[order], order, tbase)


def chain_vmax(p: ChainProblem) -> float:
    """Best chain value, from either result representation."""
    if p.V is not None and len(p.V):
        return float(np.max(p.V))
    return float(p.vmax)


def best_chain(p: ChainProblem) -> list:
    """Single best traceback; returns original fragment indices, chain END
    first (reference order)."""
    if p.V is None and p.chain_rows is not None:
        # masked path: the device walked bp already; rows are the chain
        # in descending q-sort order == walk order
        if p.vmax <= 0 or len(p.chain_rows) == 0:
            return []
        return [int(p.order[i]) for i in p.chain_rows]
    if p.V is None or len(p.V) == 0:
        return []
    i = int(np.argmax(p.V))
    if not np.isfinite(p.V[i]) or p.V[i] <= 0:
        return []
    out = []
    while i >= 0:
        out.append(int(p.order[i]))
        i = int(p.bp[i])
    return out
