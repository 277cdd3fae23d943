"""Big inter-anchor gap closure: reseed + forward-only SDP (the 3rd SDP).

Port of the >=300bp-gap branch of ``RefinedAlignmentbtwnAnchors``
(reference: LocalRefineAlignment.h:236-390): reseed the gap box with
small non-canonical minimizers (k in {6,9,12} chosen by gap size with
accuracy-matched waiting times), linearly extend, chain with the
forward-only SDP (reference: SparseDP_Forward.h:312 — the same machinery
restricted to lane 1), remove paired indels, and return the chained
anchors; the remaining sub-gaps go to the banded aligner.

The reverse-strand re-seed ("inversion in a gap") check is also ported:
when forward seeding is too sparse and identity < 0.8, the reverse strand
is tried; if it wins, the caller receives inversion=True and splits the
segment (reference: LocalRefineAlignment.h:292-352).
"""

from __future__ import annotations

import numpy as np

from ..align.extend import linear_extend_cluster, trim_overlapped_anchors
from ..chain.cleaners import AnchorChain, remove_paired_indels
from ..cluster.types import Cluster
from ..ops.gapcost import GapParams
from ..ops.sdp import chain_scores_np, traceback
from ..options import Options, ReadType
from .refine import refine_space


def _seed_params(max_dist: int):
    """k/w and min seeding ratio by gap size
    (reference: LocalRefineAlignment.h:263-283)."""
    if max_dist < 100:
        return 6, 5, 0.5 / 29.5
    if max_dist < 500:
        return 9, 7, 0.5 / 69.1
    return 12, 7, 0.5 / 140.2


def _space_diag(opts: Options, read_dist: int, sv_diag: int) -> int:
    if opts.read_type in (ReadType.CONTIG, ReadType.CCS):
        d = min(int(max(80.0, 0.01 * read_dist)), 500)
    else:
        d = min(int(max(100.0, 0.15 * read_dist)), 2000)
    return max(2 * sv_diag, d)


def close_big_gap(read_strand: np.ndarray, chrom: np.ndarray,
                  opts: Options, gp: GapParams,
                  q0: int, q1: int, t0: int, t1: int,
                  prev_len: int, next_len: int,
                  rc_strand: np.ndarray | None = None):
    """Gap between anchor ends (q0,t0) and next starts (q1,t1), all in
    the segment's strand frame / chrom-local.

    Returns (anchors, inversion_detected):
    anchors = [(q, t, len)] ascending, possibly empty.
    """
    read_dist = q1 - q0
    genome_dist = t1 - t0
    max_dist = max(read_dist, genome_dist)
    sv_diag = max_dist - min(read_dist, genome_dist)
    k, w, min_ratio = _seed_params(max_dist)
    band = _space_diag(opts, read_dist, sv_diag)

    qp, tp, identity = refine_space(k, w, band, None, chrom, read_strand,
                                    opts, q0, q1, t0, t1)
    min_dist = min(read_dist, genome_dist)
    inversion = False
    if (len(qp) / max(1, min_dist)) < min_ratio and 0 <= identity < 0.8 \
            and rc_strand is not None:
        # try the reverse strand over the flipped read window
        L = len(read_strand)
        q0r, q1r = L - q1, L - q0
        qp2, tp2, _ = refine_space(k, w, band, None, chrom, rc_strand,
                                   opts, q0r, q1r, t0, t1)
        if len(qp2) > len(qp):
            inversion = True
            return [], True     # caller handles segment split / typing
    if len(qp) == 0:
        return [], False

    # linear extension of the seeds (forward frame)
    c = Cluster(qp, tp, 0, k, 1.0, 0)
    q, t, ln, _ = linear_extend_cluster(c, read_strand, chrom, k)
    trim_overlapped_anchors(q, t, ln, 0)
    keep = (ln > 0) & (q >= q0) & (q + ln <= q1) & (t >= t0) & (t + ln <= t1)
    q, t, ln = q[keep], t[keep], ln[keep]
    if len(q) == 0:
        return [], False

    # add flanking pseudo-anchors so chaining is anchored at both ends
    # (reference: LocalRefineAlignment.h:364-377)
    q = np.concatenate([[q0 - prev_len], q, [q1]])
    t = np.concatenate([[t0 - prev_len], t, [t1]])
    ln = np.concatenate([[prev_len], ln, [next_len]])

    order = np.argsort(q, kind="stable")
    q, t, ln = q[order], t[order], ln[order]
    lane1 = np.ones(len(q), bool)
    lane2 = np.zeros(len(q), bool)   # forward-only (3rd SDP)
    valid = np.ones(len(q), bool)
    V, bp, lane = chain_scores_np(q, q + ln, t, t + ln,
                                  (ln * 2.0).astype(np.float32),
                                  lane1, lane2, valid, gp)
    chain, _ = traceback(V, bp, lane, valid)
    if len(chain) == 0:
        return [], False
    rows = sorted(int(i) for i in chain)
    out = []
    ac = AnchorChain(q[rows][::-1].copy(), t[rows][::-1].copy(),
                     ln[rows][::-1].copy(),
                     np.zeros(len(rows), np.uint8),
                     np.zeros(len(rows), np.int64))
    remove_paired_indels(ac, refine_ends=False)
    for i in range(len(ac) - 1, -1, -1):
        bq, bt, bl = int(ac.qpos[i]), int(ac.tpos[i]), int(ac.length[i])
        # drop the flanking pseudo-anchors
        if (bq == q0 - prev_len and bt == t0 - prev_len) or \
           (bq == q1 and bt == t1):
            continue
        out.append((bq, bt, bl))
    out.sort()
    return out, False
