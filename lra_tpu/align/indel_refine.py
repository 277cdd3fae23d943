"""Indel consolidation + end extension over assembled block lists.

Behavioral port of the reference's ``IndelRefineAlignment``
(reference: IndelRefine.h:53-787): runs of blocks separated by
< refine_band-1 gaps (interior blocks < 100bp) are re-aligned with a
banded DP so nearby small indels consolidate; with ``end_align`` the
alignment is first extended by up to 40bp of assumed match at each read
end (IndelRefine.h:89-127).

Mechanism difference (documented): the reference carves a shaped band
that follows the existing path through the region; we re-align the whole
region with the banded-global kernel (band = refine_band + drift), which
explores a superset of that band — same or better optimum, same scoring.
Regions are solved as batched device jobs alongside the gap-closing ones.
"""

from __future__ import annotations

import numpy as np

from ..options import Options
from ..pipeline.gap_align import GapJob, diag_gap_guard


def plan_end_extension(seg, read_len: int, chrom_len: int) -> None:
    """end_align: prepend/append <=40bp assumed-match blocks
    (reference: IndelRefine.h:89-127)."""
    if not seg.blocks:
        return
    q0, t0, _ = seg.blocks[0]
    m = min(q0, t0)
    if 0 < m < 40:
        seg.blocks.insert(0, (q0 - m, t0 - m, m))
    qe = seg.qEnd
    te = seg.tEnd
    m = min(read_len - qe, chrom_len - te)
    if 0 < m < 40:
        seg.blocks.append((qe, te, m))


def plan_refine_regions(seg, opts: Options):
    """Group block runs to re-align (reference: IndelRefine.h:133-165).
    Returns list of (start_block, end_block_inclusive)."""
    blocks = seg.blocks
    max_gap = opts.refine_band - 1
    regions = []
    i = 0
    n = len(blocks)
    while i < n:
        j = i
        while j < n - 1:
            q, t, ln = blocks[j]
            qn, tn, ln_n = blocks[j + 1]
            qgap = qn - (q + ln)
            tgap = tn - (t + ln)
            # span cap: a very noisy read can otherwise chain most of its
            # blocks into one region, creating device jobs of unbounded
            # length (each a fresh compile + a long sequential scan);
            # consolidation within 1kb windows is still ~30x wider than
            # the reference's refine band (the scale at which it merges
            # nearby indels, IndelRefine.h:133-165).  The cap leaves room
            # for the two flank windows so the job stays inside the
            # S=1024 size bucket — spilling into S=2048 doubles both the
            # kernel scan length and the op-plane download per job
            span = qn + ln_n - blocks[i][0]
            if qgap < max_gap and tgap < max_gap and \
               (j == i or blocks[j][2] < 100) and \
               span <= 1024 - 2 * max_gap:
                j += 1
            else:
                break
        if j > i:
            regions.append((i, j))
        i = max(j, i + 1)
    return regions


def queue_indel_refine_jobs(seg, read: np.ndarray, chrom: np.ndarray,
                            opts: Options, key_prefix: tuple) -> list:
    """Create banded re-alignment jobs for each fragmented region.
    Returns jobs whose key carries (block_lo, block_hi) for splicing."""
    jobs = []
    max_gap = opts.refine_band - 1
    # single-mismatch fast path: a region whose junctions are all
    # diagonal-preserving (qgap == tgap) AND that contains at most ONE
    # mismatched base total cannot be improved by the banded re-DP —
    # converting X mismatches to matches gains X*(m-mm) but costs at
    # least an ins+del pair 2|ind| plus one unalignable base m, so with
    # |mm| < 2|ind| the diagonal is strictly optimal only for X <= 1
    # (X >= 2 CAN be beaten when a shift-periodic block separates the
    # SNPs, so those regions are re-DP'd like the reference does).
    diag_ok = diag_gap_guard(opts)
    for (lo, hi) in plan_refine_regions(seg, opts):
        if diag_ok:
            mm_total = 0
            diagonal = True
            for j in range(lo, hi):
                q0, t0, l0 = seg.blocks[j]
                q1, t1, _ = seg.blocks[j + 1]
                if q1 - (q0 + l0) != t1 - (t0 + l0):
                    diagonal = False
                    break
                mm_total += int(np.count_nonzero(
                    read[q0 + l0:q1] != chrom[t0 + l0:t1]))
                if mm_total > 1:
                    break
            if diagonal and mm_total <= 1:
                continue
        # long flanking blocks stay fixed; only their trailing/leading
        # max_gap bases enter the window (reference: IndelRefine.h:175-205)
        q0, t0, ln0 = seg.blocks[lo]
        trim0 = max(0, ln0 - max_gap)
        q0 += trim0
        t0 += trim0
        qe_b, te_b, ln_b = seg.blocks[hi]
        keep1 = min(ln_b, max_gap)
        q1, t1 = qe_b + keep1, te_b + keep1
        if q1 <= q0 or t1 <= t0:
            continue
        drift = abs((q1 - q0) - (t1 - t0))
        band = opts.refine_band + drift
        job = GapJob(read[q0:q1], chrom[t0:t1],
                     key_prefix + (lo, hi, q0, t0, trim0, keep1))
        job.band = band
        jobs.append(job)
    return jobs


def splice_refined_blocks(seg, jobs: list) -> None:
    """Replace each region's blocks with its re-aligned blocks."""
    if not jobs:
        return
    repl = {}
    for job in jobs:
        lo, hi, q0, t0, trim0, keep1 = job.key[3:9]
        if job.blocks:
            nb = [(q0 + bq, t0 + bt, bl) for (bq, bt, bl) in job.blocks]
            # retained flank pieces of the trimmed boundary blocks
            pre = []
            if trim0 > 0:
                bq, bt, _ = seg.blocks[lo]
                pre = [(bq, bt, trim0)]
            post = []
            bq, bt, bl = seg.blocks[hi]
            if bl > keep1:
                post = [(bq + keep1, bt + keep1, bl - keep1)]
            repl[(lo, hi)] = pre + nb + post
    if not repl:
        return
    # splice by slices (regions are disjoint), then a vectorized
    # monotonicity check with the python drop-scan only on violation
    out = []
    i = 0
    for (lo, hi), nb in sorted(repl.items()):
        if lo < i:
            # regions from plan_refine_regions can share a boundary
            # block (i = max(j, i+1)); the first span wins and an
            # overlapping successor is dropped, exactly like the
            # original index walk
            continue
        out.extend(seg.blocks[i:lo])
        out.extend(nb)
        i = hi + 1
    out.extend(seg.blocks[i:])
    a = np.asarray(out, np.int64)
    if len(a):
        q, t, ln = a[:, 0], a[:, 1], a[:, 2]
        if bool(np.all(ln > 0)) and bool(
                np.all((q[1:] >= q[:-1] + ln[:-1])
                       & (t[1:] >= t[:-1] + ln[:-1]))):
            seg.blocks = out
            return
    clean = []
    pq = pt = -1
    for (bq, bt, bl) in out:
        if bq >= pq and bt >= pt and bl > 0:
            clean.append((bq, bt, bl))
            pq, pt = bq + bl, bt + bl
    seg.blocks = clean
