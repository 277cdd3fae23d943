"""Cluster refinement: local-index reseeding, gap/end space reseeding.

Ports of reference: ClusterRefine.h:51-240 (``REFINEclusters``),
ClusterRefine.h:242-325 (``RefineSpace``), ClusterRefine.h:332-433
(``RefineBtwnSpace`` incl. reverse-strand inversion capture), and
ClusterRefine.h:434-615 (``RefineBtwnClusters_chain`` + end refinement).

Coordinate contract: clusters arrive with chrom-local t (the caller
rebases); reverse clusters are flipped to forward-read coordinates for
reseeding and flipped back (reference: SwapStrand, ClusterRefine.h:24-44).
"""

from __future__ import annotations

import numpy as np

from ..align.affine import fast_one_gap_align
from ..anchors import match_minimizer_lists
from ..cluster.types import Cluster
from ..index.local_index import LocalIndex, build_local_index
from ..index.minimizers import minimizers
from ..options import Options, ReadType


def _swap_strand(qpos: np.ndarray, read_len: int, K: int) -> np.ndarray:
    return read_len - (qpos + K)


def refine_clusters(clusters: list, genome, genome_li: LocalIndex,
                    read_codes: np.ndarray, read_rc: np.ndarray,
                    opts: Options, window: int = 100,
                    read_li=None, end_margin: int | None = None,
                    diag_margin: int = 100,
                    lowacc_walk: bool = False) -> list:
    """Reseed each cluster with local-index matches inside its diagonal
    band.  Returns new clusters (k = genome_li.k anchors, chrom-local t).
    Input clusters must already be chrom-local.

    window: genome-side window expansion (smallOpts.window, both paths).
    end_margin: read-boundary widening at the first/last genome window —
      the highacc path uses smallOpts.window=100 (ClusterRefine.h:168-185)
      but the lowacc path uses the hard-coded sow=500
      (ChainRefine.h:510-512), which is what seeds the read tails densely
      enough for the final chain to reach the read ends.  None = window.
    diag_margin: diagonal band around the cluster's [minDN, maxDN] —
      100 highacc (ClusterRefine.h:96-97), 50 lowacc
      (ChainRefine.h:426-427).
    lowacc_walk: per-genome-window read range semantics.  False = the
      REFINEclusters endpoint rule (inclusive window bounds, the two
      endpoint anchors' q starts, ClusterRefine.h:142-158).  True = the
      Refine_splitchain rule (strict window bounds, min qStart / max
      qEnd over the range, ChainRefine.h:463-485) — the qEnd side is
      what reaches the read-tail local-index window when the outermost
      anchor merely STARTS in the previous one, seeding the final few
      read bases."""
    read_len = len(read_codes)
    k = genome_li.k
    if end_margin is None:
        end_margin = window
    if read_li is None:
        read_li = [build_local_index(read_codes, k, genome_li.w,
                                     genome_li.window, opts.local_max_freq,
                                     exact=opts.exact_ref_minimizers),
                   build_local_index(read_rc, k, genome_li.w,
                                     genome_li.window, opts.local_max_freq,
                                     exact=opts.exact_ref_minimizers)]
    starts = genome.starts()
    refined = []
    for c in clusters:
        out = Cluster(np.zeros(0, np.int64), np.zeros(0, np.int64),
                      c.strand, k, c.anchorfreq, c.chrom)
        if len(c) == 0:
            refined.append(out)
            continue
        chrom_off = int(starts[c.chrom])
        chrom_end = int(genome.ends[c.chrom])
        q = c.qpos.copy()
        t = c.tpos.copy()          # chrom-local
        if c.strand == 1:
            if c.lengths is not None:
                # variable-length extended anchors: flip per anchor
                q = read_len - (q + c.lengths)
            else:
                q = _swap_strand(q, read_len, c.k)
        # diagonal band (reference: ClusterRefine.h:89-97 highacc +-100;
        # ChainRefine.h:426-427 lowacc +-50)
        d = t - q
        max_dn = int(d.max()) + diag_margin
        min_dn = int(d.min()) - diag_margin
        # box bounds use true anchor ENDS: extended clusters carry
        # variable per-anchor lengths, and the reference's qEnd/tEnd are
        # set from them (Mapping_ultility.h:339-344) — +k alone clips
        # the reseed box short of the cluster's real end and loses the
        # dense read-tail seeds the final chain needs
        qlo = int(q.min())
        tlo = int(t.min())
        if c.lengths is not None:
            qhi = int((q + c.lengths).max())
            thi = int((t + c.lengths).max())
        else:
            qhi = int(q.max()) + c.k
            thi = int(t.max()) + c.k

        # genome windows overlapping [tlo - window, thi + window]
        wts = max(chrom_off, chrom_off + tlo - window)
        wte = min(chrom_end - 1, chrom_off + thi + window)
        ls = genome_li.lookup_window(wts)
        le = genome_li.lookup_window(wte)

        rli = read_li[c.strand]
        # per genome window: intersect its minimizers with the read windows
        # overlapping the band-projected read range
        order_t = np.argsort(t, kind="stable")
        t_sorted = t[order_t]
        q_by_t = q[order_t]
        if c.lengths is not None:
            qend_by_t = q_by_t + c.lengths[order_t]
        else:
            qend_by_t = q_by_t + c.k

        from .. import native
        if native.available():
            qq, tt = native.local_reseed(
                genome_li, rli, ls, le, chrom_off, read_len,
                opts.local_max_freq, end_margin, t_sorted, q_by_t,
                qend_by_t, lowacc_walk,
                min_dn, max_dn, qlo, qhi, tlo, thi)
            if len(qq):
                if c.strand == 1:
                    qq = _swap_strand(qq, read_len, k)
                out.qpos = qq
                out.tpos = tt
                out.set_boundaries()
            refined.append(out)
            continue

        got_q, got_t = [], []
        for lsi in range(ls, le + 1):
            g_lo = int(genome_li.seq_offsets[lsi]) - chrom_off
            g_hi = int(genome_li.seq_offsets[lsi + 1]) - 1 - chrom_off
            if g_lo >= g_hi or g_lo < 0:
                continue
            if lowacc_walk:
                m_s = int(np.searchsorted(t_sorted, g_lo, side="right"))
                m_e = int(np.searchsorted(t_sorted, g_hi, side="left"))
                if m_s >= len(t_sorted) or m_e == m_s:
                    continue
                r_lo = int(q_by_t[m_s:m_e].min())
                r_hi = int(qend_by_t[m_s:m_e].max())
            else:
                m_s = int(np.searchsorted(t_sorted, g_lo, side="left"))
                m_e = int(np.searchsorted(t_sorted, g_hi, side="right"))
                if m_s >= len(t_sorted):
                    continue
                m_e = min(m_e, len(t_sorted) - 1)
                r_lo = int(q_by_t[m_s])
                r_hi = int(q_by_t[m_e])
                r_lo, r_hi = min(r_lo, r_hi), max(r_lo, r_hi)
            if lsi == ls:
                r_lo = max(0, r_lo - end_margin)
            if lsi == le:
                r_hi = min(read_len, r_hi + end_margin)
            if r_lo > r_hi:
                continue
            qi_s = rli.lookup_window(r_lo)
            qi_e = rli.lookup_window(min(r_hi, read_len - 1))
            rb_lo, _ = rli.window_rows(qi_s)
            _, rb_hi = rli.window_rows(qi_e)
            gb_lo, gb_hi = genome_li.window_rows(lsi)
            if rb_hi <= rb_lo or gb_hi <= gb_lo:
                continue
            gt = genome_li.tuples[gb_lo:gb_hi]
            gp = genome_li.pos[gb_lo:gb_hi].astype(np.int64)
            # read rows span multiple windows; tuples sorted per window only
            for qi in range(qi_s, qi_e + 1):
                a, b = rli.window_rows(qi)
                if b <= a:
                    continue
                roff = int(rli.seq_offsets[qi])
                qp, tp, _, _ = match_minimizer_lists(
                    rli.tuples[a:b], rli.pos[a:b].astype(np.int64) + roff,
                    gt, gp + g_lo, opts.local_max_freq)
                if len(qp) == 0:
                    continue
                diag = tp - qp
                keep = ((diag >= min_dn) & (diag <= max_dn)
                        & (qp >= qlo) & (qp < qhi)
                        & (tp >= tlo) & (tp < thi))
                got_q.append(qp[keep])
                got_t.append(tp[keep])
        if got_q:
            qq = np.concatenate(got_q)
            tt = np.concatenate(got_t)
            if len(qq):
                if c.strand == 1:
                    qq = _swap_strand(qq, read_len, k)
                out.qpos = qq
                out.tpos = tt
                out.set_boundaries()
        refined.append(out)
    return refined


def _harvest_blocks(blocks, qseq, tseq, K: int):
    """Match blocks of a box alignment -> k-mer seed positions + identity
    (the seed-harvest of RefineSpace's small-box branch,
    ClusterRefine.h:252-290).  Returns (qpos, tpos, identity), box-local."""
    got_q, got_t = [], []
    nmatch = 0
    for (bq, bt, ln) in blocks:
        nmatch += int((qseq[bq:bq + ln] == tseq[bt:bt + ln]).sum())
        if ln > K:
            bp = 0
            while bp + K < ln:
                if (qseq[bq + bp:bq + bp + K]
                        == tseq[bt + bp:bt + bp + K]).all():
                    got_q.append(bq + bp)
                    got_t.append(bt + bp)
                bp += K
    denom = min(len(qseq), len(tseq))
    identity = nmatch / denom if denom else 0.0
    return (np.asarray(got_q, np.int64), np.asarray(got_t, np.int64),
            identity)


def refine_space(K: int, W: int, diag_band: int, genome, chrom_codes,
                 read_strand_codes: np.ndarray, opts: Options,
                 qs: int, qe: int, ts: int, te: int):
    """Find anchors in a q x t box (reference: RefineSpace,
    ClusterRefine.h:242-325).  Coordinates: q in strand frame, t
    chrom-local.  Returns (qpos, tpos, identity)."""
    qseq = read_strand_codes[qs:qe]
    tseq = chrom_codes[ts:te]
    identity = -1.0
    if len(qseq) < 1000 and len(tseq) < 1000:
        res = fast_one_gap_align(qseq, tseq, opts.local_match,
                                 opts.local_mismatch, opts.local_indel, 30)
        qpos, tpos, identity = _harvest_blocks(res.blocks, qseq, tseq, K)
        return qpos + qs, tpos + ts, identity
    # large box: non-canonical minimizer reseed with diagonal band
    diag2 = (te - ts) - (qe - qs)
    min_dn = min(0, diag2) - diag_band
    max_dn = max(0, diag2) + diag_band
    gt, gpp, _ = minimizers(tseq, K, W, canonical=False,
                            exact=opts.exact_ref_minimizers)
    rt, rp, _ = minimizers(qseq, K, W, canonical=False,
                           exact=opts.exact_ref_minimizers)
    order = np.argsort(gt, kind="stable")
    gt, gpp = gt[order], gpp[order]
    qp, tp, _, _ = match_minimizer_lists(rt, rp.astype(np.int64), gt,
                                         gpp.astype(np.int64),
                                         opts.local_max_freq)
    if len(qp):
        diag = tp - qp
        keep = (diag >= min_dn) & (diag <= max_dn)
        qp, tp = qp[keep], tp[keep]
    return qp + qs, tp + ts, identity


def _space_diag(opts: Options, span: int) -> int:
    """reference: RefineBtwnSpace diagonal band (ClusterRefine.h:344-352)."""
    if opts.read_type in (ReadType.CONTIG, ReadType.CCS):
        return min(int(max(100.0, 0.01 * span)), 100)
    return min(int(max(100.0, 0.15 * span)), 1000)


class BoxTask:
    """A deferred RefineBtwnSpace box: geometry captured up front so all
    small-box alignments of a read batch go to the device in one round
    (the reference aligns each box inline on the CPU; on the tunneled TPU
    batching them is the difference between 162 host DPs and 2-3 device
    dispatches per batch)."""

    __slots__ = ("cluster", "chrom_codes", "read_codes", "read_rc", "K",
                 "W", "qs", "qe", "ts", "te", "two_blocks", "rev_out",
                 "job")

    def __init__(self, cluster, chrom_codes, read_codes, read_rc, K, W,
                 qs, qe, ts, te, two_blocks, rev_out):
        self.cluster = cluster
        self.chrom_codes = chrom_codes
        self.read_codes = read_codes
        self.read_rc = read_rc
        self.K = K
        self.W = W
        self.qs = qs
        self.qe = qe
        self.ts = ts
        self.te = te
        self.two_blocks = two_blocks
        self.rev_out = rev_out
        self.job = None


def _reseedable(cluster: Cluster, K: int) -> bool:
    """Seeds of width K can only append to a cluster holding K-width
    anchors (an unrefined low-acc cluster keeps its global-k anchors and
    a per-anchor lengths array; appending would desync them)."""
    return cluster.lengths is None and (len(cluster.qpos) == 0
                                        or cluster.k == K)


def enqueue_btwn_box(tasks: list, cluster: Cluster, chrom_codes,
                     read_codes, read_rc, K: int, W: int,
                     qs: int, qe: int, ts: int, te: int,
                     two_blocks: bool, rev_out: list) -> None:
    """Deferred refine_btwn_space: capture the box (q flipped to the
    cluster's strand frame, as refine_btwn_space does inline).  Boxes
    whose target cannot accept K-width seeds are dropped.

    Known delta vs the inline path / reference (ClusterRefine.h): box
    geometries are captured up front from pre-reseed cluster boundaries,
    so later gap/read-end boxes do not see clusters grown by earlier
    boxes in the same round.  Acceptable because grown boundaries only
    shrink a later box (seeds the smaller box would add are a subset of
    what the earlier box already seeded into the shared cluster)."""
    if not _reseedable(cluster, K):
        return
    read_len = len(read_codes)
    if cluster.strand == 1:
        qs, qe = read_len - qe, read_len - qs
    tasks.append(BoxTask(cluster, chrom_codes, read_codes, read_rc, K, W,
                         qs, qe, ts, te, two_blocks, rev_out))


def _box_seeds(tk: BoxTask, opts: Options, strand: int, qs: int, qe: int,
               job) -> tuple:
    """Seeds for one box on one strand: from a solved device job's blocks,
    or via the large-box minimizer reseed."""
    strands = [tk.read_codes, tk.read_rc]
    if job is not None:
        from .gap_align import job_block_list

        qseq = strands[strand][qs:qe]
        tseq = tk.chrom_codes[tk.ts:tk.te]
        qp, tp, _ = _harvest_blocks(job_block_list(job), qseq, tseq, tk.K)
        return qp + qs, tp + tk.ts
    band = _space_diag(opts, qe - qs)
    qp, tp, _ = refine_space(tk.K, tk.W, band, None, tk.chrom_codes,
                             strands[strand], opts, qs, qe, tk.ts, tk.te)
    return qp, tp


def _queue_box_job(tk: BoxTask, strand: int, qs: int, qe: int, jobs: list):
    from .gap_align import GapJob

    strand_seq = (tk.read_codes, tk.read_rc)[strand]
    qseq = strand_seq[qs:qe]
    tseq = tk.chrom_codes[tk.ts:tk.te]
    if 0 < len(qseq) < 1000 and 0 < len(tseq) < 1000:
        job = GapJob(np.ascontiguousarray(qseq),
                     np.ascontiguousarray(tseq), key=None, band=30)
        jobs.append(job)
        return job
    return None


def solve_box_tasks(tasks: list, opts: Options,
                    use_device: bool = True) -> None:
    """One batched device round with refine_btwn_space semantics: every
    box aligns on its own strand AND (speculatively) on the reverse
    strand in the same round — the reverse alignment is only consulted
    when the forward seeds come back too sparse (inversion capture), but
    aligning it up front trades cheap device compute for a whole
    dispatch+download round trip."""
    from .gap_align import solve_gap_jobs

    jobs = []
    spec = []
    for tk in tasks:
        tk.job = _queue_box_job(tk, tk.cluster.strand, tk.qs, tk.qe, jobs)
        rjob = None
        qs2 = qe2 = 0
        if not tk.two_blocks:
            read_len = len(tk.read_codes)
            rst = 1 - tk.cluster.strand
            qs2, qe2 = read_len - tk.qe, read_len - tk.qs
            rjob = _queue_box_job(tk, rst, qs2, qe2, jobs)
        spec.append((rjob, qs2, qe2))
    solve_gap_jobs(jobs, opts, use_device, tag="refine_boxes")

    for tk, (rjob, qs2, qe2) in zip(tasks, spec):
        st = tk.cluster.strand
        read_len = len(tk.read_codes)
        qp, tp = _box_seeds(tk, opts, st, tk.qs, tk.qe, tk.job)
        eff = len(qp) / max(1, min(tk.qe - tk.qs, tk.te - tk.ts))
        if len(qp) and (tk.two_blocks or eff >= opts.anchors_too_sparse * 2):
            _append_matches(tk.cluster, qp, tp, st, read_len, tk.K)
            continue
        if tk.two_blocks:
            continue
        rst = 1 - st
        qp2, tp2 = _box_seeds(tk, opts, rst, qs2, qe2, rjob)
        reff = len(qp2) / max(1, min(qe2 - qs2, tk.te - tk.ts))
        if eff >= reff:
            if len(qp):
                _append_matches(tk.cluster, qp, tp, st, read_len, tk.K)
            continue
        rc = Cluster(np.zeros(0, np.int64), np.zeros(0, np.int64), rst,
                     tk.K, 1.0, tk.cluster.chrom)
        _append_matches(rc, qp2, tp2, rst, read_len, tk.K)
        tk.rev_out.append(rc)


def refine_btwn_space(cluster: Cluster, genome, chrom_codes, read_codes,
                      read_rc, opts: Options, K: int, W: int,
                      qs: int, qe: int, ts: int, te: int,
                      two_blocks: bool, rev_clusters: list) -> bool:
    """Reseed the space between two clusters, trying the reverse strand
    when forward is too sparse (reference: RefineBtwnSpace,
    ClusterRefine.h:332-433).  q coords in forward-read frame.  Returns
    True when a reverse (inversion) cluster was emitted."""
    if not _reseedable(cluster, K):
        return False
    read_len = len(read_codes)
    st = cluster.strand
    if st == 1:
        qs, qe = read_len - qe, read_len - qs
    strands = [read_codes, read_rc]
    band = _space_diag(opts, qe - qs)
    qp, tp, _ = refine_space(K, W, band, genome, chrom_codes, strands[st],
                             opts, qs, qe, ts, te)
    eff = len(qp) / max(1, min(qe - qs, te - ts))
    if len(qp) and (two_blocks or eff >= opts.anchors_too_sparse * 2):
        _append_matches(cluster, qp, tp, st, read_len, K)
        return False
    if two_blocks:
        return False
    # try the reverse strand
    rst = 1 - st
    qs2, qe2 = read_len - qe, read_len - qs
    qp2, tp2, _ = refine_space(K, W, band, genome, chrom_codes,
                               strands[rst], opts, qs2, qe2, ts, te)
    reff = len(qp2) / max(1, min(qe2 - qs2, te - ts))
    if eff >= reff:
        if len(qp):
            _append_matches(cluster, qp, tp, st, read_len, K)
        return False
    rc = Cluster(np.zeros(0, np.int64), np.zeros(0, np.int64), rst, K,
                 1.0, cluster.chrom)
    _append_matches(rc, qp2, tp2, rst, read_len, K)
    rev_clusters.append(rc)
    return True


def _append_matches(cluster: Cluster, qp, tp, st, read_len, K):
    """Append reseeded anchors; flip q back to fwd-read frame for rev
    clusters (reference: RefineSpace consider_str, ClusterRefine.h:322).
    The pipeline uses one anchor length K per path (reference:
    Map_highacc.h:468-470), so lengths stay uniform."""
    assert cluster.k == K or len(cluster.qpos) == 0, (cluster.k, K)
    if st == 1:
        qp = read_len - qp - K
    if len(cluster.qpos):
        cluster.qpos = np.concatenate([cluster.qpos, qp])
        cluster.tpos = np.concatenate([cluster.tpos, tp])
    else:
        cluster.qpos = qp
        cluster.tpos = tp
        cluster.k = K
    if len(cluster.qpos):
        cluster.set_boundaries()


def refine_btwn_clusters_chain(chain_clusters: list, genome, read_codes,
                               read_rc, opts: Options, K: int, W: int,
                               box_tasks: list | None = None) -> list:
    """Reseed gaps between adjacent chain clusters and the two read ends
    (reference: RefineBtwnClusters_chain, ClusterRefine.h:434-615).
    chain_clusters: clusters in chain order (end-first: descending q),
    chrom-local t."""
    read_len = len(read_codes)
    low_b = 1000 if opts.read_type == ReadType.CONTIG else 20
    upper = 100000 if opts.read_type == ReadType.CONTIG else 50000
    # the lowacc path gates btwn/end reseeds on refineSpaceDist=10000
    # (reference: ChainRefine.h:524-527,710,745), not the highacc 50000
    if opts.read_type in (ReadType.ONT, ReadType.CLR):
        upper = opts.refine_space_dist
    starts = genome.starts()
    rev_clusters: list = []   # captured inversion clusters (returned)
    for c in range(1, len(chain_clusters)):
        cur = chain_clusters[c]
        prev = chain_clusters[c - 1]
        if len(cur) == 0 or len(prev) == 0:
            continue
        qs, qe = cur.qEnd, prev.qStart
        if qe <= qs or cur.chrom != prev.chrom:
            continue
        chrom_codes = genome.codes[starts[cur.chrom]:genome.ends[cur.chrom]]
        if cur.strand == prev.strand:
            if cur.tEnd <= prev.tStart:
                ts1, te1 = cur.tEnd, prev.tStart
            elif cur.tStart > prev.tEnd:
                ts1, te1 = prev.tEnd, cur.tStart
            else:
                continue
            if te1 <= ts1:
                continue
            span = max(qe - qs, te1 - ts1)
            if low_b <= span <= upper:
                if box_tasks is not None:
                    enqueue_btwn_box(box_tasks, cur, chrom_codes,
                                     read_codes, read_rc, K, W, qs, qe,
                                     ts1, te1, False, rev_clusters)
                else:
                    refine_btwn_space(cur, genome, chrom_codes, read_codes,
                                      read_rc, opts, K, W, qs, qe, ts1, te1,
                                      False, rev_clusters)
        else:
            # INV boundary: reseed the q gap on BOTH strands (two-block
            # boxes), extending cur on its strand and prev on its —
            # this is what grows a partially-seeded inversion segment to
            # its true breakpoints (reference: Refine_Btwnsplitchain INV
            # case, ChainRefine.h:615-641, boxes appended via
            # RefineBtwnSpace with twoblocks=1)
            gapq = qe - qs
            if cur.tEnd <= prev.tStart:
                if cur.strand == 0:
                    ts1, te1 = cur.tEnd, cur.tEnd + gapq
                    ts2, te2 = prev.tEnd, prev.tEnd + gapq
                else:
                    te1 = cur.tStart
                    ts1 = max(0, te1 - gapq)
                    te2 = prev.tStart
                    ts2 = max(0, te2 - gapq)
            elif cur.tStart > prev.tEnd:
                if cur.strand == 0:
                    ts1, te1 = cur.tEnd, cur.tEnd + gapq
                    te2 = cur.tStart
                    ts2 = max(0, te2 - gapq)
                else:
                    te1 = cur.tStart
                    ts1 = max(0, te1 - gapq)
                    te2 = prev.tStart
                    ts2 = max(0, te2 - gapq)
            else:
                continue
            chrom_len = len(chrom_codes)
            for (tsx, tex, target) in ((ts1, te1, cur), (ts2, te2, prev)):
                if tex <= tsx or tex >= chrom_len:
                    continue
                space = max(gapq, tex - tsx)
                if not (20 <= space <= opts.refine_space_dist):
                    continue
                if box_tasks is not None:
                    enqueue_btwn_box(box_tasks, target, chrom_codes,
                                     read_codes, read_rc, K, W, qs, qe,
                                     tsx, tex, True, rev_clusters)
                else:
                    refine_btwn_space(target, genome, chrom_codes,
                                      read_codes, read_rc, opts, K, W,
                                      qs, qe, tsx, tex, True,
                                      rev_clusters)
    # read-end spaces (reference: ClusterRefine.h:546-613 highacc /
    # ChainRefine.h:694-741 lowacc — identical geometry in both: the t
    # box projects the q gap from the chain end, then expands 500bp on
    # the far side (lrts/lrlength) so deletions near the read end can
    # still be reached; gated on te+500 < chrom_len BEFORE expansion)
    lowacc = opts.read_type in (ReadType.ONT, ReadType.CLR)
    end_low = 20 if lowacc else low_b
    end_upper = opts.refine_space_dist if lowacc else upper
    for end_right in (True, False):
        cc = chain_clusters[0] if end_right else chain_clusters[-1]
        if len(cc) == 0:
            continue
        chrom_codes = genome.codes[starts[cc.chrom]:genome.ends[cc.chrom]]
        chrom_len = len(chrom_codes)
        st = cc.strand
        if end_right:
            qs, qe = cc.qEnd, read_len
            if st == 0:
                ts = cc.tEnd
                te = ts + (qe - qs)
                lrts, lrlength = 0, 500
            else:
                te = cc.tStart
                if te <= qe - qs:   # reference sets te=0 -> te>ts fails
                    continue
                ts = te - (qe - qs)
                lrts = 500 if ts > 500 else 0
                lrlength = lrts
        else:
            qs, qe = 0, cc.qStart
            if st == 0:
                te = cc.tStart
                ts = te - (qe - qs) if te > qe - qs else 0
                lrts = 500 if ts > 500 else 0
                lrlength = lrts
            else:
                ts = cc.tEnd
                te = ts + (qe - qs)
                lrts, lrlength = 0, 500
        if qe <= qs or te <= ts:
            continue
        span = max(qe - qs, te - ts)
        if not (end_low <= span < end_upper) or te + 500 >= chrom_len:
            continue
        # expanded t box [ts-lrts, te-lrts+lrlength) (RefineSpace's
        # refSeq slice, ClusterRefine.h:259); harvested seed t
        # coordinates are relative to the expanded start, as there
        tsx, tex = ts - lrts, te - lrts + lrlength
        if box_tasks is not None:
            enqueue_btwn_box(box_tasks, cc, chrom_codes, read_codes,
                             read_rc, K, W, qs, qe, tsx, tex, True,
                             rev_clusters)
        else:
            refine_btwn_space(cc, genome, chrom_codes, read_codes,
                              read_rc, opts, K, W, qs, qe, tsx, tex, True,
                              rev_clusters)
    return rev_clusters
