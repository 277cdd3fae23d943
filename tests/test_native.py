import gzip

import numpy as np
import pytest

from lra_tpu import native, seq as sequtils
from lra_tpu.index.minimizers import (_sliding_min, kmer_codes)


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _numpy_minimizers(codes, k, w, canonical=True):
    """The pure-numpy reference path (native bypassed)."""
    fwd, rc, valid = kmer_codes(codes, k)
    if canonical:
        use_rc = rc < fwd
        canon = np.where(use_rc, rc, fwd)
        strand = use_rc.astype(np.uint8)
    else:
        canon, strand = fwd, np.zeros(len(fwd), np.uint8)
    canon_m = np.where(valid, canon, np.uint64(0xFFFFFFFFFFFFFFFF))
    _, argpos = _sliding_min(canon_m, w)
    vcs = np.concatenate([[0], np.cumsum(valid.astype(np.int32))])
    win_valid = (vcs[w:] - vcs[:-w]) == w
    argpos = argpos[win_valid]
    if len(argpos) == 0:
        return (np.zeros(0, np.uint64), np.zeros(0, np.uint32),
                np.zeros(0, np.uint8))
    keep = np.concatenate([[True], argpos[1:] != argpos[:-1]])
    occ = argpos[keep]
    return canon[occ], occ.astype(np.uint32), strand[occ]


def test_native_minimizers_match_numpy(rng):
    for trial in range(20):
        n = int(rng.integers(100, 3000))
        codes = rng.integers(0, 4, n).astype(np.uint8)
        if trial % 3 == 0:
            p = int(rng.integers(0, n - 10))
            codes[p:p + 5] = 4
        for k, w, canon in [(15, 10, True), (25, 20, True), (10, 5, False)]:
            a = native.minimizers(codes, k, w, canon, exact=False)
            b = _numpy_minimizers(codes, k, w, canon)
            for x, y in zip(a, b):
                assert np.array_equal(x, y), (trial, k, w, canon)


def test_native_loader_fasta_and_fastq_gz(rng, tmp_path):
    seqs = [(f"s{i}", sequtils.decode(
        rng.integers(0, 4, int(rng.integers(50, 300))).astype(np.uint8)))
        for i in range(7)]
    fa = tmp_path / "x.fa"
    with open(fa, "w") as f:
        for n, s in seqs:
            f.write(f">{n} desc\n")
            for i in range(0, len(s), 61):
                f.write(s[i:i + 61] + "\n")
    fq = tmp_path / "x.fq.gz"
    with gzip.open(fq, "wt") as f:
        for n, s in seqs:
            f.write(f"@{n}\n{s}\n+\n{'5' * len(s)}\n")
    for path, wq in ((str(fa), False), (str(fq), True)):
        names, offsets, codes, quals = native.load_seqs(path, want_quals=wq)
        assert names == [n for n, _ in seqs]
        for i, (n, s) in enumerate(seqs):
            assert sequtils.decode(codes[offsets[i]:offsets[i + 1]]) == s
        if wq:
            assert (quals == ord("5")).all()


def test_native_linear_extend_matches_python(rng):
    """The C++ extension walk must reproduce the Python walk exactly on
    random clusters, both strands, with and without overlap points."""
    import lra_tpu.native as native
    if not native.available():
        import pytest
        pytest.skip("native lib unavailable")
    from lra_tpu.align.extend import linear_extend_cluster
    from lra_tpu.cluster.types import Cluster
    from lra_tpu import seq as sequtils

    for trial in range(40):
        K = int(rng.integers(8, 20))
        chrom = rng.integers(0, 4, 4000).astype(np.uint8)
        strand = int(rng.random() < 0.5)
        # read derived from chrom span so anchors are real matches
        t0 = int(rng.integers(0, 1500))
        span = chrom[t0:t0 + 2000].copy()
        for _ in range(int(rng.integers(0, 30))):
            p = int(rng.integers(0, len(span)))
            span[p] = (span[p] + 1) % 4
        read = span if strand == 0 else sequtils.revcomp(span)
        # anchors: exact K-mer matches between read (strand frame) and chrom
        rs = read if strand == 0 else sequtils.revcomp(read)
        qs, ts = [], []
        for _ in range(int(rng.integers(2, 60))):
            qq = int(rng.integers(0, len(span) - K))
            if strand == 0:
                tt = t0 + qq
                if (read[qq:qq + K] == chrom[tt:tt + K]).all():
                    qs.append(qq); ts.append(tt)
            else:
                # rev anchor bookkeeping: q fwd-read frame, t lowest coord
                tt = t0 + len(span) - qq - K
                qs.append(qq); ts.append(tt)
        if len(qs) < 2:
            continue
        c = Cluster(np.array(qs, np.int64), np.array(ts, np.int64),
                    strand, K, 1.0, 0)
        c.set_boundaries()
        pts = []
        if rng.random() < 0.5:
            pts = [(int(rng.integers(0, 2000)), bool(rng.random() < 0.5))]
        got = linear_extend_cluster(c, read if strand == 0 else
                                    sequtils.revcomp(read), chrom, K, pts)
        # force the Python path
        real = native._lib
        native._lib = False
        try:
            want = linear_extend_cluster(c, read if strand == 0 else
                                         sequtils.revcomp(read), chrom, K,
                                         pts)
        finally:
            native._lib = real
        for a, b in zip(got, want):
            assert np.array_equal(a, b), (trial, strand, got, want)


def test_native_local_index_build_matches_python(rng):
    import lra_tpu.native as native
    if not native.available():
        import pytest
        pytest.skip("native lib unavailable")
    from lra_tpu.index.local_index import build_local_index
    from lra_tpu.sim import random_genome

    codes = random_genome(rng, 30000)
    nat = build_local_index(codes, 10, 5, 256, 15)
    real = native._lib
    native._lib = False
    try:
        py = build_local_index(codes, 10, 5, 256, 15)
    finally:
        native._lib = real
    assert np.array_equal(nat.tuples, py.tuples)
    assert np.array_equal(nat.pos, py.pos)
    assert np.array_equal(nat.seq_offsets, py.seq_offsets)
    assert np.array_equal(nat.tuple_bounds, py.tuple_bounds)


def test_native_local_reseed_matches_python(rng):
    import lra_tpu.native as native
    if not native.available():
        import pytest
        pytest.skip("native lib unavailable")
    from lra_tpu import preset, seq as sequtils
    from lra_tpu.anchors import find_matches
    from lra_tpu.cluster.fine import matches_to_fine_clusters
    from lra_tpu.cluster.types import Cluster
    from lra_tpu.index.global_index import build_global_index
    from lra_tpu.index.local_index import build_genome_local_index
    from lra_tpu.io.genome import Genome
    from lra_tpu.pipeline import refine as rf_mod
    from lra_tpu.sim import random_genome, sample_read

    genome = Genome.from_seqs([("chr1", random_genome(rng, 150000))])
    opts = preset("ont")
    gidx = build_global_index(genome, preset("ccs"))
    gli = build_genome_local_index(genome, k=10, w=opts.local_w,
                                   window=opts.local_index_window,
                                   max_freq=opts.local_max_freq)
    real = native._lib
    checked = 0
    for i in range(5):
        r = sample_read(rng, genome.codes, 5000, snp=0.03, ins=0.01,
                        dele=0.01)
        fwd, rev = find_matches(r.codes, gidx, preset("ccs"))
        cls = (matches_to_fine_clusters(fwd.qpos, fwd.tpos, preset("ccs"),
                                        genome, gidx.k, 0)
               + matches_to_fine_clusters(rev.qpos, rev.tpos, preset("ccs"),
                                          genome, gidx.k, 1))
        if not cls:
            continue

        def copies():
            return [Cluster(c.qpos.copy(), c.tpos.copy(), c.strand, c.k,
                            c.anchorfreq, c.chrom) for c in cls]
        rc = sequtils.revcomp(r.codes)
        a = rf_mod.refine_clusters(copies(), genome, gli, r.codes, rc, opts)
        native._lib = False
        try:
            b = rf_mod.refine_clusters(copies(), genome, gli, r.codes, rc,
                                       opts)
        finally:
            native._lib = real
        for ca, cb in zip(a, b):
            assert np.array_equal(ca.qpos, cb.qpos)
            assert np.array_equal(ca.tpos, cb.tpos)
            checked += 1
    assert checked


def test_native_match_batch_matches_numpy(rng):
    """lrn_match_batch must be bit-identical (values AND order) to the
    numpy intersection in anchors.find_matches_batch."""
    from lra_tpu import native, preset
    from lra_tpu.anchors import find_matches_batch
    from lra_tpu.index.global_index import build_global_index
    from lra_tpu.io.genome import Genome
    from lra_tpu.sim import random_genome, sample_read

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    g = random_genome(rng, 150000)
    genome = Genome.from_seqs([("chr1", g)])
    opts = preset("ccs")
    idx = build_global_index(genome, opts)
    reads = [sample_read(rng, g, 3000, snp=0.01).codes for _ in range(6)]
    reads.append(np.zeros(10, np.uint8))          # shorter than k
    nat = find_matches_batch(reads, idx, opts)
    real = native._lib
    native._lib = False
    try:
        ref = find_matches_batch(reads, idx, opts)
    finally:
        native._lib = real
    assert len(nat) == len(ref)
    for (nf, nr), (rf, rr) in zip(nat, ref):
        for a, b in ((nf, rf), (nr, rr)):
            np.testing.assert_array_equal(a.qpos, b.qpos)
            np.testing.assert_array_equal(a.tpos, b.tpos)
            np.testing.assert_array_equal(a.freq, b.freq)


def test_native_banded_align_matches_numpy(rng):
    """lrn_banded_align must produce the same blocks and score as the
    numpy banded kernel + traceback on random mutated pairs."""
    from lra_tpu import native
    from lra_tpu.ops.affine_kernel import banded_global_np, traceback_banded

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    for trial in range(40):
        n = int(rng.integers(5, 800))
        t = rng.integers(0, 4, n).astype(np.int8)
        q = t.copy()
        # mutate: SNPs + small indels
        for _ in range(int(rng.integers(0, max(2, n // 30)))):
            p = int(rng.integers(0, len(q)))
            r = rng.random()
            if r < 0.6:
                q[p] = (q[p] + 1 + int(rng.integers(0, 3))) % 4
            elif r < 0.8 and len(q) > 10:
                q = np.delete(q, p)
            else:
                q = np.insert(q, p, int(rng.integers(0, 4)))
        qLen, tLen = len(q), len(t)
        diag = max(1, min(qLen, tLen))
        kk = min(diag, 30)
        if diag + 2 * kk < max(qLen, tLen):
            continue
        K = 2 * kk
        res = native.banded_align(q, t, K, K, 4, -3, -4)
        assert res is not None
        nb, nscore = res
        score, arrows = banded_global_np(
            q.reshape(1, -1), t.reshape(1, -1),
            np.array([qLen], np.int32), np.array([tLen], np.int32),
            K, 4, -3, -4, np.array([K], np.int32))
        rb, _ = traceback_banded(arrows[0], qLen, tLen, K)
        assert nb == rb, (trial, nb[:5], rb[:5])
        assert nscore == int(score[0]), (trial, nscore, score[0])


def test_plan_indel_regions_matches_python():
    """Native region planner == python plan + classification, including
    the trivial-identity fast path and tiny-window fallback."""
    import lra_tpu.native as nat
    from lra_tpu import preset
    from lra_tpu.align import indel_refine as ir

    if not nat.available():
        return

    class Seg:
        pass

    rng = np.random.default_rng(11)
    opts = preset("ont")
    for trial in range(60):
        n = int(rng.integers(1, 50))
        blocks = []
        q = t = int(rng.integers(0, 5))
        for _ in range(n):
            ln = int(rng.integers(1, 120))
            blocks.append((q, t, ln))
            q += ln + int(rng.integers(0, 12))
            t += ln + int(rng.integers(0, 12))
        read = rng.integers(0, 4, q + 50).astype(np.uint8)
        chrom = rng.integers(0, 4, t + 50).astype(np.uint8)
        real = nat.plan_indel_regions
        try:
            nat.plan_indel_regions = lambda *a, **k: None
            s_py = Seg()
            s_py.blocks = list(blocks)
            j_py = ir.queue_indel_refine_jobs(s_py, read, chrom, opts,
                                              ("k",))
        finally:
            nat.plan_indel_regions = real
        s_nat = Seg()
        s_nat.blocks = list(blocks)
        j_nat = ir.queue_indel_refine_jobs(s_nat, read, chrom, opts,
                                           ("k",))
        assert [tuple(p) for p in s_py.refine_plan] == \
            [tuple(p) for p in s_nat.refine_plan]
        assert len(j_py) == len(j_nat)
        for a, b in zip(j_py, j_nat):
            assert a.key == b.key and a.band == b.band \
                and a.refine == b.refine
            assert np.array_equal(a.q, b.q) and np.array_equal(a.t, b.t)


def test_op_arrays_matches_python():
    """Native op-run builder == python blocks_to_op_arrays."""
    import lra_tpu.native as nat
    from lra_tpu.align.cigar import blocks_to_op_arrays

    if not nat.available():
        return
    rng = np.random.default_rng(13)
    for trial in range(60):
        n = int(rng.integers(1, 40))
        blocks = []
        q = t = int(rng.integers(0, 4))
        for _ in range(n):
            ln = int(rng.integers(1, 50))
            blocks.append((q, t, ln))
            q += ln + int(rng.integers(0, 15))
            t += ln + int(rng.integers(0, 15))
        read = rng.integers(0, 4, q + 60).astype(np.uint8)
        chrom = rng.integers(0, 4, t + 60).astype(np.uint8)
        for sm in (True, False):
            got = nat.op_arrays(np.asarray(blocks, np.int64), read,
                                chrom, sm)
            real = nat.op_arrays
            try:
                nat.op_arrays = lambda *a, **k: None
                want = blocks_to_op_arrays(blocks, read, chrom, sm)
            finally:
                nat.op_arrays = real
            assert np.array_equal(got[0], want[0])
            assert np.array_equal(got[1], want[1])


def test_score_ops_matches_python():
    """Native stats/NV == python score_op_arrays (value within float
    summation-order noise; every integer stat and the CIGAR exact)."""
    import lra_tpu.native as nat
    from lra_tpu.align import cigar as C

    if not nat.available():
        return
    rng = np.random.default_rng(9)
    fields = ("nm", "nmm", "nins", "tins", "ndel", "tdel",
              "n_small_del", "n_med_del", "n_large_del",
              "n_small_ins", "n_med_ins", "n_large_ins", "cigar")
    for trial in range(80):
        n = int(rng.integers(1, 200))
        codes = rng.integers(0, 4, n).astype(np.uint8)
        lens = rng.integers(1, 120000, n).astype(np.int64)
        for sm in (True, False):
            got = C.score_op_arrays(codes, lens, sm)
            real = nat.score_ops
            try:
                nat.score_ops = lambda *a, **k: None
                want = C.score_op_arrays(codes, lens, sm)
            finally:
                nat.score_ops = real
            for f in fields:
                assert getattr(got, f) == getattr(want, f), (trial, f)
            assert abs(got.value - want.value) <= \
                1e-6 * max(1.0, abs(want.value)), (trial, got.value,
                                                   want.value)


def test_match_lut_equivalence():
    """LUT-narrowed index search == plain binary search, including
    absent tuples and prefix-boundary keys."""
    import lra_tpu.native as nat

    if not nat.available():
        return
    rng = np.random.default_rng(21)
    k = 8            # small tuple space -> dense prefix buckets
    ni = 1 << 20     # exactly the LUT threshold
    it = np.sort(rng.integers(0, 1 << (2 * k), ni).astype(np.uint64))
    ip = rng.integers(0, 1 << 31, ni).astype(np.uint32)
    istr = rng.integers(0, 2, ni).astype(np.uint8)
    ifr = np.ones(ni, np.int32)
    nq = 4000
    qt = np.concatenate([
        rng.choice(it, nq // 2),
        rng.integers(0, 1 << (2 * k), nq // 2).astype(np.uint64)])
    qp = rng.integers(0, 10000, nq).astype(np.uint32)
    qs = rng.integers(0, 2, nq).astype(np.uint8)
    read_off = np.array([0, nq // 3, nq], np.int64)
    plain = nat.match_batch(qt, qp, qs, read_off, it, ip, istr, ifr, 6)
    lut = nat.match_lut_build(it, 2 * k)
    assert lut is not None
    fast = nat.match_batch(qt, qp, qs, read_off, it, ip, istr, ifr, 6,
                           lut=lut)
    for a, b in zip(plain, fast):
        assert np.array_equal(a, b)
