import numpy as np

from lra_tpu import preset, seq as sequtils
from lra_tpu.anchors import find_matches
from lra_tpu.index.global_index import build_global_index
from lra_tpu.io.genome import Genome
from lra_tpu.sim import random_genome, sample_read


def make_genome(rng, n=20000, nchrom=2):
    seqs = [("chr%d" % i, random_genome(rng, n // nchrom)) for i in range(nchrom)]
    return Genome.from_seqs(seqs)


def test_index_build_and_freq_filter(rng):
    g = make_genome(rng)
    opts = preset("ccs")
    opts.global_winsize = 16
    opts.num_minimizers_per_window = 5
    idx = build_global_index(g, opts)
    assert len(idx) > 0
    # sorted by tuple
    assert (np.diff(idx.tuples.astype(np.uint64).view(np.uint64)) >= 0).all()
    # freq filter: no tuple multiplicity above cap
    _, counts = np.unique(idx.tuples, return_counts=True)
    assert counts.max() <= opts.global_max_freq
    # thinning: no genome window holds more than the cap
    wins = idx.pos // opts.global_winsize
    assert np.bincount(wins).max() <= opts.num_minimizers_per_window


def test_perfect_read_matches_forward(rng):
    g = make_genome(rng, n=40000, nchrom=1)
    opts = preset("ccs")
    idx = build_global_index(g, opts)
    read = sample_read(rng, g.codes, 3000, rev_prob=0.0)
    fwd, rev = find_matches(read.codes, idx, opts)
    assert len(fwd) > 10
    # all forward matches of a perfect read lie on one diagonal
    diag = fwd.tpos - fwd.qpos
    best = np.bincount((diag - diag.min()).astype(np.int64)).argmax() + diag.min()
    on = (diag == best).mean()
    assert on > 0.95
    assert best == read.chrom_pos


def test_perfect_read_matches_reverse(rng):
    g = make_genome(rng, n=40000, nchrom=1)
    opts = preset("ccs")
    idx = build_global_index(g, opts)
    read = sample_read(rng, g.codes, 3000, rev_prob=1.0)
    fwd, rev = find_matches(read.codes, idx, opts)
    assert len(rev) > 10
    assert len(rev) > len(fwd)
    # reverse matches of a perfect read lie on one anti-diagonal:
    # qpos + tpos ~ const
    anti = rev.qpos + rev.tpos
    spread = np.percentile(anti, 90) - np.percentile(anti, 10)
    assert spread < 10


def test_noisy_read_still_anchors(rng):
    g = make_genome(rng, n=60000, nchrom=1)
    opts = preset("ccs")
    idx = build_global_index(g, opts)
    read = sample_read(rng, g.codes, 5000, snp=0.002, ins=0.002, dele=0.002,
                       rev_prob=0.0)
    fwd, rev = find_matches(read.codes, idx, opts)
    assert len(fwd) > 5


def test_partitioned_build_bit_identical(rng, monkeypatch):
    """The memory-bounded tuple-partitioned build path (used above
    _PARTITION_THRESHOLD_BP, VERDICT r3 item 6) must produce a
    bit-identical index to the direct path, incl. multi-chromosome
    offsets, the frequency filter, and window thinning."""
    from lra_tpu.index import global_index as gi

    g = make_genome(rng, n=120000, nchrom=3)
    # salt repeats so the frequency filter and thinning both engage
    unit = g.codes[500:900].copy()
    for i in range(20):
        p = 2000 + i * 3000
        g.codes[p:p + 400] = unit
    opts = preset("ccs")
    direct = gi.build_global_index(g, opts)
    monkeypatch.setattr(gi, "_PARTITION_THRESHOLD_BP", 1000)
    monkeypatch.setattr(gi, "_THIN_CHUNK_THRESHOLD", 500)
    part = gi.build_global_index(g, opts)
    assert part.k == direct.k
    np.testing.assert_array_equal(part.tuples, direct.tuples)
    np.testing.assert_array_equal(part.pos, direct.pos)
    np.testing.assert_array_equal(part.strand, direct.strand)
    np.testing.assert_array_equal(part.freqs, direct.freqs)
    # and threaded partitioned build stays identical too
    part2 = gi.build_global_index(g, opts, threads=3)
    np.testing.assert_array_equal(part2.tuples, direct.tuples)
    np.testing.assert_array_equal(part2.pos, direct.pos)


def test_window_thin_chunked_skewed_terminates(rng, monkeypatch):
    """Chunked _window_thin on skewed survivor distributions (all
    survivors flush against the top of the window range) must terminate
    and match the direct path — the un-rebased chunk ranges used to
    recurse forever on this shape (advisor r4 medium #1)."""
    from lra_tpu.index import global_index as gi

    opts = preset("ccs")
    w = opts.global_winsize
    # 2000 survivors all inside the LAST two windows of a wide range:
    # window 0 holds one survivor (pins minwin low), the rest sit at the
    # top so every un-rebased split put them all in the final chunk
    pos = np.concatenate([
        np.asarray([3], np.uint32),
        (rng.integers(998 * w, 1000 * w, 1999)).astype(np.uint32)])
    freq = rng.integers(1, 6, len(pos)).astype(np.int32)
    pos1 = np.full(500, 5 * w + 2, np.uint32)
    freq1 = rng.integers(1, 6, 500).astype(np.int32)
    direct = gi._window_thin(pos, freq, opts)
    direct1 = gi._window_thin(pos1, freq1, opts)
    monkeypatch.setattr(gi, "_THIN_CHUNK_THRESHOLD", 100)
    np.testing.assert_array_equal(gi._window_thin(pos, freq, opts), direct)
    # single-window pile bigger than the threshold: falls through to the
    # direct path (span 1 cannot be split) instead of recursing
    np.testing.assert_array_equal(gi._window_thin(pos1, freq1, opts),
                                  direct1)
