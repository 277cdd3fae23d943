import numpy as np

from lra_tpu import preset, seq as sequtils
from lra_tpu.anchors import find_matches
from lra_tpu.cluster.clean import clean_off_diagonal, diagonal_sort
from lra_tpu.cluster.fine import (clean_matches_to_clusters,
                                  matches_to_fine_clusters)
from lra_tpu.index.global_index import build_global_index
from lra_tpu.io.genome import Genome
from lra_tpu.sim import random_genome, sample_read


def setup(rng, n=80000):
    g = Genome.from_seqs([("chr1", random_genome(rng, n))])
    opts = preset("ccs")
    idx = build_global_index(g, opts)
    return g, opts, idx


def test_clean_keeps_diagonal_noise_removed(rng):
    opts = preset("ccs")
    # a clean diagonal run + isolated off-diagonal noise
    qd = np.arange(0, 3000, 25)
    td = qd + 10000
    qn = rng.integers(0, 3000, 40)
    tn = rng.integers(100000, 900000, 40)
    qpos = np.concatenate([qd, qn])
    tpos = np.concatenate([td, tn])
    order = diagonal_sort(qpos, tpos, 0)
    keep, run_id, freq = clean_off_diagonal(qpos[order], tpos[order], opts, 0)
    kept_t = tpos[order][keep]
    # the diagonal run survives; vast majority of noise does not
    assert (np.abs(kept_t - (qpos[order][keep] + 10000)) < 200).mean() > 0.9
    assert len(keep) >= len(qd) * 0.9


def test_fine_clusters_single_locus(rng):
    g, opts, idx = setup(rng)
    read = sample_read(rng, g.codes, 6000, snp=0.002, rev_prob=0.0)
    fwd, rev = find_matches(read.codes, idx, opts)
    clusters = matches_to_fine_clusters(fwd.qpos, fwd.tpos, opts, g, idx.k, 0)
    assert len(clusters) >= 1
    main = max(clusters, key=len)
    assert abs(main.tStart - main.qStart - read.chrom_pos) < 100
    assert main.strand == 0
    assert main.chrom == 0
    # matches inside the cluster are cartesian-ordered
    assert (np.diff(main.qpos) >= 0).all()


def test_fine_clusters_reverse_read(rng):
    g, opts, idx = setup(rng)
    read = sample_read(rng, g.codes, 6000, snp=0.002, rev_prob=1.0)
    fwd, rev = find_matches(read.codes, idx, opts)
    clusters = matches_to_fine_clusters(rev.qpos, rev.tpos, opts, g, idx.k, 1)
    assert len(clusters) >= 1
    main = max(clusters, key=len)
    assert main.strand == 1
    # anti-diagonal: q+t roughly constant
    anti = main.qpos + main.tpos
    assert np.percentile(anti, 90) - np.percentile(anti, 10) < 200


def test_lowacc_clean_matches(rng):
    g, opts_ccs, idx_ccs = setup(rng)
    opts = preset("ont")
    # reuse the ccs index (k differs but mechanics are identical)
    read = sample_read(rng, g.codes, 6000, snp=0.02, ins=0.02, dele=0.02,
                       rev_prob=0.0)
    fwd, rev = find_matches(read.codes, idx_ccs, opts_ccs)
    if len(fwd) < 10:
        return  # too noisy for this k; matcher tested elsewhere
    clusters = clean_matches_to_clusters(fwd.qpos, fwd.tpos, opts, g,
                                         idx_ccs.k, 0)
    assert len(clusters) >= 1
    main = max(clusters, key=len)
    assert abs(main.tStart - main.qStart - read.chrom_pos) < 1500


def test_split_read_two_loci(rng):
    """A read stitched from two distant genome segments yields (at least)
    two fine clusters at the right places."""
    g, opts, idx = setup(rng)
    a = g.codes[10000:13000]
    b = g.codes[50000:53000]
    read = np.concatenate([a, b])
    fwd, rev = find_matches(read, idx, opts)
    clusters = matches_to_fine_clusters(fwd.qpos, fwd.tpos, opts, g, idx.k, 0)
    assert len(clusters) >= 2
    diags = sorted(int(c.tStart) - int(c.qStart) for c in clusters
                   if len(c) > 20)
    assert any(abs(d - 10000) < 100 for d in diags)
    assert any(abs(d - 47000) < 100 for d in diags)
