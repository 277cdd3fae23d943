import numpy as np
import pytest

from lra_tpu import preset, seq as sequtils
from lra_tpu.index.global_index import build_global_index
from lra_tpu.index.local_index import (build_genome_local_index,
                                       build_local_index)
from lra_tpu.io.genome import Genome
from lra_tpu.pipeline import align_reads
from lra_tpu.pipeline.refine import refine_clusters, refine_space
from lra_tpu.cluster.types import Cluster
from lra_tpu.sim import random_genome, sample_read


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(5)
    g = Genome.from_seqs([("chr1", random_genome(rng, 120000))])
    opts = preset("ccs")
    idx = build_global_index(g, opts)
    gli = build_genome_local_index(g, max_freq=opts.local_max_freq)
    return rng, g, opts, idx, gli


def test_local_index_roundtrip(world, tmp_path):
    rng, g, opts, idx, gli = world
    assert gli.nwindows() == (g.total_len + gli.window - 1) // gli.window
    p = tmp_path / "g.gli.npz"
    gli.save(str(p))
    from lra_tpu.index.local_index import LocalIndex
    gli2 = LocalIndex.load(str(p))
    assert np.array_equal(gli.tuples, gli2.tuples)
    assert np.array_equal(gli.tuple_bounds, gli2.tuple_bounds)
    # window lookup finds the right window
    wi = gli.lookup_window(1000)
    assert gli.seq_offsets[wi] <= 1000 < gli.seq_offsets[wi + 1]


def test_refine_clusters_densifies(world):
    """A sparse k=25 cluster over a noisy region gains many k=10 anchors."""
    rng, g, opts, idx, gli = world
    read = sample_read(rng, g.codes, 4000, snp=0.03, rev_prob=0.0)
    # build a deliberately sparse cluster: every 500bp one anchor
    q = np.arange(0, 3500, 500).astype(np.int64)
    t = q + read.chrom_pos
    c = Cluster(q, t, 0, idx.k, 1.0, 0)
    c.set_boundaries()
    rc = sequtils.revcomp(read.codes)
    refined = refine_clusters([c], g, gli, read.codes, rc, opts)
    assert len(refined) == 1
    assert len(refined[0]) > len(c) * 3
    d = refined[0].tpos - refined[0].qpos
    assert np.abs(d - read.chrom_pos).max() <= 200 + 100


def test_refine_space_small_box(world):
    """Small-box reseeding harvests anchors from a base-level alignment."""
    rng, g, opts, idx, gli = world
    qs, qe = 0, 400
    ts, te = 5000, 5400
    read = g.codes[5000:5400].copy()
    read[100] = (read[100] + 1) % 4
    qp, tp, ident = refine_space(10, 5, 100, g, g.codes, read, opts,
                                 qs, qe, ts, te)
    assert ident > 0.95
    assert len(qp) > 10
    assert np.array_equal(tp - qp, np.full(len(qp), 5000))


def test_end_refinement_reduces_clips(world):
    """With the local index, noisy read ends get reseeded: smaller clips."""
    rng, g, opts, idx, gli = world
    # ONT-like noise on a CCS pipeline with forced refinement
    read = sample_read(rng, g.codes, 5000, snp=0.02, ins=0.01, dele=0.01,
                       rev_prob=0.0)
    import dataclasses
    o2 = dataclasses.replace(opts, highly_accurate=False)
    _, lines_norefine = align_reads([("a", read.codes)], g, idx, opts,
                                    use_device=False)
    _, lines_refine = align_reads([("a", read.codes)], g, idx, o2,
                                  use_device=False, genome_li=gli)

    def clips(line):
        import re
        cig = line.split("\t")[5]
        ops = re.findall(r"(\d+)([SH])", cig)
        return sum(int(x) for x, _ in ops)

    def spans(line):
        import re
        cig = line.split("\t")[5]
        return sum(int(x) for x, o in re.findall(r"(\d+)([=XM])", cig))

    if lines_refine[0].split("\t")[1] != "4":
        assert spans(lines_refine[0]) > 0
        # refined run should align at least as many bases
        if lines_norefine[0].split("\t")[1] != "4":
            assert spans(lines_refine[0]) >= 0.9 * spans(lines_norefine[0])
