"""Low-accuracy (CLR/ONT) path tests."""

import re

import numpy as np
import pytest

from lra_tpu import preset, seq as sequtils
from lra_tpu.index.global_index import build_global_index
from lra_tpu.index.local_index import build_genome_local_index
from lra_tpu.io.genome import Genome
from lra_tpu.pipeline import align_reads
from lra_tpu.sim import random_genome, sample_read


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(17)
    g = Genome.from_seqs([("chr1", random_genome(rng, 150000))])
    opts = preset("ont")
    idx = build_global_index(g, opts)
    gli = build_genome_local_index(g, max_freq=opts.local_max_freq)
    return rng, g, opts, idx, gli


def parse(line):
    f = line.split("\t")
    return dict(name=f[0], flag=int(f[1]), chrom=f[2], pos=int(f[3]),
                mapq=int(f[4]), cigar=f[5])


def spans(cig):
    return sum(int(x) for x, o in re.findall(r"(\d+)([=XM])", cig))


@pytest.mark.parametrize("use_device", [False, True])
def test_ont_noisy_reads(world, use_device):
    """ONT-like reads (7% error) map to the right locus via the low-acc
    path."""
    rng, g, opts, idx, gli = world
    reads, truths = [], []
    for i in range(5):
        r = sample_read(rng, g.codes, 6000, snp=0.03, ins=0.02, dele=0.02,
                        rev_prob=0.5)
        reads.append((f"o{i}", r.codes))
        truths.append(r)
    states, lines = align_reads(reads, g, idx, opts, use_device=use_device,
                                genome_li=gli)
    mapped = 0
    for line in lines:
        r = parse(line)
        if r["flag"] & 4 or r["flag"] & 0x100:
            continue
        tr = truths[int(r["name"][1:])]
        if abs(r["pos"] - 1 - tr.chrom_pos) < 2000:
            mapped += 1
            assert (r["flag"] & 0x10 == 0x10) == (tr.strand == 1)
    assert mapped >= 4, lines


def test_ont_without_local_index(world):
    """Path still functions (coarser) with no genome local index."""
    rng, g, opts, idx, gli = world
    r = sample_read(rng, g.codes, 6000, snp=0.02, ins=0.01, dele=0.01,
                    rev_prob=0.0)
    states, lines = align_reads([("x", r.codes)], g, idx, opts,
                                use_device=False)
    rec = parse(lines[0])
    if not rec["flag"] & 4:
        assert abs(rec["pos"] - 1 - r.chrom_pos) < 2000


def test_inversion_read_typed_segments(world):
    """Read with an inverted middle third produces >=2 segments and at
    least one reverse segment."""
    rng, g, opts, idx, gli = world
    from lra_tpu.sim import mutate
    base = 30000
    # noise keeps each part multi-anchor (a perfect read collapses to one
    # maximal anchor per part, which RemoveSpuriousSplitChain drops --
    # faithful to the reference's 2-anchor segment minimum)
    a = mutate(rng, g.codes[base:base + 4000], snp=0.02)
    b = sequtils.revcomp(mutate(rng, g.codes[base + 4000:base + 8000],
                                snp=0.02))
    c = mutate(rng, g.codes[base + 8000:base + 12000], snp=0.02)
    read = np.concatenate([a, b, c])
    states, lines = align_reads([("inv", read)], g, idx, opts,
                                use_device=False, genome_li=gli)
    recs = [parse(l) for l in lines]
    mapped = [r for r in recs if not r["flag"] & 4]
    assert len(mapped) >= 2
    strands = {r["flag"] & 0x10 for r in mapped}
    assert len(strands) == 2, mapped
