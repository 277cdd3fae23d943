"""Mapping accuracy regression: simulated reads with known truth must
place correctly across all read-type presets (position within 100bp of
the true span start, true strand among the emitted segments)."""

import numpy as np
import pytest

from lra_tpu import preset
from lra_tpu.index.global_index import build_global_index
from lra_tpu.index.local_index import build_genome_local_index
from lra_tpu.io.genome import Genome
from lra_tpu.pipeline import align_reads
from lra_tpu.sim import random_genome, sample_read


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(42)
    return Genome.from_seqs([("chr1", random_genome(rng, 600000))])


@pytest.mark.parametrize("pre,n,ln,err,min_ok", [
    ("ccs", 30, 6000, (0.003, 0.001, 0.001), 1.00),
    ("ont", 20, 9000, (0.03, 0.01, 0.01), 0.95),
    ("clr", 20, 8000, (0.08, 0.04, 0.04), 0.80),
])
def test_mapping_accuracy(genome, pre, n, ln, err, min_ok):
    rng = np.random.default_rng(7)
    opts = preset(pre)
    idx = build_global_index(genome, opts)
    li = build_genome_local_index(genome, k=min(opts.local_k, 10),
                                  w=opts.local_w,
                                  window=opts.local_index_window,
                                  max_freq=opts.local_max_freq)
    reads, truth = [], []
    for i in range(n):
        r = sample_read(rng, genome.codes, ln, snp=err[0], ins=err[1],
                        dele=err[2])
        reads.append((f"r{i}", r.codes))
        truth.append(r)
    states, _ = align_reads(reads, genome, idx, opts, use_device=True,
                            genome_li=li)
    ok = 0
    for st, tr in zip(states, truth):
        if st.unaligned or not st.groups:
            continue
        pos = min(sg.tStart for sg in st.groups[0].segments)
        strands = set(sg.strand for sg in st.groups[0].segments)
        if abs(pos - tr.chrom_pos) <= 100 and tr.strand in strands:
            ok += 1
    assert ok >= min_ok * n, f"{pre}: {ok}/{n} correct"


def test_repeat_rich_genome_accuracy():
    """Repeat-rich genome (LINE/SINE-like interspersed repeats + tandem
    satellite arrays): placement must stay correct — exercises the
    frequency caps, per-window thinning, and anchorfreq machinery that a
    uniform random genome never touches."""
    from lra_tpu.sim import mutate

    rng = np.random.default_rng(33)
    parts = []
    line_elem = random_genome(rng, 6000)
    alu_elem = random_genome(rng, 300)
    tandem_unit = random_genome(rng, 171)
    total = 0
    while total < 400_000:
        u = random_genome(rng, int(rng.integers(2000, 20000)))
        parts.append(u)
        total += len(u)
        r = rng.random()
        if r < 0.35:
            e = mutate(rng, line_elem if rng.random() < 0.3 else alu_elem,
                       snp=0.1)
            parts.append(e)
            total += len(e)
        elif r < 0.45:
            n = int(rng.integers(5, 40))
            t = np.concatenate([mutate(rng, tandem_unit, snp=0.03)
                                for _ in range(n)])
            parts.append(t)
            total += len(t)
    g = Genome.from_seqs([("chr1", np.concatenate(parts))])
    opts = preset("ccs")
    idx = build_global_index(g, opts)
    reads, truth = [], []
    for i in range(16):
        r = sample_read(rng, g.codes, 6000, snp=0.003, ins=0.001,
                        dele=0.001)
        reads.append((f"r{i}", r.codes))
        truth.append(r)
    states, _ = align_reads(reads, g, idx, opts, use_device=True)
    ok = 0
    for st, tr in zip(states, truth):
        if st.unaligned or not st.groups:
            continue
        pos = min(sg.tStart for sg in st.groups[0].segments)
        if abs(pos - tr.chrom_pos) <= 200:
            ok += 1
    assert ok >= 15, ok
