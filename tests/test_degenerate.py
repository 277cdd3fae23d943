"""Degenerate-input robustness: no crashes, sensible outcomes."""

import numpy as np
import pytest

from lra_tpu import preset
from lra_tpu.index.global_index import build_global_index
from lra_tpu.io.genome import Genome
from lra_tpu.pipeline import align_reads
from lra_tpu.sim import random_genome


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(0)
    g = Genome.from_seqs([("c1", random_genome(rng, 50000)),
                          ("c2", random_genome(rng, 30000))])
    opts = preset("ccs")
    idx = build_global_index(g, opts)
    return g, opts, idx


@pytest.mark.parametrize("name,mk", [
    ("all_N", lambda g: np.full(5000, 4, np.uint8)),
    ("tiny", lambda g: np.array(g.codes[100:120])),
    ("shorter_than_k", lambda g: np.array(g.codes[100:110])),
    ("empty", lambda g: np.zeros(0, np.uint8)),
    ("homopolymer", lambda g: np.zeros(3000, np.uint8)),
    ("n_runs", lambda g: np.concatenate([
        g.codes[1000:2000], np.full(500, 4, np.uint8), g.codes[2500:3500]])),
])
def test_no_crash(world, name, mk):
    g, opts, idx = world
    states, lines = align_reads([(name, mk(g))], g, idx, opts,
                                use_device=False)
    assert len(lines) >= 1        # mapped or an unmapped record


def test_cross_chromosome_boundary_read(world):
    """A read contiguous across the c1/c2 junction of the concatenated
    coordinate space must split into per-chromosome segments (clusters
    split at chromosome boundaries instead of being dropped whole)."""
    g, opts, idx = world
    codes = np.array(g.codes[48000:52000])
    states, _ = align_reads([("xb", codes)], g, idx, opts,
                            use_device=False)
    st = states[0]
    assert not st.unaligned
    chroms = {sg.chrom for gr in st.groups for sg in gr.segments}
    assert chroms == {0, 1}


def test_empty_genome(world):
    _, opts, _ = world
    ge = Genome.from_seqs([("e", np.zeros(0, np.uint8))])
    idxe = build_global_index(ge, opts)
    g, _, _ = world
    states, lines = align_reads([("r", np.array(g.codes[100:2000]))],
                                ge, idxe, opts, use_device=False)
    assert states[0].unaligned
