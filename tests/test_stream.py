"""Double-buffered batch streaming: ordered, bit-identical output.

Includes the race-detection analog of the reference's tsan build toggle
(reference: Makefile:19-27): the threaded executor is hammered with
randomized batch partitions and worker counts and must stay bit-identical
to sequential execution."""

import numpy as np
import pytest

from lra_tpu import preset
from lra_tpu.index.global_index import build_global_index
from lra_tpu.io.genome import Genome
from lra_tpu.pipeline import align_reads
from lra_tpu.pipeline.stream import align_stream
from lra_tpu.sim import random_genome, sample_read


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(21)
    g = random_genome(rng, 120000)
    genome = Genome.from_seqs([("chr1", g)])
    opts = preset("ccs")
    idx = build_global_index(genome, opts)
    reads = [(f"r{i}", sample_read(rng, g, 3000, snp=0.003).codes)
             for i in range(12)]
    seq_lines = []
    for b in (reads[0:4], reads[4:8], reads[8:12]):
        _, lines = align_reads(b, genome, idx, opts, use_device=True)
        seq_lines.extend(lines)
    return genome, idx, opts, reads, seq_lines


@pytest.mark.parametrize("workers", [2, 4])
def test_stream_matches_sequential(world, workers):
    genome, idx, opts, reads, seq_lines = world
    batches = [reads[0:4], reads[4:8], reads[8:12]]
    par_lines = []
    for _, lines in align_stream(batches, genome, idx, opts,
                                 use_device=True, workers=workers):
        par_lines.extend(lines)
    assert par_lines == seq_lines


def test_stream_race_stress(world):
    """Randomized partitions x worker counts, many seeds: output must be
    bit-identical to sequential every time (the tsan-toggle analog)."""
    genome, idx, opts, reads, seq_lines = world
    for seed in range(20):
        rng = np.random.default_rng(100 + seed)
        cuts = sorted(rng.choice(np.arange(1, len(reads)),
                                 size=int(rng.integers(1, 5)),
                                 replace=False).tolist())
        bounds = [0] + cuts + [len(reads)]
        batches = [reads[bounds[i]:bounds[i + 1]]
                   for i in range(len(bounds) - 1)]
        workers = int(rng.integers(2, 5))
        par_lines = []
        for _, lines in align_stream(batches, genome, idx, opts,
                                     use_device=True, workers=workers):
            par_lines.extend(lines)
        assert par_lines == seq_lines, \
            f"seed {seed}: batches {bounds} workers {workers}"


def test_stream_timing_pipelined(world):
    """Timing is thread-safe: --timing no longer forces sequential mode,
    and the pipelined run records every stage with sane totals."""
    from lra_tpu.utils.timing import Timing

    genome, idx, opts, reads, seq_lines = world
    batches = [reads[0:4], reads[4:8], reads[8:12]]
    tm = Timing()
    par_lines = []
    for _, lines in align_stream(batches, genome, idx, opts,
                                 use_device=True, workers=3, timing=tm):
        par_lines.extend(lines)
    assert par_lines == seq_lines
    assert tm.counts.get("gap-align (device)", 0) == len(batches)
    assert all(v >= 0.0 for v in tm.totals.values())
