"""Double-buffered batch streaming: ordered, bit-identical output."""

import numpy as np

from lra_tpu import preset
from lra_tpu.index.global_index import build_global_index
from lra_tpu.io.genome import Genome
from lra_tpu.pipeline import align_reads
from lra_tpu.pipeline.stream import align_stream
from lra_tpu.sim import random_genome, sample_read


def test_stream_matches_sequential():
    rng = np.random.default_rng(21)
    g = random_genome(rng, 120000)
    genome = Genome.from_seqs([("chr1", g)])
    opts = preset("ccs")
    idx = build_global_index(genome, opts)
    reads = [(f"r{i}", sample_read(rng, g, 3000, snp=0.003).codes)
             for i in range(12)]
    batches = [reads[0:4], reads[4:8], reads[8:12]]

    seq_lines = []
    for b in batches:
        _, lines = align_reads(b, genome, idx, opts, use_device=True)
        seq_lines.extend(lines)

    par_lines = []
    for _, lines in align_stream(batches, genome, idx, opts,
                                 use_device=True, workers=2):
        par_lines.extend(lines)
    assert par_lines == seq_lines
