import dataclasses
import re

import numpy as np

from lra_tpu import preset
from lra_tpu.index.global_index import build_global_index
from lra_tpu.io.genome import Genome
from lra_tpu.pipeline import align_reads
from lra_tpu.sim import mutate, random_genome


def test_big_gap_third_sdp(rng):
    """A 900bp 12%-diverged stretch between clean flanks: no k=25 anchors
    inside, gap >=300 triggers the reseed + forward-only SDP, and the
    middle aligns as matches/mismatches rather than one huge indel pair."""
    g = Genome.from_seqs([("chr1", random_genome(rng, 120000))])
    opts = preset("ccs")
    idx = build_global_index(g, opts)
    pos = 40000
    a = g.codes[pos:pos + 3000]
    mid = mutate(rng, g.codes[pos + 3000:pos + 3900], snp=0.12)
    c = g.codes[pos + 3900:pos + 6900]
    read = np.concatenate([a, mid, c])

    def run(o):
        _, lines = align_reads([("bg", read)], g, idx, o, use_device=False)
        return lines[0].split("\t")

    f = run(opts)
    assert not int(f[1]) & 4
    cig = f[5]
    # aligned span covers nearly the whole read
    aligned = sum(int(x) for x, o in re.findall(r"(\d+)([=XM])", cig)
                  if o in "=XM")
    assert aligned > 0.95 * len(read), (aligned, len(read))
    # the diverged middle shows up as mismatches, not a paired indel
    big_indels = [int(x) for x, o in re.findall(r"(\d+)([ID])", cig)
                  if int(x) > 500]
    assert not big_indels, cig[:200]
    nx = sum(int(x) for x, o in re.findall(r"(\d+)(X)", cig))
    assert nx > 50   # the SNPs in the middle are visible
