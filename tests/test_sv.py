import io

import numpy as np

from lra_tpu import preset, seq as sequtils
from lra_tpu.index.global_index import build_global_index
from lra_tpu.io.genome import Genome
from lra_tpu.pipeline import align_reads
from lra_tpu.sim import random_genome
from lra_tpu.sv import calls_from_sam, merge_haplotypes, sam_to_vcf, SVCall


def test_contig_sv_calls(rng, tmp_path):
    """Contig with a 400bp DEL and 250bp INS -> two correct VCF records."""
    g = Genome.from_seqs([("chr1", random_genome(rng, 150000))])
    opts = preset("contig")
    idx = build_global_index(g, opts)
    pos = 30000
    contig = np.concatenate([
        g.codes[pos:pos + 15000],
        g.codes[pos + 15400:pos + 30000],             # 400bp DEL
        rng.integers(0, 4, 250).astype(np.uint8),     # 250bp INS
        g.codes[pos + 30000:pos + 45000],
    ])
    _, lines = align_reads([("hap1", contig)], g, idx, opts,
                           use_device=False)
    sam = tmp_path / "c.sam"
    sam.write_text("\n".join(lines) + "\n")
    out = io.StringIO()
    n = sam_to_vcf(str(sam), g, out, min_length=25)
    assert n == 2, out.getvalue()
    recs = [l.split("\t") for l in out.getvalue().splitlines()
            if not l.startswith("#")]
    dels = [r for r in recs if "SVTYPE=DEL" in r[7]]
    inss = [r for r in recs if "SVTYPE=INS" in r[7]]
    assert len(dels) == 1 and len(inss) == 1
    assert abs(int(dels[0][1]) - (pos + 15000)) < 50
    assert "SVLEN=-400" in dels[0][7]
    assert "SVLEN=250" in inss[0][7]


def test_merge_haplotypes():
    a = [SVCall("chr1", 1000, "A", "A" * 101, "INS", 100, "h1", 1, "+"),
         SVCall("chr1", 5000, "A" * 51, "A", "DEL", -50, "h1", 1, "+")]
    b = [SVCall("chr1", 1020, "A", "A" * 99, "INS", 98, "h2", 1, "+"),
         SVCall("chr2", 100, "A", "A" * 31, "INS", 30, "h2", 1, "+")]
    merged = merge_haplotypes(a, b)
    assert len(merged) == 3
    hom = [c for c in merged if c.gt == "1/1"]
    het = [c for c in merged if c.gt == "0/1"]
    assert len(hom) == 1 and hom[0].pos == 1000
    assert len(het) == 2
