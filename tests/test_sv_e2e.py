"""End-to-end SV pipeline: simulated assembly contigs with known SVs ->
CONTIG alignment -> VCF calls must recover the truth set (the reference's
headline use case: call_assembly_SVs/ + Truvari F1)."""

import io

import numpy as np

from lra_tpu import preset
from lra_tpu.index.global_index import build_global_index
from lra_tpu.io.genome import Genome
from lra_tpu.io.sam import sam_header
from lra_tpu.pipeline import align_reads
from lra_tpu.sim import random_genome
from lra_tpu.sv import sam_to_vcf


def test_sv_f1(tmp_path):
    rng = np.random.default_rng(17)
    G = 800_000
    genome = Genome.from_seqs([("chr1", random_genome(rng, G))])
    opts = preset("contig")
    idx = build_global_index(genome, opts)

    truth = []
    p = 60000
    while p < G - 80000 and len(truth) < 10:
        ln = int(rng.integers(50, 1200))
        ty = "DEL" if rng.random() < 0.5 else "INS"
        truth.append((p, ty, ln))
        p += int(rng.integers(40000, 90000))

    contigs = []
    tile = 300000
    for cstart in range(0, G - tile, tile - 20000):
        span = np.array(genome.codes[cstart:cstart + tile])
        inside = [tv for tv in truth
                  if cstart + 1000 < tv[0] < cstart + tile - 3000]
        for (pp, ty, ln) in sorted(inside, reverse=True):
            off = pp - cstart
            if ty == "DEL":
                span = np.concatenate([span[:off], span[off + ln:]])
            else:
                ins = rng.integers(0, 4, ln).astype(np.uint8)
                span = np.concatenate([span[:off], ins, span[off:]])
        for q in rng.integers(0, len(span), len(span) // 2000):
            span[q] = (span[q] + 1) % 4
        contigs.append((f"ctg{cstart}", span))

    states, lines = align_reads(contigs, genome, idx, opts,
                                use_device=False)
    sam = tmp_path / "ctg.sam"
    sam.write_text(sam_header(genome) + "\n".join(lines) + "\n")
    out = io.StringIO()
    sam_to_vcf(str(sam), genome, out, min_length=40)
    calls = []
    for line in out.getvalue().splitlines():
        if line.startswith("#"):
            continue
        f = line.split("\t")
        info = dict(kv.split("=") for kv in f[7].split(";") if "=" in kv)
        calls.append((int(f[1]), info["SVTYPE"], abs(int(info["SVLEN"]))))

    tp = 0
    used = [False] * len(calls)
    for (pp, ty, ln) in truth:
        for i, (cp, cty, cln) in enumerate(calls):
            if used[i] or cty != ty:
                continue
            if abs(cp - pp) <= 100 and abs(cln - ln) <= max(20, 0.2 * ln):
                used[i] = True
                tp += 1
                break
    fp = used.count(False)
    assert tp >= 0.9 * len(truth), (tp, len(truth), calls)
    assert fp <= 0.2 * max(1, len(calls)), (fp, calls)
