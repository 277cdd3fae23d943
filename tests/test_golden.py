"""Golden comparison against the compiled reference lra binary.

Builds ChaissonLab/lra from /root/reference using the clean-room htslib
stubs (tools/htslib_stub) and compares both aligners on shared simulated
reads: placements must agree and CIGAR-level error counts must be close.
Skipped when the reference source or a compiler is unavailable.
"""

import os
import re
import subprocess

import numpy as np
import pytest

from lra_tpu import preset, seq as sequtils
from lra_tpu.index.global_index import build_global_index
from lra_tpu.io.genome import Genome
from lra_tpu.pipeline import align_reads
from lra_tpu.sim import random_genome, sample_read

REF_SRC = "/root/reference/lra.cpp"
STUB = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "htslib_stub")


@pytest.fixture(scope="module")
def ref_bin(tmp_path_factory):
    if not os.path.exists(REF_SRC):
        pytest.skip("reference source unavailable")
    d = tmp_path_factory.mktemp("refbin")
    out = d / "lra"
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++14", "-DNDEBUG", "-I", STUB,
             REF_SRC, "-o", str(out), "-lz", "-lpthread"],
            check=True, capture_output=True, timeout=420)
    except Exception as e:
        pytest.skip(f"reference build failed: {e}")
    return str(out)


def test_placement_agreement_ccs(ref_bin, tmp_path):
    rng = np.random.default_rng(55)
    g = random_genome(rng, 300000)
    genome = Genome.from_seqs([("chr1", g)])
    (tmp_path / "ref.fa").write_text(">chr1\n" + sequtils.decode(g) + "\n")
    reads = []
    with open(tmp_path / "reads.fa", "w") as f:
        for i in range(24):
            r = sample_read(rng, g, 6000, snp=0.003, ins=0.001, dele=0.001)
            f.write(f">r{i}\n" + sequtils.decode(r.codes) + "\n")
            reads.append((f"r{i}", r.codes))

    subprocess.run([ref_bin, "index", "-CCS", "ref.fa"], cwd=tmp_path,
                   check=True, capture_output=True, timeout=300)
    out = subprocess.run(
        [ref_bin, "align", "-CCS", "ref.fa", "reads.fa", "-t", "1",
         "-p", "s"],
        cwd=tmp_path, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-500:]
    ref_rows = {}
    for ln in out.stdout.splitlines():
        if ln.startswith("@") or not ln.strip():
            continue
        f = ln.split("\t")
        if f[1] in ("0", "16"):
            ref_rows[f[0]] = (int(f[3]) - 1, f[1], f[5])
    assert len(ref_rows) >= 22

    opts = preset("ccs")
    idx = build_global_index(genome, opts)
    states, lines = align_reads(reads, genome, idx, opts,
                                use_device=False)
    ours = {}
    for ln in lines:
        f = ln.split("\t")
        if len(f) > 5 and f[1] in ("0", "16"):
            ours[f[0]] = (int(f[3]) - 1, f[1], f[5])

    def cig_err(cig):
        err = 0
        for num, op in re.findall(r"(\d+)([MIDX=SH])", cig):
            if op in "IDX":
                err += int(num)
        return err

    agree = 0
    for name, (rpos, rflag, rcig) in ref_rows.items():
        if name not in ours:
            continue
        opos, oflag, ocig = ours[name]
        if oflag == rflag and abs(opos - rpos) <= 50:
            agree += 1
            # CIGAR error mass within 2x + 20 bases of each other
            assert abs(cig_err(ocig) - cig_err(rcig)) <= \
                max(20, 1.0 * max(cig_err(rcig), cig_err(ocig))), \
                (name, ocig[:80], rcig[:80])
    assert agree >= 0.9 * len(ref_rows), (agree, len(ref_rows))
