"""CLI end-to-end: formats, sharding, qual passthrough."""

import os

import numpy as np
import pytest

from lra_tpu import seq as sequtils
from lra_tpu.cli import main
from lra_tpu.io.genome import Genome
from lra_tpu.sim import random_genome, sample_read


@pytest.fixture(scope="module")
def refdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cliworld")
    rng = np.random.default_rng(4)
    g = random_genome(rng, 60000)
    (d / "ref.fa").write_text(">c1\n" + sequtils.decode(g) + "\n")
    recs = []
    for i in range(6):
        r = sample_read(rng, g, 3000, snp=0.004, ins=0.001, dele=0.001)
        recs.append((f"rd{i}", sequtils.decode(r.codes)))
    fq = []
    for name, seq in recs:
        fq.append(f"@{name}\n{seq}\n+\n{'I' * len(seq)}")
    (d / "reads.fq").write_text("\n".join(fq) + "\n")
    main(["index", str(d / "ref.fa"), "-CCS"])
    return d, recs


def _records(path):
    return [ln.split("\t") for ln in open(path)
            if ln.strip() and not ln.startswith("@")]


def test_fastq_quals_preserved(refdir):
    d, recs = refdir
    out = d / "out.sam"
    main(["align", str(d / "ref.fa"), str(d / "reads.fq"), "-CCS",
          "--cpu", "-o", str(out)])
    rows = _records(out)
    assert len(rows) >= 6
    for f in rows:
        if f[1] in ("0", "16"):
            assert set(f[10]) == {"I"}, f[10][:20]


def test_stride_sharding_partitions(refdir):
    d, recs = refdir
    outs = []
    for start in (0, 1):
        out = d / f"shard{start}.sam"
        main(["align", str(d / "ref.fa"), str(d / "reads.fq"), "-CCS",
              "--cpu", "--stride", "2", "--start", str(start),
              "-o", str(out)])
        outs.append({f[0] for f in _records(out)})
    assert outs[0] | outs[1] == {name for name, _ in recs}
    assert not outs[0] & outs[1]


def test_sam_input_passthrough(refdir):
    d, recs = refdir
    # write a SAM as input with an aux tag; align with --passthrough
    sam_in = d / "in.sam"
    lines = ["@HD\tVN:1.6"]
    for name, seq in recs[:3]:
        lines.append(f"{name}\t4\t*\t0\t0\t*\t*\t0\t0\t{seq}\t*\tXZ:Z:hello")
    sam_in.write_text("\n".join(lines) + "\n")
    out = d / "pt.sam"
    main(["align", str(d / "ref.fa"), str(sam_in), "-CCS", "--cpu",
          "--passthrough", "-o", str(out)])
    rows = _records(out)
    assert len(rows) >= 3
    assert any("XZ:Z:hello" in "\t".join(f) for f in rows)
