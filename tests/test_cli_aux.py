"""CLI auxiliary surfaces: qti harness, --timing report, -d dotplot dump
flags all drive end to end (reference: QueryTime.cpp, Timing.h:56,
MapRead.h:193)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from lra_tpu import seq as sequtils
from lra_tpu.sim import random_genome, sample_read

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = tmp_path_factory.mktemp("cliaux")
    rng = np.random.default_rng(19)
    g = random_genome(rng, 60000)
    (d / "ref.fa").write_text(">chr1\n" + sequtils.decode(g) + "\n")
    with open(d / "reads.fa", "w") as f:
        for i in range(4):
            r = sample_read(rng, g, 2500, snp=0.003)
            f.write(f">r{i}\n" + sequtils.decode(r.codes) + "\n")
    return d


def _run(d, *args):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "lra_tpu.cli", *args],
        cwd=d, env=env, capture_output=True, text=True, timeout=600)


def test_qti(world):
    out = _run(world, "qti", "-CCS", "ref.fa", "reads.fa", "--cpu")
    assert out.returncode == 0, out.stderr[-400:]
    assert "reads/s" in out.stderr


def test_timing_report(world):
    out = _run(world, "align", "-CCS", "ref.fa", "reads.fa", "--cpu",
               "--timing", "t.tsv", "-o", "o.sam")
    assert out.returncode == 0, out.stderr[-400:]
    report = (world / "t.tsv").read_text()
    assert "TOTAL" in report
    assert "SDP-1 (device)" in report


def test_dotplot_dump(world):
    out = _run(world, "align", "-CCS", "ref.fa", "reads.fa", "--cpu",
               "-d", "dots", "--readname", "r1", "-o", "o2.sam")
    assert out.returncode == 0, out.stderr[-400:]
    dots = world / "dots"
    assert (dots / "all-matches.dots").exists()
    rows = (dots / "all-matches.dots").read_text().strip().splitlines()
    assert len(rows) > 5 and len(rows[0].split("\t")) >= 4
