"""Degenerate inputs for the round-2 machinery: sharding, streaming,
shard merge, tiny-gap DP, windowed-kernel edges."""

import io

import numpy as np
import pytest

from lra_tpu import preset
from lra_tpu.chain import driver
from lra_tpu.chain.driver import (ChainProblem, best_chain,
                                  solve_problems)
from lra_tpu.ops.affine_small import solve_small_jobs
from lra_tpu.ops.gapcost import from_options
from lra_tpu.parallel.dist import init_process, merge_shards
from lra_tpu.pipeline.stream import align_stream


def tiny_problem(n):
    qS = np.arange(n, dtype=np.int64) * 100
    ln = np.full(n, 30, np.int64)
    tS = qS + 500
    return ChainProblem(qS, qS + ln, tS, tS + ln,
                        ln.astype(np.float32), np.ones(n, bool),
                        np.ones(n, bool), np.arange(n, dtype=np.int64), 0)


def test_shard_of_tiny_problem(monkeypatch):
    """SHARD_N smaller than every problem still works (1-fragment cores,
    empty halos)."""
    monkeypatch.setattr(driver, "SHARD_N", 2)
    monkeypatch.setattr(driver, "SHARD_HALO", 500)
    gp = from_options(preset("ccs"))
    p = tiny_problem(7)
    solve_problems([p], gp, use_device=True)
    assert best_chain(p) == list(range(6, -1, -1))


def test_shard_single_fragment(monkeypatch):
    monkeypatch.setattr(driver, "SHARD_N", 0)
    gp = from_options(preset("ccs"))
    p = tiny_problem(1)
    solve_problems([p], gp, use_device=True)
    assert best_chain(p) == [0]


def test_stream_empty_and_single():
    """align_stream over zero batches and a single batch."""
    rng = np.random.default_rng(3)
    from lra_tpu.index.global_index import build_global_index
    from lra_tpu.io.genome import Genome
    from lra_tpu.sim import random_genome, sample_read

    g = random_genome(rng, 50000)
    genome = Genome.from_seqs([("chr1", g)])
    opts = preset("ccs")
    idx = build_global_index(genome, opts)
    assert list(align_stream([], genome, idx, opts, workers=2)) == []
    reads = [("r0", sample_read(rng, g, 2000, snp=0.003).codes)]
    out = list(align_stream([reads], genome, idx, opts, workers=2))
    assert len(out) == 1 and len(out[0][1]) >= 1


def test_merge_single_shard(tmp_path):
    sam = "@HD\tVN:1.6\nr0\t0\tchr1\t1\t60\t4=\t*\t0\t0\tACGT\t*\n"
    (tmp_path / "s0").write_text(sam)
    buf = io.StringIO()
    n = merge_shards([str(tmp_path / "s0")], buf)
    assert n == 1
    assert buf.getvalue() == sam


def test_merge_uneven_shards(tmp_path):
    """3 reads over 2 shards interleave back to input order."""
    rec = "{}\t0\tchr1\t1\t60\t4=\t*\t0\t0\tACGT\t*\n"
    (tmp_path / "s0").write_text("@HD\tVN:1.6\n" + rec.format("r0")
                                 + rec.format("r2"))
    (tmp_path / "s1").write_text("@HD\tVN:1.6\n" + rec.format("r1"))
    buf = io.StringIO()
    n = merge_shards([str(tmp_path / "s0"), str(tmp_path / "s1")], buf)
    assert n == 3
    names = [ln.split("\t")[0] for ln in buf.getvalue().splitlines()
             if not ln.startswith("@")]
    assert names == ["r0", "r1", "r2"]


def test_init_process_validates():
    with pytest.raises(ValueError):
        init_process(2, 2, "-")
    start, stride, out = init_process(4, 1, "x.sam")
    assert (start, stride, out) == (1, 4, "x.sam.shard1")


def test_small_dp_single_base():
    out = solve_small_jobs([np.array([1], np.int8)],
                           [np.array([1], np.int8)], 4, -3, -4)
    assert out == [[(0, 0, 1)]]
    out = solve_small_jobs([np.array([1], np.int8)],
                           [np.array([2], np.int8)], 4, -3, -4)
    # single mismatch still aligns diagonally (ins+del would cost -8)
    assert out == [[(0, 0, 1)]]


def test_small_dp_pure_indel():
    # q is t plus one inserted base; one block on each side of the gap
    t = np.array([0, 1, 2, 3, 0, 1], np.int8)
    q = np.concatenate([t[:3], [3], t[3:]]).astype(np.int8)
    out = solve_small_jobs([q], [t], 4, -3, -4, kbands=[4])
    blocks = out[0]
    assert sum(b[2] for b in blocks) == len(t)
