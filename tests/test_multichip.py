"""Data-parallel mesh execution of the real pipeline.

Runs the full align_reads pipeline with every batched kernel sharded
over an 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8) and requires bit-identical SAM
output vs the unsharded device path.
"""

import numpy as np
import pytest

import jax

from lra_tpu import preset
from lra_tpu.index.global_index import build_global_index
from lra_tpu.io.genome import Genome
from lra_tpu.parallel.mesh import make_mesh, use_mesh
from lra_tpu.pipeline import align_reads
from lra_tpu.sim import random_genome, sample_read


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(11)
    g = Genome.from_seqs([("chr1", random_genome(rng, 120000))])
    opts = preset("ccs")
    idx = build_global_index(g, opts)
    reads = []
    for i in range(12):
        r = sample_read(rng, g.codes, 5000, snp=0.004, ins=0.001,
                        dele=0.001)
        reads.append((f"r{i}", r.codes))
    return g, opts, idx, reads


def test_mesh_matches_single_device(world):
    g, opts, idx, reads = world
    assert len(jax.devices()) >= 8
    _, lines_single = align_reads(reads, g, idx, opts, use_device=True)
    with use_mesh(make_mesh(8)):
        _, lines_mesh = align_reads(reads, g, idx, opts, use_device=True)
    assert lines_mesh == lines_single
    assert sum(1 for ln in lines_mesh if "\t4\t" not in ln) >= 10


def test_mesh_context_resets(world):
    from lra_tpu.parallel.mesh import active_mesh

    assert active_mesh() is None
    with use_mesh(make_mesh(4)):
        assert active_mesh() is not None
    assert active_mesh() is None
