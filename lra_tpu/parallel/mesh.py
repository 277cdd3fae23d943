"""Multi-chip execution: device mesh + sharded kernel steps.

The aligner's scale-out story (SURVEY.md §5): reads are embarrassingly
parallel, so the batch axis shards data-parallel over the mesh ('dp');
the minimizer index and genome are replicated per host.  Within a chip,
problems are padded to bucket shapes.  A single huge contig can
additionally be split over a sequence axis by read-coordinate ranges with
halo overlap and stitched via split-chain logic — that axis ('sp') is
declared here and currently used to co-shard independent problem groups.

The combined step below is what dryrun_multichip compiles: both hot
kernels (chaining SDP + banded gap alignment) under one jit with explicit
NamedShardings, so XLA lays out all collectives at compile time.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.gapcost import GapParams
from ..ops.sdp_blocked import chain_scores_blocked
from ..ops.affine_kernel import banded_global_kernel


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("dp",))


# ---- active mesh: the pipeline's kernel drivers consult this ----
_ACTIVE: list = [None]


def active_mesh() -> Mesh | None:
    return _ACTIVE[0]


class use_mesh:
    """Context manager: run the alignment pipeline with every batched
    kernel's problem axis sharded data-parallel over the mesh.  The
    genome/index stay replicated (host memory); only [B, ...] kernel
    batches are device_put with a 'dp' NamedSharding.

        with use_mesh(make_mesh()):
            align_reads(reads, genome, idx, opts)
    """

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __enter__(self):
        _ACTIVE[0] = self.mesh
        return self.mesh

    def __exit__(self, *exc):
        _ACTIVE[0] = None
        return False


def batch_multiple(b: int) -> int:
    """Round a batch size up so the 'dp' axis divides it."""
    mesh = _ACTIVE[0]
    if mesh is None:
        return b
    n = mesh.devices.size
    return ((b + n - 1) // n) * n


def place(a):
    """jnp.asarray, sharded over 'dp' on axis 0 when a mesh is active."""
    mesh = _ACTIVE[0]
    if mesh is None:
        return jnp.asarray(a)
    spec = P("dp", *([None] * (np.ndim(a) - 1)))
    return jax.device_put(a, NamedSharding(mesh, spec))


def place_many(*arrays):
    """place() for several arrays in ONE jax.device_put call — the
    batched transfer path costs one dispatch instead of len(arrays)
    (a bucket dispatch site moves 5-17 small arrays; per-call overhead
    dominated the host->device side of small buckets)."""
    mesh = _ACTIVE[0]
    if mesh is None:
        return tuple(jax.device_put(list(arrays)))
    shardings = [NamedSharding(mesh, P("dp", *([None] * (np.ndim(a) - 1))))
                 for a in arrays]
    return tuple(jax.device_put(list(arrays), shardings))


def shard_batch(mesh: Mesh, *arrays):
    """Place [B, ...] arrays with the batch axis sharded over 'dp'."""
    out = []
    for a in arrays:
        spec = P("dp", *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)


def sharded_chain_scores(mesh: Mesh, qS, qE, tS, tE, score, lane1, lane2,
                         valid, gp: GapParams):
    """Blocked chain DP with the problem batch sharded data-parallel."""
    args = shard_batch(mesh, qS, qE, tS, tE, score, lane1, lane2, valid)
    return chain_scores_blocked(*args, gp.static_key())


def sharded_banded_align(mesh: Mesh, q, t, qlen, tlen, K, m, mm, indel,
                         kband):
    args = shard_batch(mesh, q, t, qlen, tlen, kband)
    q, t, qlen, tlen, kband = args
    return banded_global_kernel(q, t, qlen, tlen, K, m, mm, indel,
                                kband=kband)


def combined_device_step(mesh: Mesh, gp: GapParams, m: int, mm: int,
                         indel: int, K: int):
    """One jitted function running SDP chaining + banded alignment with
    dp-sharded inputs — the full device side of an alignment step."""

    key = gp.static_key()

    def step(qS, qE, tS, tE, score, lane1, lane2, valid,
             gq, gt, gql, gtl, gkb):
        V, bp, lane = chain_scores_blocked(
            qS, qE, tS, tE, score, lane1, lane2, valid, key)
        sc, arrows = banded_global_kernel(gq, gt, gql, gtl, K, m, mm,
                                          indel, kband=gkb)
        return V, bp, lane, sc, arrows

    dp = NamedSharding(mesh, P("dp"))
    dp2 = NamedSharding(mesh, P("dp", None))
    dp3 = NamedSharding(mesh, P("dp", None, None))
    return jax.jit(
        step,
        in_shardings=(dp2,) * 8 + (dp2, dp2, dp, dp, dp),
        out_shardings=(dp2, dp2, dp2, dp, dp3),
    )
