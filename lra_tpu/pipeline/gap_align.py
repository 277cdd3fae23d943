"""Batched gap closing between chain anchors.

Collects all inter-anchor gap alignment jobs of a read batch, dispatches
the banded-global ones to the device kernel in size buckets (per-problem
band halfwidth), and the rare long-drift ones to the host one-gap aligner
(reference semantics: AlignSubstrings, LocalRefineAlignment.h:101-129:
band = min(2*drift+1, local_band), scores local_match/mismatch/indel).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..align.affine import affine_one_gap_align
from ..ops.affine_kernel import (banded_global_kernel,
                                 banded_global_np,
                                 traceback_banded)
from ..options import Options

_SIZE_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048)


def _pow2_at_least(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def _size_bucket(n: int) -> int:
    for b in _SIZE_BUCKETS:
        if n <= b:
            return b
    return ((n + 2047) // 2048) * 2048


@dataclass
class GapJob:
    q: np.ndarray          # read codes of the gap (strand frame)
    t: np.ndarray          # chrom codes of the gap
    key: tuple             # caller routing key
    blocks: list | None = None
    band: int | None = None    # override band halfwidth (indel refine)


def solve_gap_jobs(jobs: list, opts: Options, use_device: bool = True) -> None:
    """Fills job.blocks with [(q_off, t_off, len)] relative to gap start."""
    import jax.numpy as jnp

    device_jobs: dict = {}
    for job in jobs:
        ql, tl = len(job.q), len(job.t)
        if ql == 0 or tl == 0:
            job.blocks = []
            continue
        drift = abs(ql - tl)
        band_in = job.band if job.band is not None else \
            min(2 * drift + 1, opts.local_band)
        k = min(max(1, min(ql, tl)), band_in)
        diag = max(1, min(ql, tl))
        if diag + 2 * k >= max(ql, tl):
            kb = 2 * k   # banded-global regime (device or batched numpy)
            # K class: narrow (gap closing) vs wide (indel refine)
            Kc = 2 * opts.local_band if kb <= 2 * opts.local_band else \
                2 * _pow2_at_least(kb // 2)
            if Kc <= 512:
                bucket = (Kc, _size_bucket(ql), _size_bucket(tl))
                device_jobs.setdefault(bucket, []).append((job, kb))
                continue
        res = affine_one_gap_align(job.q, job.t, opts.local_match,
                                   opts.local_mismatch, opts.local_indel,
                                   band_in)
        job.blocks = res.blocks

    for (K, Qb, Tb), items in device_jobs.items():
        if use_device:
            B = 8
            while B < len(items):
                B *= 2
        else:
            B = len(items)
        q = np.full((B, Qb), 4, np.int8)
        t = np.full((B, Tb), 4, np.int8)
        qlen = np.zeros(B, np.int32)
        tlen = np.zeros(B, np.int32)
        kband = np.zeros(B, np.int32)
        for b, (job, kb) in enumerate(items):
            q[b, :len(job.q)] = job.q
            t[b, :len(job.t)] = job.t
            qlen[b] = len(job.q)
            tlen[b] = len(job.t)
            kband[b] = kb
        if use_device:
            score, arrows = banded_global_kernel(
                jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen),
                jnp.asarray(tlen), K, opts.local_match, opts.local_mismatch,
                opts.local_indel, kband=jnp.asarray(kband))
            arrows = np.asarray(arrows)
        else:
            score, arrows = banded_global_np(
                q, t, qlen, tlen, K, opts.local_match, opts.local_mismatch,
                opts.local_indel, kband)
        for b, (job, kb) in enumerate(items):
            blocks, _ = traceback_banded(arrows[b], qlen[b], tlen[b], K)
            job.blocks = blocks
