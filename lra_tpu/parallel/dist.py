"""Multi-process / multi-host execution (SURVEY.md §5).

Reads are embarrassingly parallel, so the cross-host story mirrors the
reference's only multi-node mechanism — ``--start/--stride`` read-index
sharding (reference: lra.cpp:110-112,227-234) — made first-class:

* ``init_process(nproc, procid, ...)`` turns one CLI invocation into
  process ``procid`` of ``nproc``: it aligns reads procid, procid+nproc,
  ... and writes ``{out}.shard{procid}``.  With a coordinator address it
  also brings up ``jax.distributed`` so a real pod slice shares one ICI
  domain (the genome/index stay replicated per host; kernel batches stay
  process-local — read data-parallelism needs no cross-process
  collectives, exactly like the reference's independent jobs).
* ``merge_shards`` reconstructs the single-process SAM byte-for-byte:
  header from shard 0, then per-read record groups interleaved
  round-robin (shard ``k % nproc`` owns read ``k``).
"""

from __future__ import annotations


def init_process(nproc: int, procid: int, out: str,
                 coordinator: str = ""):
    """Returns (start, stride, shard_out_path) for this process."""
    if not (0 <= procid < nproc):
        raise ValueError(f"procid {procid} not in [0, {nproc})")
    if coordinator:
        import jax

        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=nproc,
                                   process_id=procid)
    shard_out = out if out == "-" else f"{out}.shard{procid}"
    return procid, nproc, shard_out


def _read_groups(lines):
    """Split SAM body lines into per-read record groups (records of one
    read are written consecutively; QNAME marks the boundary)."""
    groups = []
    cur_name = None
    for ln in lines:
        name = ln.split("\t", 1)[0]
        if name != cur_name:
            groups.append([])
            cur_name = name
        groups[-1].append(ln)
    return groups


def merge_shards(shard_paths: list, out_file) -> int:
    """Merge stride-sharded SAM files back into single-process order.

    shard_paths must be ordered by procid.  Returns #reads merged."""
    nproc = len(shard_paths)
    headers = []
    shard_groups = []
    for i, path in enumerate(shard_paths):
        with open(path) as f:
            lines = f.read().splitlines()
        body = [ln for ln in lines if ln and not ln.startswith("@")]
        if i == 0:
            headers = [ln for ln in lines if ln.startswith("@")]
        shard_groups.append(_read_groups(body))
    for h in headers:
        out_file.write(h + "\n")
    n = 0
    idx = [0] * nproc
    k = 0
    remaining = sum(len(g) for g in shard_groups)
    while remaining:
        s = k % nproc
        if idx[s] < len(shard_groups[s]):
            for ln in shard_groups[s][idx[s]]:
                out_file.write(ln + "\n")
            idx[s] += 1
            n += 1
            remaining -= 1
        k += 1
    return n
