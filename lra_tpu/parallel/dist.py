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


def _group_iter(f):
    """Yield per-read record groups from an open SAM file (records of
    one read are written consecutively; QNAME marks the boundary)."""
    cur_name = None
    group: list = []
    for ln in f:
        ln = ln.rstrip("\n")
        if not ln or ln.startswith("@"):
            continue
        name = ln.split("\t", 1)[0]
        if name != cur_name and group:
            yield group
            group = []
        cur_name = name
        group.append(ln)
    if group:
        yield group


def merge_shards(shard_paths: list, out_file) -> int:
    """Merge stride-sharded SAM files back into single-process order.

    Streaming: one record group per shard is in memory at a time, so
    multi-GB shards merge in O(1) memory.  shard_paths must be ordered
    by procid.  Returns #reads merged."""
    from contextlib import ExitStack

    nproc = len(shard_paths)
    with open(shard_paths[0]) as f0:
        for ln in f0:
            if not ln.startswith("@"):
                break
            out_file.write(ln if ln.endswith("\n") else ln + "\n")
    n = 0
    with ExitStack() as stack:
        iters = [_group_iter(stack.enter_context(open(p)))
                 for p in shard_paths]
        done = [False] * nproc
        remaining = nproc
        k = 0
        while remaining:
            s = k % nproc
            if not done[s]:
                group = next(iters[s], None)
                if group is None:
                    done[s] = True
                    remaining -= 1
                else:
                    for ln in group:
                        out_file.write(ln + "\n")
                    n += 1
            k += 1
    return n
