"""Double-buffered batch streaming: overlap host stages with device rounds.

The reference pipelines 1MB read batches against compute with a pthread
pool sharing one mutex-guarded reader and writer (reference:
lra.cpp:35,103-172,678-713).  The TPU-native analog: a small thread pool
runs ``align_reads`` on successive batches so that while batch k blocks
on a device round (async dispatch / d2h download on the tunnel), batch
k+1's host stages (matching, clustering, chain surgery, SAM assembly)
run on the CPU — and vice versa.  JAX dispatch is thread-safe; device
work naturally serializes on the single chip while host work interleaves.

Output order is preserved: results are yielded strictly in submission
order regardless of completion order.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from collections import deque


def align_stream(batches, genome, index, opts, use_device=True,
                 genome_li=None, timing=None, dots=None, workers=2):
    """Yield (states, sam_lines) per batch, in order.

    batches: iterable of read batches (each a list of read tuples).
    workers <= 1, or a dots collector, degrades to sequential execution
    (per-read dot dumps are not thread-safe; Timing IS thread-safe and
    rides the pipelined path).
    """
    from . import align_reads

    if workers > 1 and dots is not None:
        import sys

        print("lra_tpu: -d dotplot collector active -> running batches "
              "sequentially (-t has no effect this run)", file=sys.stderr)
    if workers <= 1 or dots is not None:
        for batch in batches:
            yield align_reads(batch, genome, index, opts,
                              use_device=use_device, genome_li=genome_li,
                              timing=timing, dots=dots)
        return

    with ThreadPoolExecutor(max_workers=workers) as pool:
        pending: deque = deque()
        it = iter(batches)
        exhausted = False
        while True:
            while not exhausted and len(pending) < workers + 1:
                try:
                    batch = next(it)
                except StopIteration:
                    exhausted = True
                    break
                pending.append(pool.submit(
                    align_reads, batch, genome, index, opts,
                    use_device=use_device, genome_li=genome_li,
                    timing=timing))
            if not pending:
                break
            yield pending.popleft().result()
