"""Profiling harness: one warm ONT (or CCS) batch on the real chip.

Usage:
  python tools/profile_ont.py [ccs|ont] [--profile] [--nbatch N]

Prints per-stage --timing table for a warm batch; with --profile, also
a cProfile cumulative-time table of the host work.  Run FOREGROUND and
alone (the tunneled chip starves under two workloads).
"""

import cProfile
import io
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from lra_tpu import enable_compile_cache, preset
from lra_tpu.index.global_index import build_global_index
from lra_tpu.index.local_index import build_genome_local_index
from lra_tpu.io.genome import Genome
from lra_tpu.pipeline import align_reads
from lra_tpu.sim import random_genome, sample_read
from lra_tpu.utils.timing import Timing


def main():
    kind = "ont" if "ont" in sys.argv[1:2] else "ccs"
    do_profile = "--profile" in sys.argv
    nb = 1
    if "--nbatch" in sys.argv:
        nb = int(sys.argv[sys.argv.index("--nbatch") + 1])
    enable_compile_cache()
    rng = np.random.default_rng(0)
    gmb = 2
    if "--genome" in sys.argv:
        gmb = int(sys.argv[sys.argv.index("--genome") + 1])
    g = random_genome(rng, gmb * 1_000_000)
    genome = Genome.from_seqs([("chr1", g)])
    opts = preset(kind)
    if "--pallas" in sys.argv:
        opts.use_pallas = True
    idx = build_global_index(genome, opts)
    li = build_genome_local_index(genome, k=min(opts.local_k, 10),
                                  w=opts.local_w,
                                  window=opts.local_index_window,
                                  max_freq=opts.local_max_freq)
    if kind == "ont":
        n, rl = 128, 12000
        reads = [(f"r{i}", sample_read(rng, g, rl, snp=0.03, ins=0.01,
                                       dele=0.01).codes)
                 for i in range(n)]
    else:
        n, rl = 256, 8000
        reads = [(f"r{i}", sample_read(rng, g, rl, snp=0.003, ins=0.001,
                                       dele=0.001).codes)
                 for i in range(n)]

    # warm-up (compile)
    t0 = time.time()
    align_reads(reads, genome, idx, opts, use_device=True, genome_li=li)
    print(f"warmup: {time.time()-t0:.2f}s", file=sys.stderr)
    from lra_tpu.utils import devstats
    devstats.reset()

    if "--stream" in sys.argv:
        # pipelined-throughput sweep over (workers, sub-batch) configs
        from lra_tpu.pipeline.stream import align_stream
        reads = reads * 3      # steady state: several sub-batches
        n = len(reads)
        for workers, sub in ((4, 128), (3, 64), (4, 64), (5, 64), (4, 96)):
            batches = [reads[i:i + sub] for i in range(0, n, sub)]
            best = None
            for _ in range(2):
                t0 = time.time()
                for _ in align_stream(batches, genome, idx, opts,
                                      use_device=True, genome_li=li,
                                      workers=workers):
                    pass
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            print(f"workers={workers} sub={sub}: {n/best:.1f} reads/s "
                  f"({best:.2f}s)", file=sys.stderr)
        return

    best = None
    tm = Timing()
    for _ in range(3):
        t0 = time.time()
        align_reads(reads, genome, idx, opts, use_device=True,
                    genome_li=li, timing=tm)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{kind}: {n} reads, best warm batch {best:.3f}s "
          f"= {n/best:.1f} reads/s solo", file=sys.stderr)
    buf = io.StringIO()
    tm.write(buf)
    print(buf.getvalue(), file=sys.stderr)

    from lra_tpu.utils import devstats
    if devstats.ENABLED:
        buf = io.StringIO()
        devstats.report(buf)
        print("[devstats: 3 batches]", file=sys.stderr)
        print(buf.getvalue(), file=sys.stderr)

    if do_profile:
        pr = cProfile.Profile()
        pr.enable()
        for _ in range(nb):
            align_reads(reads, genome, idx, opts, use_device=True,
                        genome_li=li)
        pr.disable()
        pr.dump_stats("/tmp/lra_prof.prof")
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        ps.print_stats(60)
        print(s.getvalue())


if __name__ == "__main__":
    main()
