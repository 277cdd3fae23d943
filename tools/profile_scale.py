"""Large-genome profiling with cached artifacts.

Builds (once) and caches the human_scale.py genome + global index for a
given --size under /tmp/lra_scale_cache, then profiles warm CCS/ONT
batches with --timing and cProfile.  For chasing genome-size scaling
cliffs without paying the multi-minute index build per iteration.

Usage: python tools/profile_scale.py [ccs|ont] --size MB [--nchrom N]
           [--profile] [--reads N]
"""

import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, ".")

CACHE = "/tmp/lra_scale_cache"


def build_genome(size_mb, nchrom):
    from lra_tpu.sim import random_genome

    rng = np.random.default_rng(0)
    per = size_mb * 1_000_000 // nchrom
    seqs = []
    for c in range(nchrom):
        g = random_genome(rng, per)
        unit = g[1000:6000].copy()
        for _ in range(40):
            p = int(rng.integers(0, per - 6000))
            g[p:p + 5000] = unit
        sat = g[100:271].copy()
        p0 = int(rng.integers(0, per - 200 * 500))
        for k in range(500):
            g[p0 + k * 171:p0 + (k + 1) * 171] = sat
        seqs.append((f"chr{c+1}", g))
    return seqs


def main():
    from lra_tpu import enable_compile_cache, preset
    from lra_tpu.index.global_index import GlobalIndex, build_global_index
    from lra_tpu.index.local_index import LocalIndex, build_genome_local_index
    from lra_tpu.io.genome import Genome
    from lra_tpu.pipeline import align_reads
    from lra_tpu.sim import sample_read
    from lra_tpu.utils.timing import Timing

    kind = "ont" if "ont" in sys.argv[1:2] else "ccs"
    size_mb = 400
    if "--size" in sys.argv:
        size_mb = int(sys.argv[sys.argv.index("--size") + 1])
    nchrom = 24 if size_mb >= 1000 else 3
    if "--nchrom" in sys.argv:
        nchrom = int(sys.argv[sys.argv.index("--nchrom") + 1])
    nreads = 256 if kind == "ccs" else 128
    if "--reads" in sys.argv:
        nreads = int(sys.argv[sys.argv.index("--reads") + 1])
    enable_compile_cache()
    os.makedirs(CACHE, exist_ok=True)
    tag = f"{size_mb}mb{nchrom}c"
    gpath = f"{CACHE}/genome_{tag}.npz"
    ipath = f"{CACHE}/gdx_{tag}_{kind}.npz"

    t0 = time.time()
    if os.path.exists(gpath):
        z = np.load(gpath)
        names = [str(x) for x in z["names"]]
        ends = z["ends"]
        codes = z["codes"]
        seqs = []
        s = 0
        for nm, e in zip(names, ends):
            seqs.append((nm, codes[s:int(e)]))
            s = int(e)
        genome = Genome.from_seqs(seqs)
        print(f"genome loaded {time.time()-t0:.0f}s", file=sys.stderr)
    else:
        seqs = build_genome(size_mb, nchrom)
        genome = Genome.from_seqs(seqs)
        np.savez(gpath, names=np.array(genome.names),
                 ends=np.asarray(genome.ends), codes=genome.codes)
        print(f"genome built {time.time()-t0:.0f}s", file=sys.stderr)

    opts = preset(kind)
    t0 = time.time()
    if os.path.exists(ipath):
        idx = GlobalIndex.load(ipath)
        print(f"gdx loaded {time.time()-t0:.0f}s ({len(idx)} rows)",
              file=sys.stderr)
    else:
        idx = build_global_index(genome, opts)
        idx.save(ipath)
        print(f"gdx built {time.time()-t0:.0f}s ({len(idx)} rows)",
              file=sys.stderr)
    li = None
    if kind != "ccs":
        lpath = f"{CACHE}/ldx_{tag}.npz"
        t0 = time.time()
        if os.path.exists(lpath):
            li = LocalIndex.load(lpath)
            print(f"ldx loaded {time.time()-t0:.0f}s", file=sys.stderr)
        else:
            li = build_genome_local_index(
                genome, k=min(opts.local_k, 10), w=opts.local_w,
                window=opts.local_index_window,
                max_freq=opts.local_max_freq)
            li.save(lpath)
            print(f"ldx built {time.time()-t0:.0f}s", file=sys.stderr)

    rng = np.random.default_rng(1234)
    err = 0.005 if kind == "ccs" else 0.05
    rl = 8000 if kind == "ccs" else 12000
    reads = []
    for i in range(nreads):
        r = sample_read(rng, genome.codes, rl, snp=err * 0.6,
                        ins=err * 0.2, dele=err * 0.2)
        reads.append((f"r{i}", r.codes))

    t0 = time.time()
    align_reads(reads, genome, idx, opts, use_device=True, genome_li=li)
    print(f"warmup {time.time()-t0:.1f}s", file=sys.stderr)

    tm = Timing()
    best = None
    for _ in range(3):
        t0 = time.time()
        align_reads(reads, genome, idx, opts, use_device=True,
                    genome_li=li, timing=tm)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{kind} {size_mb}Mb: best warm {best:.2f}s = "
          f"{nreads/best:.1f} r/s", file=sys.stderr)
    buf = io.StringIO()
    tm.write(buf)
    print(buf.getvalue(), file=sys.stderr)

    if "--profile" in sys.argv:
        pr = cProfile.Profile()
        pr.enable()
        align_reads(reads, genome, idx, opts, use_device=True, genome_li=li)
        pr.disable()
        st = pstats.Stats(pr, stream=sys.stderr)
        st.sort_stats("cumulative").print_stats(35)


if __name__ == "__main__":
    main()
