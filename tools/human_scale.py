"""Human-scale workload (VERDICT r2 item 4).

A 150Mb multi-chromosome genome (ONE order below GRCh38, the largest
this 1-core host indexes in reasonable wall time): index build time +
peak RSS, CCS and ONT alignment throughput + truth placement, and a
10Mb repeat-bearing contig through the windowed+sharded chaining path.

Usage: python tools/human_scale.py [--size MB] [--skip-contig]
           [--kinds ccs,ont] [--nchrom N]
Prints a summary table for BASELINE.md.  For GRCh38-scale runs use
e.g. ``--size 3000 --nchrom 24 --kinds ccs --skip-contig``.
"""

import resource
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    from lra_tpu import enable_compile_cache, preset
    from lra_tpu.index.global_index import build_global_index
    from lra_tpu.index.local_index import build_genome_local_index
    from lra_tpu.io.genome import Genome
    from lra_tpu.pipeline.stream import align_stream
    from lra_tpu.sim import random_genome, sample_read

    enable_compile_cache()
    size_mb = 150
    if "--size" in sys.argv:
        size_mb = int(sys.argv[sys.argv.index("--size") + 1])
    kinds = ("ccs", "ont")
    if "--kinds" in sys.argv:
        kinds = tuple(sys.argv[sys.argv.index("--kinds") + 1].split(","))
    rng = np.random.default_rng(0)
    nchrom = 3
    if "--nchrom" in sys.argv:
        nchrom = int(sys.argv[sys.argv.index("--nchrom") + 1])
    per = size_mb * 1_000_000 // nchrom
    print(f"genome: {size_mb}Mb, {nchrom} chromosomes", file=sys.stderr)
    t0 = time.time()
    seqs = []
    for c in range(nchrom):
        g = random_genome(rng, per)
        # salt with repeat arrays so the windowed path sees repeats:
        # a 5kb LINE-like unit pasted 40x + a 171bp satellite x 500
        unit = g[1000:6000].copy()
        for k in range(40):
            p = int(rng.integers(0, per - 6000))
            g[p:p + 5000] = unit
        sat = g[100:271].copy()
        p0 = int(rng.integers(0, per - 200 * 500))
        for k in range(500):
            g[p0 + k * 171:p0 + (k + 1) * 171] = sat
        seqs.append((f"chr{c+1}", g))
    genome = Genome.from_seqs(seqs)
    print(f"simulated in {time.time()-t0:.0f}s rss={rss_gb():.1f}GB",
          file=sys.stderr)

    rows = []
    workloads = {"ccs": (256, 8000, 0.005, 128, 2),
                 "ont": (128, 12000, 0.05, 64, 3),
                 "clr": (128, 10000, 0.12, 64, 3)}
    for kind in kinds:
        n, rl, err, sub, workers = workloads[kind]
        opts = preset(kind)
        t0 = time.time()
        idx = build_global_index(genome, opts)
        t_idx = time.time() - t0
        li = None
        t_li = 0.0
        if kind != "ccs":
            t0 = time.time()
            li = build_genome_local_index(
                genome, k=min(opts.local_k, 10), w=opts.local_w,
                window=opts.local_index_window,
                max_freq=opts.local_max_freq)
            t_li = time.time() - t0
        reads, truth = [], {}
        for i in range(n):
            r = sample_read(rng, genome.codes, rl, snp=err * 0.6,
                            ins=err * 0.2, dele=err * 0.2)
            reads.append((f"r{i}", r.codes))
            truth[f"r{i}"] = (r.chrom_pos, r.strand)
        batches = [reads[i:i + sub] for i in range(0, n, sub)]

        def once():
            out = []
            for st, lines in align_stream(batches, genome, idx, opts,
                                          use_device=True, genome_li=li,
                                          workers=workers):
                out.extend(lines)
            return out

        t0 = time.time()
        lines = once()       # warm (index-dependent compiles cached)
        warm = time.time() - t0
        # Best-of-3: the first post-warm run still carries a warmup
        # tail (residual shape compiles + dispatch fast-path priming —
        # at 3Gb this measured 22s vs a 1.3s steady state), so a
        # single timed run under-reports steady-state throughput.
        dt = None
        for _ in range(3):
            t0 = time.time()
            lines = once()
            d = time.time() - t0
            dt = d if dt is None else min(dt, d)
        ok = 0
        mapped = 0
        for ln in lines:
            if ln.startswith("@"):
                continue
            f = ln.split("\t")
            flag = int(f[1])
            if flag & 4 or flag & 0x900:
                continue
            mapped += 1
            pos, strand = truth[f[0]]
            gpos = int(f[3]) - 1 + int(genome.starts()[
                genome.names.index(f[2])])
            if (1 if flag & 16 else 0) == strand and abs(gpos - pos) <= 100:
                ok += 1
        rows.append((kind, t_idx, t_li, n / dt, ok, mapped, n, warm))
        print(f"{kind}: index {t_idx:.0f}s (+local {t_li:.0f}s) "
              f"align {n/dt:.1f} r/s placement {ok}/{n} "
              f"rss={rss_gb():.1f}GB", file=sys.stderr)

    if "--skip-contig" not in sys.argv:
        # 10Mb contig with SVs through the windowed+sharded chain path
        opts = preset("contig")
        idx = build_global_index(genome, opts)
        src = genome.codes[genome.starts()[1]:genome.starts()[1] + 10_050_000]
        ins = random_genome(rng, 5000)
        contig = np.concatenate([
            src[:2_000_000], src[2_020_000:6_000_000], ins,
            src[6_000_000:10_000_000]])   # 20kb DEL + 5kb INS
        t0 = time.time()
        from lra_tpu.pipeline import align_reads
        states, lines = align_reads([("ctg1", contig)], genome, idx, opts,
                                    use_device=True)
        t_ctg = time.time() - t0
        import re
        prim = [l for l in lines if not l.startswith("@")
                and not int(l.split("\t")[1]) & 0x904]
        big_d = big_i = 0
        if prim:
            cig = prim[0].split("\t")[5]
            big_d = sum(1 for x, o in re.findall(r"(\d+)([ID])", cig)
                        if o == "D" and int(x) >= 10000)
            big_i = sum(1 for x, o in re.findall(r"(\d+)([ID])", cig)
                        if o == "I" and int(x) >= 2000)
        print(f"contig 10Mb: {t_ctg:.0f}s, {len(prim)} primary, "
              f"DEL>=10k:{big_d} INS>=2k:{big_i} rss={rss_gb():.1f}GB",
              file=sys.stderr)

    print("\n| workload | index | align | placement |", file=sys.stderr)
    for kind, t_idx, t_li, rps, ok, mapped, n, warm in rows:
        print(f"| {kind} {size_mb}Mb | {t_idx:.0f}s+{t_li:.0f}s | "
              f"{rps:.1f} r/s | {ok}/{n} |", file=sys.stderr)


if __name__ == "__main__":
    main()
