"""End-to-end alignment benchmark.

Simulates an E. coli-scale genome + CCS-like reads, builds the index,
aligns with the device (TPU) pipeline, and reports reads/s.

vs_baseline: ratio against the REFERENCE lra binary (ChaissonLab/lra
v1.3.7.1), compiled from /root/reference with the clean-room htslib
stubs in tools/htslib_stub (FASTA path; no htslib in the image) and run
single-threaded on this host with the same genome/reads/preset.  Falls
back to the host-numpy pipeline ratio if the reference cannot be built.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REF_BIN = "/tmp/lra_ref_bench/lra"
REF_SRC = "/root/reference/lra.cpp"
N_READS = 512  # shared by run() and run_reference(): same denominator


def build_reference():
    if os.path.exists(REF_BIN):
        return REF_BIN
    if not os.path.exists(REF_SRC):
        return None
    os.makedirs(os.path.dirname(REF_BIN), exist_ok=True)
    stub = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "htslib_stub")
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++14", "-DNDEBUG", "-I", stub,
             REF_SRC, "-o", REF_BIN, "-lz", "-lpthread"],
            check=True, capture_output=True, timeout=420)
    except Exception:
        return None
    return REF_BIN if os.path.exists(REF_BIN) else None


def run(n_reads=N_READS, read_len=8000, genome_len=2_000_000, device=True,
        materialize=None):
    from lra_tpu import preset
    from lra_tpu.index.global_index import build_global_index
    from lra_tpu.io.genome import Genome
    from lra_tpu.sim import random_genome, sample_read

    rng = np.random.default_rng(0)
    genome = Genome.from_seqs([("chr1", random_genome(rng, genome_len))])
    opts = preset("ccs")
    idx = build_global_index(genome, opts)
    reads = []
    for i in range(n_reads):
        r = sample_read(rng, genome.codes, read_len, snp=0.003, ins=0.001,
                        dele=0.001)
        reads.append((f"r{i}", r.codes))

    if materialize:
        from lra_tpu import seq as sequtils
        with open(os.path.join(materialize, "ref.fa"), "w") as f:
            f.write(">chr1\n" + sequtils.decode(genome.codes) + "\n")
        with open(os.path.join(materialize, "reads.fa"), "w") as f:
            for name, codes in reads:
                f.write(f">{name}\n" + sequtils.decode(codes) + "\n")

    # double-buffered FULL batches: one batch's host stages overlap
    # another's device rounds (lra_tpu.pipeline.stream; the analog of
    # the reference's pthread reader/align overlap, lra.cpp:103-172).
    # Batch 256 measured fastest solo (large batches amortize the
    # tunnel's 28ms/transfer floor); smaller sub-batches lose more to
    # extra device rounds than pipelining wins back.
    from lra_tpu.pipeline.stream import align_stream
    sub = 256
    batches = [reads[i:i + sub] for i in range(0, n_reads, sub)]

    def once():
        states = []
        for st, _lines in align_stream(batches, genome, idx, opts,
                                       use_device=device, workers=2):
            states.extend(st)
        return states

    # warm-up with identical shapes (compiles cache persistently)
    states = once()
    best = None
    for _ in range(5 if device else 1):
        t0 = time.time()
        states = once()
        dt = time.time() - t0
        if best is None or dt < best:
            best = dt
    mapped = sum(1 for s in states if not s.unaligned)
    return n_reads / best, mapped, best


def _time_ours(once):
    t0 = time.time()
    once()
    return time.time() - t0


def _time_reference(ref, workdir, flag, reads_file):
    t0 = time.time()
    out = subprocess.run(
        [ref, "align", flag, "ref.fa", reads_file, "-t", "1", "-p", "s"],
        cwd=workdir, capture_output=True, timeout=600)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-300:])
    return time.time() - t0


def _sim_contigs(rng, genome, n, span, dele, ins):
    """Assembly-contig workload: `span`-long single-chromosome genome
    slices, each carrying one DEL (drop `dele` bases mid-contig) and one
    INS (insert `ins` random bases) — the reference's headline use case
    (README.md:29)."""
    contigs = []
    starts = genome.starts()
    for i in range(n):
        ci = int(rng.integers(0, genome.nseq))
        lo, hi = int(starts[ci]), int(genome.ends[ci])
        s = lo + int(rng.integers(0, hi - lo - span - dele - 1))
        seq = genome.codes[s:s + span + dele].copy()
        dpos = span // 3 + int(rng.integers(0, span // 4))
        seq = np.concatenate([seq[:dpos], seq[dpos + dele:]])
        ipos = 2 * span // 3 + int(rng.integers(0, span // 5))
        insert = rng.integers(0, 4, ins).astype(np.uint8)
        seq = np.concatenate([seq[:ipos], insert, seq[ipos:]])
        contigs.append((f"ctg{i}", seq))
    return contigs


GENOME_MB = 64  # chr20-scale (BASELINE.md configs 2-3: human chr20)


def bench_genome():
    """The shared benchmark genome: chr20-scale (64Mb, 2 chromosomes),
    salted with repeat arrays the same way tools/human_scale.py does
    (40x 5kb LINE-like pastes + a 500-copy 171bp satellite per
    chromosome) so the workload has the repeat structure the reference
    was built for (its headline use case is human-genome SV discovery,
    reference README.md:29) instead of an unrealistically repeat-free
    uniform-random sequence.  The round-3 2Mb configuration remains in
    BASELINE.md for continuity."""
    from lra_tpu.io.genome import Genome
    from lra_tpu.sim import random_genome

    rng = np.random.default_rng(99)
    per = GENOME_MB * 1_000_000 // 2
    seqs = []
    for c in range(2):
        g = random_genome(rng, per)
        unit = g[1000:6000].copy()
        for _ in range(40):
            p = int(rng.integers(0, per - 6000))
            g[p:p + 5000] = unit
        sat = g[100:271].copy()
        p0 = int(rng.integers(0, per - 200 * 500))
        for k in range(500):
            g[p0 + k * 171:p0 + (k + 1) * 171] = sat
        seqs.append((f"chr{c + 1}", g))
    return Genome.from_seqs(seqs)


def _setup_workload(kind, seed, n_reads, read_len, err, sub, genome,
                    workers=2):
    """Build one benchmark workload: simulated reads on the shared
    genome, our index, a runner closure, and the on-disk FASTAs for the
    reference binary (its own workdir — reference index files are
    preset-specific).  kind='contig' simulates SV-bearing assembly
    contigs of length `read_len` instead of error-salted reads."""
    import tempfile

    from lra_tpu import preset, seq as sequtils
    from lra_tpu.index.global_index import build_global_index
    from lra_tpu.pipeline import align_reads
    from lra_tpu.pipeline.stream import align_stream
    from lra_tpu.sim import sample_read

    workdir = tempfile.mkdtemp(prefix=f"lra_bench_{kind}_")
    rng = np.random.default_rng(seed)
    opts = preset(kind)
    idx = build_global_index(genome, opts)
    if kind == "contig":
        reads = _sim_contigs(rng, genome, n_reads, read_len,
                             dele=5000, ins=2000)
    else:
        snp, ind = err * 0.6, err * 0.2
        reads = [(f"r{i}", sample_read(rng, genome.codes, read_len, snp=snp,
                                       ins=ind, dele=ind).codes)
                 for i in range(n_reads)]
    starts = genome.starts()
    with open(os.path.join(workdir, "ref.fa"), "w") as f:
        for ci in range(genome.nseq):
            chrom = genome.codes[starts[ci]:genome.ends[ci]]
            f.write(f">{genome.names[ci]}\n" + sequtils.decode(chrom) + "\n")
    with open(os.path.join(workdir, "reads.fa"), "w") as f:
        for name, codes in reads:
            f.write(f">{name}\n" + sequtils.decode(codes) + "\n")

    genome_li = None
    if kind != "ccs":
        from lra_tpu.index.local_index import build_genome_local_index
        genome_li = build_genome_local_index(
            genome, k=min(opts.local_k, 10), w=opts.local_w,
            window=opts.local_index_window, max_freq=opts.local_max_freq)

    if kind == "contig":
        def once():
            align_reads(reads, genome, idx, opts, use_device=True,
                        genome_li=genome_li)
    else:
        batches = [reads[i:i + sub] for i in range(0, n_reads, sub)]

        def once():
            for _ in align_stream(batches, genome, idx, opts,
                                  use_device=True, genome_li=genome_li,
                                  workers=workers):
                pass

    return workdir, once


def main():
    """Interleaved A/B measurement on ALL FOUR presets (CCS / ONT / CLR /
    CONTIG): this host's throughput drifts ~25% run to run, so ours and
    the reference's timed runs alternate within each iteration (every
    sample shares the same machine states) and each side takes its best.
    vs_baseline = min over the four per-preset ratios."""
    from lra_tpu import enable_compile_cache

    enable_compile_cache()
    # CCS: 8kb x512 at 0.5% error; ONT: 12kb x384 at 5% error; CLR: 10kb
    # x256 at 12%; CONTIG: 8 x ~500kb with a 5kb DEL + 2kb INS — the
    # BASELINE.md configurations on the shared chr20-scale genome.
    # Stream shapes per the round-4 64Mb sweeps: CCS/ONT run one full
    # double-buffered batch (512x1 at 343.9 vs 2x256 at 265.4 r/s;
    # 384x1 at 87.4 vs 3x128 wk4 at 70.6 — with the round-4 host-side
    # fixes, bucket amortization beats pipeline depth); CLR keeps
    # 128-read sub-batches x 4 workers (70.4 vs 67.4 r/s at 256x1).
    genome = bench_genome()
    wl = [
        ("ccs", "-CCS", N_READS,
         _setup_workload("ccs", 0, N_READS, 8000, 1.0 / 600 * 3, 512,
                         genome)),
        ("ont", "-ONT", 384,
         _setup_workload("ont", 1, 384, 12000, 0.05, 384, genome)),
        ("clr", "-CLR", 256,
         _setup_workload("clr", 2, 256, 10000, 0.12, 128, genome,
                         workers=4)),
        ("contig", "-CONTIG", 8,
         _setup_workload("contig", 3, 8, 500_000, 0.0, 8, genome)),
    ]

    ref = build_reference()
    for _, _, _, (_, once) in wl:
        once()  # warm-up (compiles cached persistently)
    if ref is not None:
        try:
            for _, flag, _, (d, _) in wl:
                subprocess.run([ref, "index", flag, "ref.fa"], cwd=d,
                               check=True, capture_output=True, timeout=900)
            samples: dict = {}
            for _ in range(6):
                for key, _, _, (_, fn) in wl:
                    samples.setdefault(key, []).append(_time_ours(fn))
                for key, flag, _, (d, _) in wl:
                    samples.setdefault(key + "_ref", []).append(
                        _time_reference(ref, d, flag, "reads.fa"))
            best = {k: min(v) for k, v in samples.items()}
            rps = {k: n / best[k] for k, _, n, _ in wl}
            ref_rps = {k: n / best[k + "_ref"] for k, _, n, _ in wl}
            ratios = {k: rps[k] / ref_rps[k] for k, _, _, _ in wl}
            # per-preset spread across the 6 A/B samples (VERDICT r4
            # item 4: report spread, not just best — the min ratio must
            # be read against the host's own run-to-run noise)
            spread = {}
            for k, _, n, _ in wl:
                r_our = sorted(n / t for t in samples[k])
                r_ref = sorted(n / t for t in samples[k + "_ref"])
                spread[k] = (f"ours {r_our[0]:.1f}-{r_our[-1]:.1f}, "
                             f"ref {r_ref[0]:.1f}-{r_ref[-1]:.1f} r/s")
            desc = "; ".join(
                f"{k.upper()} {rps[k]:.1f} r/s = {ratios[k]:.3f}x of "
                f"reference at {ref_rps[k]:.1f} r/s [{spread[k]}]"
                for k, _, _, _ in wl)
            print(json.dumps({
                "metric": "four_preset_reads_per_s_e2e",
                "value": round(rps["ccs"], 3),
                "unit": (f"reads/s CCS ({GENOME_MB}Mb chr20-scale "
                         "repeat-salted genome, 1 chip, A/B-interleaved "
                         "best-of-6 vs reference lra -t 1 on the same "
                         "host+data; CCS 8kb x512 double-buffered, ONT "
                         "12kb 5%-err x384, CLR 10kb 12%-err "
                         "x256 2x128 wk=4, CONTIG 8 x ~500kb w/ 5kb DEL + "
                         f"2kb INS; {desc}; vs_baseline = min of the four "
                         "ratios)"),
                "vs_baseline": round(min(ratios.values()), 3),
            }))
            return
        except Exception:
            # NEVER let a reference failure silently change what
            # vs_baseline measures: stamp the fallback in the JSON and
            # put the traceback on stderr
            import traceback
            traceback.print_exc()
            print("bench: REFERENCE A/B FAILED — falling back to the "
                  "host-numpy baseline; vs_baseline below is NOT a "
                  "reference ratio", file=sys.stderr)
    else:
        print("bench: reference build unavailable — vs_baseline below "
              "is the host-numpy ratio, NOT a reference ratio",
              file=sys.stderr)
    reads_per_s, _, _ = run(device=True)
    host_rps, _, _ = run(device=False)
    print(json.dumps({
        "metric": "ccs_reads_per_s_e2e_REFERENCE_AB_FAILED",
        "value": round(reads_per_s, 3),
        "unit": ("reads/s (8kb CCS-like x512, 2Mb genome, 1 chip, 2x256 "
                 "pipelined; baseline = host-numpy pipeline — the "
                 "reference A/B did NOT run; do not compare this "
                 "vs_baseline with reference-ratio rounds)"),
        "baseline": "host-numpy (reference A/B failed)",
        "vs_baseline": round(reads_per_s / host_rps, 3) if host_rps else 0.0,
    }))


if __name__ == "__main__":
    main()
