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


def _setup_workload(kind, seed, n_reads, read_len, err, sub, workers=2):
    """Build one benchmark workload: simulated genome+reads, our index,
    a runner closure, and the on-disk FASTAs for the reference binary
    (its own workdir — reference index files are preset-specific)."""
    import tempfile

    from lra_tpu import preset, seq as sequtils
    from lra_tpu.index.global_index import build_global_index
    from lra_tpu.io.genome import Genome
    from lra_tpu.pipeline.stream import align_stream
    from lra_tpu.sim import random_genome, sample_read

    workdir = tempfile.mkdtemp(prefix=f"lra_bench_{kind}_")
    rng = np.random.default_rng(seed)
    genome = Genome.from_seqs([("chr1", random_genome(rng, 2_000_000))])
    opts = preset(kind)
    idx = build_global_index(genome, opts)
    snp, ind = err * 0.6, err * 0.2
    reads = [(f"r{i}", sample_read(rng, genome.codes, read_len, snp=snp,
                                   ins=ind, dele=ind).codes)
             for i in range(n_reads)]
    with open(os.path.join(workdir, "ref.fa"), "w") as f:
        f.write(">chr1\n" + sequtils.decode(genome.codes) + "\n")
    with open(os.path.join(workdir, "reads.fa"), "w") as f:
        for name, codes in reads:
            f.write(f">{name}\n" + sequtils.decode(codes) + "\n")
    batches = [reads[i:i + sub] for i in range(0, n_reads, sub)]

    genome_li = None
    if kind != "ccs":
        from lra_tpu.index.local_index import build_genome_local_index
        genome_li = build_genome_local_index(
            genome, k=min(opts.local_k, 10), w=opts.local_w,
            window=opts.local_index_window, max_freq=opts.local_max_freq)

    def once():
        for _ in align_stream(batches, genome, idx, opts, use_device=True,
                              genome_li=genome_li, workers=workers):
            pass

    return workdir, once


def main():
    """Interleaved A/B measurement on BOTH headline workloads (CCS and
    ONT): this host's throughput drifts ~25% run to run, so ours and the
    reference's timed runs alternate within each iteration (all four
    sample the same machine states) and each side takes its best."""
    from lra_tpu import enable_compile_cache

    enable_compile_cache()
    # CCS: 8kb x512 at 0.5% error; ONT: 12kb x256 at 5% error — the
    # round-2 BASELINE.md configurations
    ccs_dir, ccs_once = _setup_workload("ccs", 0, N_READS, 8000,
                                        1.0 / 600 * 3, 256)
    # 3x128 batches + 4 workers: steady-state pipelining (two r3 stream
    # sweeps measured workers=2/3/4 at sub=128 as 75.7/82.3/85.7 and
    # -/-/91.8 r/s; sub=64 and 96 configs were all slower)
    ont_n = 384
    ont_dir, ont_once = _setup_workload("ont", 1, ont_n, 12000, 0.05, 128,
                                        workers=4)

    ref = build_reference()
    ccs_once()  # warm-up (compiles cached persistently)
    ont_once()
    if ref is not None:
        try:
            for d, flag in ((ccs_dir, "-CCS"), (ont_dir, "-ONT")):
                subprocess.run([ref, "index", flag, "ref.fa"], cwd=d,
                               check=True, capture_output=True, timeout=300)
            best = {}
            for _ in range(4):
                for key, fn in (("ccs", ccs_once), ("ont", ont_once)):
                    dt = _time_ours(fn)
                    best[key] = min(best.get(key, dt), dt)
                for key, d, flag in (("ccs_ref", ccs_dir, "-CCS"),
                                     ("ont_ref", ont_dir, "-ONT")):
                    dr = _time_reference(ref, d, flag, "reads.fa")
                    best[key] = min(best.get(key, dr), dr)
            ccs_rps = N_READS / best["ccs"]
            ccs_ref = N_READS / best["ccs_ref"]
            ont_rps = ont_n / best["ont"]
            ont_ref = ont_n / best["ont_ref"]
            r_ccs = ccs_rps / ccs_ref
            r_ont = ont_rps / ont_ref
            print(json.dumps({
                "metric": "ccs+ont_reads_per_s_e2e",
                "value": round(ccs_rps, 3),
                "unit": ("reads/s CCS (8kb x512, 2Mb genome, 1 chip, 2x256"
                         " pipelined, A/B-interleaved best-of-4; CCS "
                         f"{r_ccs:.3f}x of reference lra -t 1 at "
                         f"{ccs_ref:.1f} r/s; ONT 12kb 5%-err x384 3x128: "
                         f"{ont_rps:.1f} r/s = {r_ont:.3f}x of reference "
                         f"at {ont_ref:.1f} r/s; vs_baseline = min(CCS, "
                         "ONT) ratio)"),
                "vs_baseline": round(min(r_ccs, r_ont), 3),
            }))
            return
        except Exception:
            pass
    reads_per_s, _, _ = run(device=True)
    host_rps, _, _ = run(device=False)
    print(json.dumps({
        "metric": "ccs_reads_per_s_e2e",
        "value": round(reads_per_s, 3),
        "unit": ("reads/s (8kb CCS-like x512, 2Mb genome, 1 chip, 2x256 "
                 "pipelined; baseline = host-numpy pipeline)"),
        "vs_baseline": round(reads_per_s / host_rps, 3) if host_rps else 0.0,
    }))


if __name__ == "__main__":
    main()
