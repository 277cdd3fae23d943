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


def _time_reference(ref, workdir):
    t0 = time.time()
    out = subprocess.run(
        [ref, "align", "-CCS", "ref.fa", "reads.fa", "-t", "1", "-p", "s"],
        cwd=workdir, capture_output=True, timeout=600)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-300:])
    return time.time() - t0


def main():
    """Interleaved A/B measurement: this host's throughput drifts ~25%
    run to run, so ours and the reference's timed runs alternate (both
    sample the same machine states) and each side takes its best."""
    import tempfile

    from lra_tpu import enable_compile_cache, preset
    from lra_tpu.index.global_index import build_global_index
    from lra_tpu.io.genome import Genome
    from lra_tpu.pipeline.stream import align_stream
    from lra_tpu.sim import random_genome, sample_read

    enable_compile_cache()
    workdir = tempfile.mkdtemp(prefix="lra_bench_")
    rng = np.random.default_rng(0)
    genome = Genome.from_seqs([("chr1", random_genome(rng, 2_000_000))])
    opts = preset("ccs")
    idx = build_global_index(genome, opts)
    reads = [(f"r{i}", sample_read(rng, genome.codes, 8000, snp=0.003,
                                   ins=0.001, dele=0.001).codes)
             for i in range(N_READS)]
    from lra_tpu import seq as sequtils
    with open(os.path.join(workdir, "ref.fa"), "w") as f:
        f.write(">chr1\n" + sequtils.decode(genome.codes) + "\n")
    with open(os.path.join(workdir, "reads.fa"), "w") as f:
        for name, codes in reads:
            f.write(f">{name}\n" + sequtils.decode(codes) + "\n")
    batches = [reads[i:i + 256] for i in range(0, N_READS, 256)]

    def once():
        for _ in align_stream(batches, genome, idx, opts,
                              use_device=True, workers=2):
            pass

    ref = build_reference()
    once()  # warm-up (compiles cached persistently)
    if ref is not None:
        try:
            subprocess.run([ref, "index", "-CCS", "ref.fa"], cwd=workdir,
                           check=True, capture_output=True, timeout=300)
            ours_best, ref_best = None, None
            for _ in range(4):
                dt = _time_ours(once)
                ours_best = dt if ours_best is None else min(ours_best, dt)
                dr = _time_reference(ref, workdir)
                ref_best = dr if ref_best is None else min(ref_best, dr)
            reads_per_s = N_READS / ours_best
            ref_rps = N_READS / ref_best
            print(json.dumps({
                "metric": "ccs_reads_per_s_e2e",
                "value": round(reads_per_s, 3),
                "unit": ("reads/s (8kb CCS-like x512, 2Mb genome, 1 chip, "
                         "2x256 pipelined, A/B-interleaved best-of-4; "
                         "baseline = reference lra -t 1 on this host at "
                         f"{ref_rps:.1f} reads/s)"),
                "vs_baseline": round(reads_per_s / ref_rps, 3),
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
