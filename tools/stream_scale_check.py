"""Reproduce the 3Gb align_stream throughput using cached artifacts.

Compares align_reads (single batch) vs align_stream (sub-batches,
workers=N) on the same cached 3Gb genome+index, to isolate the
human_scale.py cliff (20.5 r/s) from the profile_scale.py number
(295.9 r/s).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

CACHE = "/tmp/lra_scale_cache"


def main():
    from lra_tpu import enable_compile_cache, preset
    from lra_tpu.index.global_index import GlobalIndex
    from lra_tpu.io.genome import Genome
    from lra_tpu.pipeline import align_reads
    from lra_tpu.pipeline.stream import align_stream
    from lra_tpu.sim import sample_read

    enable_compile_cache()
    tag = "3000mb24c"
    z = np.load(f"{CACHE}/genome_{tag}.npz")
    names = [str(x) for x in z["names"]]
    ends = z["ends"]
    codes = z["codes"]
    seqs = []
    s = 0
    for nm, e in zip(names, ends):
        seqs.append((nm, codes[s:int(e)]))
        s = int(e)
    genome = Genome.from_seqs(seqs)
    idx = GlobalIndex.load(f"{CACHE}/gdx_{tag}_ccs.npz")
    print(f"loaded ({len(idx)} rows)", file=sys.stderr)

    opts = preset("ccs")
    rng = np.random.default_rng(1234)
    reads = []
    for i in range(256):
        r = sample_read(rng, genome.codes, 8000, snp=0.003,
                        ins=0.001, dele=0.001)
        reads.append((f"r{i}", r.codes))
    batches = [reads[i:i + 128] for i in range(0, 256, 128)]

    # warm both paths
    t0 = time.time()
    align_reads(reads, genome, idx, opts, use_device=True)
    print(f"warm align_reads {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    for _ in align_stream(batches, genome, idx, opts, use_device=True,
                          workers=2):
        pass
    print(f"warm align_stream {time.time()-t0:.1f}s", file=sys.stderr)

    for label, fn in [
        ("align_reads x256", lambda: align_reads(
            reads, genome, idx, opts, use_device=True)),
        ("align_stream 2x128 wk=2", lambda: [
            None for _ in align_stream(batches, genome, idx, opts,
                                       use_device=True, workers=2)]),
    ]:
        best = None
        for _ in range(3):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label}: best {best:.2f}s = {256/best:.1f} r/s",
              file=sys.stderr)


if __name__ == "__main__":
    main()
