"""Bit-identical golden diff driver (VERDICT r2 item 3).

Simulates clean CCS reads, runs the compiled reference binary and our
pipeline on the same inputs, and prints a per-read comparison of
placement, full CIGAR, and NM/NV/AS tag values, with the first point of
CIGAR divergence for non-identical reads.

Usage: python tools/golden_diff.py [n_reads] [err] [seed] [preset]
(preset: ccs | ont | clr; err defaults scale with the preset)
"""

import os
import re
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("LRA_TPU_FORCE_CPU"):
    # the axon sitecustomize forces the TPU platform; this tool's device
    # path is use_device=False, so force CPU to stay off a dead tunnel
    import jax

    jax.config.update("jax_platforms", "cpu")

from lra_tpu import preset, seq as sequtils
from lra_tpu.index.global_index import build_global_index
from lra_tpu.io.genome import Genome
from lra_tpu.pipeline import align_reads
from lra_tpu.sim import random_genome, sample_read
import bench


def parse(text):
    rows = {}
    for ln in text.splitlines():
        if ln.startswith("@") or not ln.strip():
            continue
        f = ln.split("\t")
        if len(f) > 5 and f[1] in ("0", "16"):
            tags = {t.split(":")[0]: t.split(":", 2)[2]
                    for t in f[11:] if t.count(":") >= 2}
            rows[f[0]] = (int(f[3]) - 1, f[1], f[5], tags)
    return rows


def cigar_ops(c):
    return re.findall(r"(\d+)([MIDX=SH])", c)


def first_diff(a, b):
    oa, ob = cigar_ops(a), cigar_ops(b)
    qa = 0
    for i in range(max(len(oa), len(ob))):
        xa = oa[i] if i < len(oa) else None
        xb = ob[i] if i < len(ob) else None
        if xa != xb:
            return i, qa, xa, xb
        if xa[1] in "MIX=S":
            qa += int(xa[0])
    return None


def repeat_salt(rng, g):
    """Salt a genome with the bench_genome repeat recipe scaled to its
    size: LINE-like 5kb pastes + a 171bp satellite array (repeats are
    where freq caps, window thinning, and tie-breaks diverge)."""
    per = len(g)
    unit = g[1000:6000].copy()
    for _ in range(max(4, per // 250_000)):
        p = int(rng.integers(0, per - 6000))
        g[p:p + 5000] = unit
    sat = g[100:271].copy()
    ncopy = min(500, per // 2000)
    p0 = int(rng.integers(0, per - 171 * (ncopy + 1)))
    for k in range(ncopy):
        g[p0 + k * 171:p0 + (k + 1) * 171] = sat
    return g


def main():
    repeat = "--repeat" in sys.argv
    if repeat:
        sys.argv.remove("--repeat")
    kind = sys.argv[4] if len(sys.argv) > 4 else "ccs"
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    default_err = {"ccs": 0.002, "ont": 0.05, "clr": 0.12, "contig": 0.0}[kind]
    err = float(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2] != "-" \
        else default_err
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    rlen = 6000 if kind == "ccs" else 12000
    rng = np.random.default_rng(seed)
    if kind == "contig":
        # SV-bearing assembly contigs: ~50kb slices with a 1.5kb DEL and
        # an 800bp INS each (the reference's headline workload)
        g = random_genome(rng, 600000)
        reads = []
        span, dele, ins_len = 50000, 1500, 800
        for i in range(n):
            s = int(rng.integers(0, len(g) - span - dele - 1))
            seq = g[s:s + span + dele].copy()
            dpos = span // 3 + int(rng.integers(0, span // 4))
            seq = np.concatenate([seq[:dpos], seq[dpos + dele:]])
            ipos = 2 * span // 3 + int(rng.integers(0, span // 5))
            insert = rng.integers(0, 4, ins_len).astype(np.uint8)
            seq = np.concatenate([seq[:ipos], insert, seq[ipos:]])
            reads.append((f"r{i}", seq))
    else:
        g = random_genome(rng, 5_000_000 if repeat else 300000)
        if repeat:
            g = repeat_salt(rng, g)
        reads = []
        for i in range(n):
            r = sample_read(rng, g, rlen, snp=err * 0.6, ins=err * 0.2,
                            dele=err * 0.2)
            reads.append((f"r{i}", r.codes))
    d = tempfile.mkdtemp(prefix="golden_diff_")
    with open(os.path.join(d, "ref.fa"), "w") as f:
        f.write(">chr1\n" + sequtils.decode(g) + "\n")
    with open(os.path.join(d, "reads.fa"), "w") as f:
        for name, codes in reads:
            f.write(f">{name}\n" + sequtils.decode(codes) + "\n")
    ref = bench.build_reference()
    assert ref, "reference build failed"
    flag = {"ccs": "-CCS", "ont": "-ONT", "clr": "-CLR",
            "contig": "-CONTIG"}[kind]
    subprocess.run([ref, "index", flag, "ref.fa"], cwd=d, check=True,
                   capture_output=True, timeout=600)
    out = subprocess.run(
        [ref, "align", flag, "ref.fa", "reads.fa", "-t", "1", "-p", "s"],
        cwd=d, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-400:]
    ref_rows = parse(out.stdout)

    genome = Genome.from_seqs([("chr1", g)])
    opts = preset(kind)
    genome_li = None
    if kind != "ccs":
        from lra_tpu.index.local_index import build_genome_local_index

        genome_li = build_genome_local_index(
            genome, k=min(opts.local_k, 10), w=opts.local_w,
            window=opts.local_index_window, max_freq=opts.local_max_freq)
    idx = build_global_index(genome, opts)
    _, lines = align_reads(reads, genome, idx, opts, use_device=False,
                           genome_li=genome_li)
    our_rows = parse("\n".join(lines))

    ident = 0
    for name in sorted(ref_rows, key=lambda x: int(x[1:])):
        if name not in our_rows:
            print(f"{name}: MISSING in ours")
            continue
        rp, rf, rc, rt = ref_rows[name]
        op, of, oc, ot = our_rows[name]
        tagcmp = " ".join(
            f"{k}:{ot.get(k)}|{rt.get(k)}" + ("=" if ot.get(k) == rt.get(k)
                                              else "!")
            for k in ("NM", "NV", "AS"))
        if (rp, rf, rc) == (op, of, oc) and \
                all(ot.get(k) == rt.get(k) for k in ("NM",)):
            ident += 1
            print(f"{name}: IDENTICAL cigar+pos  {tagcmp}")
        else:
            print(f"{name}: pos {op}|{rp} flag {of}|{rf}  {tagcmp}")
            if oc != rc:
                fd = first_diff(oc, rc)
                if fd:
                    i, qa, xa, xb = fd
                    print(f"   cigar diff at op {i} (q~{qa}): "
                          f"ours={xa} ref={xb}")
                    print(f"   ours: ...{oc[max(0,_pos(oc,i)-20):_pos(oc,i)+20]}...")
                    print(f"   ref:  ...{rc[max(0,_pos(rc,i)-20):_pos(rc,i)+20]}...")
    print(f"\n{ident}/{len(ref_rows)} bit-identical CIGAR+pos+NM  ({d})")


def _pos(cig, opi):
    """Char offset of op opi in the cigar string."""
    p = 0
    for k, m in enumerate(re.finditer(r"\d+[MIDX=SH]", cig)):
        if k == opi:
            return m.start()
        p = m.end()
    return p


if __name__ == "__main__":
    main()
