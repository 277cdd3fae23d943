"""Golden comparison against the compiled reference lra binary.

Builds ChaissonLab/lra from /root/reference using the clean-room htslib
stubs (tools/htslib_stub) and compares both aligners on shared simulated
reads for every preset (CCS / ONT / CLR / CONTIG):

* placement: pos within 50bp + same strand for >= the per-preset
  agreement floor;
* CIGAR error mass (I+D+X bases): within 2x of each other (+20bp
  additive slack) on every agreeing read;
* tags: NM within the same 2x bound; TP:A present on both sides.

The CCS case runs with use_device=True so golden parity exercises the
device kernel path (XLA CPU backend under tests).  Skipped when the
reference source or a compiler is unavailable.
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

from lra_tpu import preset, seq as sequtils
from lra_tpu.index.global_index import build_global_index
from lra_tpu.index.local_index import build_genome_local_index
from lra_tpu.io.genome import Genome
from lra_tpu.pipeline import align_reads
from lra_tpu.sim import random_genome, sample_read

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_SRC = "/root/reference/lra.cpp"


@pytest.fixture(scope="module")
def ref_bin():
    if not os.path.exists(REF_SRC):
        pytest.skip("reference source unavailable")
    import bench
    out = bench.build_reference()
    if out is None:
        pytest.skip("reference build failed")
    return out


def _cig_err(cig: str) -> int:
    return sum(int(n) for n, op in re.findall(r"(\d+)([MIDX=SH])", cig)
               if op in "IDX")


def _parse_sam(text: str) -> dict:
    """name -> (pos0, flagstrand, cigar, tags dict) for primary records."""
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


def _run_reference(ref_bin, tmp_path, flag: str) -> dict:
    subprocess.run([ref_bin, "index", flag, "ref.fa"], cwd=tmp_path,
                   check=True, capture_output=True, timeout=600)
    out = subprocess.run(
        [ref_bin, "align", flag, "ref.fa", "reads.fa", "-t", "1", "-p", "s"],
        cwd=tmp_path, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-500:]
    return _parse_sam(out.stdout)


_REF_CACHE: dict = {}


def _run_reference_cached(key, ref_bin, tmp_path, flag: str) -> dict:
    """Reference rows for a deterministic (key, flag) workload — cached
    so use_device parametrizations don't re-run the binary."""
    ck = (key, flag)
    if ck not in _REF_CACHE:
        _REF_CACHE[ck] = _run_reference(ref_bin, tmp_path, flag)
    return _REF_CACHE[ck]


def _run_ours(genome, reads, opts, use_device, with_li=True) -> dict:
    idx = build_global_index(genome, opts)
    li = None
    if with_li:
        li = build_genome_local_index(genome, k=min(opts.local_k, 10),
                                      w=opts.local_w,
                                      window=opts.local_index_window,
                                      max_freq=opts.local_max_freq)
    _, lines = align_reads(reads, genome, idx, opts, use_device=use_device,
                           genome_li=li)
    return _parse_sam("\n".join(lines))


def _compare(ref_rows, our_rows, min_agree: float, check_tags=True,
             mass_ratio=2.0, mass_slack=20, tag_values=False):
    """mass_ratio/mass_slack bound the per-read CIGAR error mass:
    a <= r*b+s and b <= r*a+s  <=>  |a-b| <= (r-1)*min(a,b)+s.
    tag_values additionally pins NV/AS values (within 0.2% / 4 units)
    and SA presence parity (VERDICT r2 item 3)."""
    assert ref_rows, "reference produced no primary alignments"
    agree = 0
    for name, (rpos, rflag, rcig, rtags) in ref_rows.items():
        if name not in our_rows:
            continue
        opos, oflag, ocig, otags = our_rows[name]
        if oflag != rflag or abs(opos - rpos) > 50:
            continue
        agree += 1
        a, b = _cig_err(ocig), _cig_err(rcig)
        assert abs(a - b) <= (mass_ratio - 1) * min(a, b) + mass_slack, \
            (name, a, b, ocig[:60], rcig[:60])
        if check_tags:
            assert "NM" in otags and "NM" in rtags, name
            nm_o, nm_r = int(otags["NM"]), int(rtags["NM"])
            assert abs(nm_o - nm_r) <= \
                (mass_ratio - 1) * min(nm_o, nm_r) + mass_slack, \
                (name, nm_o, nm_r)
            assert "TP" in otags and "TP" in rtags, name
        if tag_values:
            for tag in ("NV", "AS"):
                assert tag in otags and tag in rtags, (name, tag)
                v_o, v_r = float(otags[tag]), float(rtags[tag])
                assert abs(v_o - v_r) <= max(4.0, 0.002 * abs(v_r)), \
                    (name, tag, v_o, v_r)
            assert ("SA" in otags) == ("SA" in rtags), \
                (name, otags.get("SA"), rtags.get("SA"))
    assert agree >= min_agree * len(ref_rows), (agree, len(ref_rows))
    return agree


def _write_inputs(tmp_path, g, reads):
    (tmp_path / "ref.fa").write_text(">chr1\n" + sequtils.decode(g) + "\n")
    with open(tmp_path / "reads.fa", "w") as f:
        for name, codes in reads:
            f.write(f">{name}\n" + sequtils.decode(codes) + "\n")


def _sim_reads(rng, g, n, length, err):
    reads = []
    for i in range(n):
        r = sample_read(rng, g, length, snp=err * 0.6, ins=err * 0.2,
                        dele=err * 0.2)
        reads.append((f"r{i}", r.codes))
    return reads


def test_golden_ccs_device(ref_bin, tmp_path):
    """CCS golden on the device kernel path (VERDICT r1 item 2)."""
    rng = np.random.default_rng(55)
    g = random_genome(rng, 300000)
    reads = _sim_reads(rng, g, 24, 6000, 0.005)
    _write_inputs(tmp_path, g, reads)
    ref_rows = _run_reference(ref_bin, tmp_path, "-CCS")
    assert len(ref_rows) >= 22
    genome = Genome.from_seqs([("chr1", g)])
    ours = _run_ours(genome, reads, preset("ccs"), use_device=True)
    _compare(ref_rows, ours, 0.98, mass_ratio=1.2, mass_slack=4,
             tag_values=True)


@pytest.mark.parametrize("use_device", [False, True])
def test_golden_ccs_bit_identity(ref_bin, tmp_path, use_device):
    """VERDICT r2 item 3: >= 9/10 clean CCS reads bit-identical to the
    reference in pos+flag+CIGAR+NM, and on EVERY shared read our
    alignment value NV is >= the reference's — the one known residual is
    a read where our refine DP (a rectangular-band superset of the
    reference's shaped band, indel_refine.py docstring) finds a
    strictly better-scoring alignment than the reference does.
    Parametrized over use_device (VERDICT r3 item 3): the device-kernel
    path must hold the same floor as the host path."""
    rng = np.random.default_rng(42)
    g = random_genome(rng, 300000)
    reads = _sim_reads(rng, g, 10, 6000, 0.002)
    _write_inputs(tmp_path, g, reads)
    ref_rows = _run_reference_cached("bitid_ccs", ref_bin, tmp_path, "-CCS")
    assert len(ref_rows) == 10
    genome = Genome.from_seqs([("chr1", g)])
    ours = _run_ours(genome, reads, preset("ccs"), use_device=use_device)
    ident = 0
    for name, (rpos, rflag, rcig, rtags) in ref_rows.items():
        assert name in ours, name
        opos, oflag, ocig, otags = ours[name]
        assert float(otags["NV"]) >= float(rtags["NV"]), \
            (name, otags["NV"], rtags["NV"])
        if (opos, oflag, ocig) == (rpos, rflag, rcig) and \
                otags.get("NM") == rtags.get("NM"):
            ident += 1
    assert ident >= 9, ident


@pytest.mark.parametrize("use_device", [False, True])
def test_golden_ont_bit_identity(ref_bin, tmp_path, use_device):
    """Round-3 lowacc parity: >= 9/10 5%-error ONT reads bit-identical
    to the reference in pos+flag+CIGAR+NM (measured 10/10 on this seed;
    7/10 on seed 7), and NV equal-or-better on every shared read.  The
    level was reached by matching the lowacc reseed geometry exactly
    (sow=500 read-tail widening + the +-50 diagonal band of
    ChainRefine.h:426-512, true extended-anchor box ends, the
    reference's end-space boxes incl. the 500bp far-side expansion,
    ClusterRefine.h:546-613) and removing the indel-refine region span
    cap (the reference groups regions with no length limit,
    IndelRefine.h:147-165; our former 1kb cap split regions mid-run and
    lost cross-seam indel consolidations).  Remaining cross-seed
    residuals trace to the documented minimizer tie-break delta
    (denser head seeds can flip the <20bp end-box gate) and rare
    equal-score D-run placement ties."""
    rng = np.random.default_rng(42)
    g = random_genome(rng, 300000)
    reads = _sim_reads(rng, g, 10, 12000, 0.05)
    _write_inputs(tmp_path, g, reads)
    ref_rows = _run_reference_cached("bitid_ont", ref_bin, tmp_path, "-ONT")
    assert len(ref_rows) == 10
    genome = Genome.from_seqs([("chr1", g)])
    ours = _run_ours(genome, reads, preset("ont"), use_device=use_device)
    ident = 0
    for name, (rpos, rflag, rcig, rtags) in ref_rows.items():
        assert name in ours, name
        opos, oflag, ocig, otags = ours[name]
        assert float(otags["NV"]) >= float(rtags["NV"]), \
            (name, otags["NV"], rtags["NV"])
        if (opos, oflag, ocig) == (rpos, rflag, rcig) and \
                otags.get("NM") == rtags.get("NM"):
            ident += 1
    assert ident >= 9, ident


@pytest.mark.parametrize("use_device", [False, True])
def test_golden_clr_bit_identity(ref_bin, tmp_path, use_device):
    """CLR (12% error) bit-identity: measured 8/10 reads identical in
    pos+flag+CIGAR+NM on this seed after the round-4 parity fixes
    (exact reference minimizer emission + 2048bp local-index windows);
    across 5 seeds at the 12kb golden_diff config CLR measures
    10/9/10/9/10.  The residuals are read-END extension geometry — the
    reference aligns a handful more bases past the outermost anchors,
    with NM within 2 and NV within 25 of ours.  At 12% error the
    end-anchor seed sets still differ slightly near read ends, so
    unlike CCS/ONT the NV>=ref invariant does not hold on every read;
    the floor asserts what is measured."""
    rng = np.random.default_rng(42)
    g = random_genome(rng, 300000)
    reads = _sim_reads(rng, g, 10, 9000, 0.12)
    _write_inputs(tmp_path, g, reads)
    ref_rows = _run_reference_cached("bitid_clr", ref_bin, tmp_path, "-CLR")
    assert len(ref_rows) == 10
    genome = Genome.from_seqs([("chr1", g)])
    ours = _run_ours(genome, reads, preset("clr"), use_device=use_device)
    ident = 0
    for name, (rpos, rflag, rcig, rtags) in ref_rows.items():
        assert name in ours, name
        opos, oflag, ocig, otags = ours[name]
        assert "NM" in otags and "NM" in rtags, name
        if (opos, oflag, ocig) == (rpos, rflag, rcig) and \
                otags["NM"] == rtags["NM"]:
            ident += 1
        else:
            # residuals must stay end-geometry-small, not placement-level
            assert abs(opos - rpos) <= 16, (name, opos, rpos)
            assert oflag == rflag, name
            assert abs(int(otags["NM"]) - int(rtags["NM"])) <= 4, name
    assert ident >= 8, ident


_SWEEP_FLOORS = {"ccs": (9, 48), "ont": (9, 47), "clr": (9, 49)}
_SWEEP_SEEDS = (42, 7, 11, 13, 17)


@pytest.mark.parametrize("kind", ["ccs", "ont", "clr"])
def test_golden_bit_identity_seed_sweep(ref_bin, tmp_path, kind):
    """VERDICT r4 item 1: the 5-seed golden sweep, in-suite.  Per seed,
    >= 9/10 reads bit-identical (pos+flag+CIGAR+NM) to the reference at
    the golden_diff configs; per preset the 50-read aggregate holds the
    measured floor (CCS 48, ONT 47, CLR 49 after the round-5 parity
    fixes: q-walk-adjacent same-diag merging, raw-byte rev-strand
    extension, raw-anchor lowacc SDP-2').  The remaining residuals are
    documented upstream 1bp anchor/cluster-boundary cascades where both
    aligners produce equal-or-better-scoring alignments (golden_diff
    shows the per-read diffs)."""
    rlen = 6000 if kind == "ccs" else 12000
    err = {"ccs": 0.002, "ont": 0.05, "clr": 0.12}[kind]
    flag = {"ccs": "-CCS", "ont": "-ONT", "clr": "-CLR"}[kind]
    per_seed_floor, total_floor = _SWEEP_FLOORS[kind]
    total = 0
    counts = {}
    for seed in _SWEEP_SEEDS:
        rng = np.random.default_rng(seed)
        g = random_genome(rng, 300000)
        reads = []
        for i in range(10):
            r = sample_read(rng, g, rlen, snp=err * 0.6, ins=err * 0.2,
                            dele=err * 0.2)
            reads.append((f"r{i}", r.codes))
        d = tmp_path / f"{kind}_{seed}"
        d.mkdir()
        _write_inputs(d, g, reads)
        ref_rows = _run_reference(ref_bin, d, flag)
        genome = Genome.from_seqs([("chr1", g)])
        ours = _run_ours(genome, reads, preset(kind), use_device=False,
                         with_li=kind != "ccs")
        ident = 0
        for name, (rpos, rflag, rcig, rtags) in ref_rows.items():
            if name not in ours:
                continue
            opos, oflag, ocig, otags = ours[name]
            if (opos, oflag, ocig) == (rpos, rflag, rcig) and \
                    otags.get("NM") == rtags.get("NM"):
                ident += 1
        assert ident >= per_seed_floor, (kind, seed, ident)
        counts[seed] = ident
        total += ident
    assert total >= total_floor, (kind, counts, total)


_REPEAT_FLOORS = {"ccs": (10, 9), "ont": (9, 7), "clr": (9, 9)}


@pytest.mark.parametrize("kind", ["ccs", "ont", "clr"])
def test_golden_repeat_genome_bit_identity(ref_bin, tmp_path, kind):
    """VERDICT r4 item 2: bit-identity where repeats live.  A 5Mb genome
    salted with the bench-genome repeat recipe (20x 5kb LINE-like pastes
    + a 500-copy 171bp satellite array) stresses the frequency caps,
    window thinning, and tie-breaks that uniform-random sequence never
    exercises.  Floors are the measured values (seed 42): CCS 9/10,
    ONT 7/9, CLR 9/9 bit-identical; the residuals are the same read-end
    extension class as the uniform-genome sweep (golden_diff --repeat
    shows the diffs), not repeat-specific machinery."""
    rlen = 6000 if kind == "ccs" else 12000
    err = {"ccs": 0.002, "ont": 0.05, "clr": 0.12}[kind]
    flag = {"ccs": "-CCS", "ont": "-ONT", "clr": "-CLR"}[kind]
    n_ref_floor, ident_floor = _REPEAT_FLOORS[kind]
    rng = np.random.default_rng(42)
    g = random_genome(rng, 5_000_000)
    # same salt recipe as tools/golden_diff.py::repeat_salt (inlined:
    # tools/ is not a package)
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
    reads = []
    for i in range(10):
        r = sample_read(rng, g, rlen, snp=err * 0.6, ins=err * 0.2,
                        dele=err * 0.2)
        reads.append((f"r{i}", r.codes))
    _write_inputs(tmp_path, g, reads)
    ref_rows = _run_reference(ref_bin, tmp_path, flag)
    assert len(ref_rows) >= n_ref_floor, len(ref_rows)
    genome = Genome.from_seqs([("chr1", g)])
    ours = _run_ours(genome, reads, preset(kind), use_device=False,
                     with_li=kind != "ccs")
    ident = 0
    for name, (rpos, rflag, rcig, rtags) in ref_rows.items():
        if name not in ours:
            continue
        opos, oflag, ocig, otags = ours[name]
        if (opos, oflag, ocig) == (rpos, rflag, rcig) and \
                otags.get("NM") == rtags.get("NM"):
            ident += 1
    assert ident >= ident_floor, (kind, ident, len(ref_rows))


def test_golden_ont(ref_bin, tmp_path):
    rng = np.random.default_rng(77)
    g = random_genome(rng, 300000)
    reads = _sim_reads(rng, g, 16, 9000, 0.05)
    _write_inputs(tmp_path, g, reads)
    ref_rows = _run_reference(ref_bin, tmp_path, "-ONT")
    assert len(ref_rows) >= 12
    genome = Genome.from_seqs([("chr1", g)])
    ours = _run_ours(genome, reads, preset("ont"), use_device=False)
    # r3 measured: 16/16 placement agreement, err-mass within 2% — the
    # floors lock most of that in with seed margin
    _compare(ref_rows, ours, 0.9, mass_ratio=1.3, mass_slack=10)


def test_golden_ont_device(ref_bin, tmp_path):
    """ONT golden through the DEVICE kernel path (lowacc pipeline with
    batched SDP/gap/indel rounds) — same floors as the host-path test."""
    rng = np.random.default_rng(77)
    g = random_genome(rng, 300000)
    reads = _sim_reads(rng, g, 16, 9000, 0.05)
    _write_inputs(tmp_path, g, reads)
    ref_rows = _run_reference(ref_bin, tmp_path, "-ONT")
    assert len(ref_rows) >= 12
    genome = Genome.from_seqs([("chr1", g)])
    ours = _run_ours(genome, reads, preset("ont"), use_device=True)
    _compare(ref_rows, ours, 0.9, mass_ratio=1.3, mass_slack=10)


def test_golden_clr(ref_bin, tmp_path):
    rng = np.random.default_rng(99)
    g = random_genome(rng, 300000)
    reads = _sim_reads(rng, g, 16, 9000, 0.12)
    _write_inputs(tmp_path, g, reads)
    ref_rows = _run_reference(ref_bin, tmp_path, "-CLR")
    assert len(ref_rows) >= 10
    genome = Genome.from_seqs([("chr1", g)])
    ours = _run_ours(genome, reads, preset("clr"), use_device=False)
    # r3 measured: 14/16 placement agreement, err-mass within 1%
    _compare(ref_rows, ours, 0.85, mass_ratio=1.3, mass_slack=10)


def test_golden_clr_truth_parity(ref_bin, tmp_path):
    """VERDICT r1 weak #7: score BOTH aligners against simulation truth
    on the same CLR reads — our correct-placement count must be at least
    the reference's minus 2 (the ~7% CLR drop is then inherent to the
    error regime, not a port bug)."""
    rng = np.random.default_rng(123)
    g = random_genome(rng, 400000)
    reads, truth = [], {}
    for i in range(40):
        r = sample_read(rng, g, 8000, snp=0.072, ins=0.024, dele=0.024)
        reads.append((f"r{i}", r.codes))
        truth[f"r{i}"] = (r.chrom_pos, r.strand)
    _write_inputs(tmp_path, g, reads)
    ref_rows = _run_reference(ref_bin, tmp_path, "-CLR")
    genome = Genome.from_seqs([("chr1", g)])
    ours = _run_ours(genome, reads, preset("clr"), use_device=False)

    def score(rows):
        ok = 0
        for name, (tpos, tstrand) in truth.items():
            if name not in rows:
                continue
            pos, flag, _cig, _tags = rows[name]
            strand = 1 if flag == "16" else 0
            if strand == tstrand and abs(pos - tpos) <= 200:
                ok += 1
        return ok

    ref_ok, our_ok = score(ref_rows), score(ours)
    assert our_ok >= ref_ok - 2, (our_ok, ref_ok)


def test_golden_contig(ref_bin, tmp_path):
    """A 150kb contig with a 2kb DEL and a 1kb INS: both aligners place
    it at the truth locus and surface the SVs as large CIGAR indels."""
    rng = np.random.default_rng(11)
    g = random_genome(rng, 600000)
    pos = 200000
    span = g[pos:pos + 150000].copy()
    # 2kb deletion at +40k, 1kb insertion at +100k (contig frame)
    ins = random_genome(rng, 1000)
    contig = np.concatenate([span[:40000], span[42000:100000], ins,
                             span[100000:]])
    reads = [("ctg1", contig)]
    _write_inputs(tmp_path, g, reads)
    ref_rows = _run_reference(ref_bin, tmp_path, "-CONTIG")
    genome = Genome.from_seqs([("chr1", g)])
    ours = _run_ours(genome, reads, preset("contig"), use_device=False)
    assert "ctg1" in ref_rows and "ctg1" in ours

    def big_ops(cig, op):
        return [int(n) for n, o in re.findall(r"(\d+)([ID])", cig)
                if o == op and int(n) >= 500]
    rpos, _, rcig, _ = ref_rows["ctg1"]
    opos, _, ocig, _ = ours["ctg1"]
    assert abs(opos - rpos) <= 100, (opos, rpos)
    assert big_ops(ocig, "D") and big_ops(rcig, "D"), "2kb DEL missing"
    assert big_ops(ocig, "I") and big_ops(rcig, "I"), "1kb INS missing"


def test_golden_contig_bit_identity(ref_bin, tmp_path):
    """CONTIG golden depth (VERDICT r3 item 8): full-CIGAR bit-identity
    on SV-bearing assembly contigs — the reference's headline use case
    (reference README.md:29, Alignment.h:414-504).  Eight 50kb contigs,
    each carrying a 1.5kb DEL and an 800bp INS, must match the compiled
    reference read-for-read in pos+flag+CIGAR+NM (measured 8/8 on this
    seed, with NV and AS equal too; the floor allows one residual)."""
    rng = np.random.default_rng(42)
    g = random_genome(rng, 600000)
    span, dele, ins_len = 50000, 1500, 800
    reads = []
    for i in range(8):
        s = int(rng.integers(0, len(g) - span - dele - 1))
        seq = g[s:s + span + dele].copy()
        dpos = span // 3 + int(rng.integers(0, span // 4))
        seq = np.concatenate([seq[:dpos], seq[dpos + dele:]])
        ipos = 2 * span // 3 + int(rng.integers(0, span // 5))
        insert = rng.integers(0, 4, ins_len).astype(np.uint8)
        seq = np.concatenate([seq[:ipos], insert, seq[ipos:]])
        reads.append((f"r{i}", seq))
    _write_inputs(tmp_path, g, reads)
    ref_rows = _run_reference(ref_bin, tmp_path, "-CONTIG")
    assert len(ref_rows) == 8
    genome = Genome.from_seqs([("chr1", g)])
    ours = _run_ours(genome, reads, preset("contig"), use_device=False)
    ident = 0
    for name, (rpos, rflag, rcig, rtags) in ref_rows.items():
        assert name in ours, name
        opos, oflag, ocig, otags = ours[name]
        assert "NM" in otags and "NM" in rtags, name
        if (opos, oflag, ocig) == (rpos, rflag, rcig) and \
                otags["NM"] == rtags["NM"]:
            ident += 1
    assert ident >= 7, ident


def test_golden_contig_windowed_device_bit_identity(ref_bin, tmp_path):
    """VERDICT r4 item 3: CONTIG bit-identity through the DEVICE +
    WINDOWED chaining path.  A 2.5Mb draft-style contig (0.4% small
    indels + 0.1% SNPs + a 5kb DEL and 2kb INS) fragments into ~14k
    same-diagonal groups, far past the 8192-fragment bucket ceiling, so
    chain/driver routes the SDP through ops/sdp_windowed.py — the only
    configuration where the windowed kernel's two documented
    under-approximation classes (sdp_windowed.py:25-41) meet the
    reference's exact SDP as an oracle.  Asserts FULL identity:
    pos+flag+CIGAR+NM+NV+AS (measured IDENTICAL; NV/AS require the
    reference's f32 run-order score accumulation at this scale)."""
    size, ind = 2_500_000, 0.004
    rng = np.random.default_rng(5)
    g = random_genome(rng, size + 3_000_000)
    s = 1_000_000
    dele, ins_len = 5000, 2000
    seq = g[s:s + size + dele].copy()
    dpos = size // 3
    seq = np.concatenate([seq[:dpos], seq[dpos + dele:]])
    ipos = 2 * size // 3
    insert = rng.integers(0, 4, ins_len).astype(np.uint8)
    seq = np.concatenate([seq[:ipos], insert, seq[ipos:]])
    n = len(seq)
    snp_pos = np.nonzero(rng.random(n) < 0.001)[0]
    seq[snp_pos] = (seq[snp_pos] + 1 + rng.integers(0, 3, len(snp_pos))) % 4
    keep = rng.random(len(seq)) >= ind
    seq = seq[keep]
    ins_mask = rng.random(len(seq)) < ind
    parts, prev = [], 0
    for p in np.nonzero(ins_mask)[0]:
        parts.append(seq[prev:p])
        parts.append(rng.integers(0, 4, 1).astype(np.uint8))
        prev = p
    parts.append(seq[prev:])
    seq = np.concatenate(parts)
    reads = [("ctg0", seq)]
    _write_inputs(tmp_path, g, reads)
    ref_rows = _run_reference(ref_bin, tmp_path, "-CONTIG")
    assert "ctg0" in ref_rows
    genome = Genome.from_seqs([("chr1", g)])
    # assert the windowed kernel is actually the code under test
    from lra_tpu.chain import driver as chain_driver
    sizes = []
    orig = chain_driver._solve_batch

    def record(problems, gp, use_device=True):
        sizes.extend(len(p.qS) for p in problems)
        return orig(problems, gp, use_device)

    chain_driver._solve_batch = record
    try:
        ours = _run_ours(genome, reads, preset("contig"), use_device=True,
                         with_li=False)
    finally:
        chain_driver._solve_batch = orig
    assert any(x > 8192 for x in sizes), sorted(sizes)[-4:]
    rpos, rflag, rcig, rtags = ref_rows["ctg0"]
    opos, oflag, ocig, otags = ours["ctg0"]
    assert (opos, oflag) == (rpos, rflag), (opos, rpos, oflag, rflag)
    assert ocig == rcig, "CIGAR diff (%d vs %d ops)" % (len(ocig), len(rcig))
    for tag in ("NM", "NV", "AS"):
        assert otags.get(tag) == rtags.get(tag), \
            (tag, otags.get(tag), rtags.get(tag))


def test_golden_paf(ref_bin, tmp_path):
    """PAF parity: coordinates/strand agree with the reference's -p p."""
    rng = np.random.default_rng(33)
    g = random_genome(rng, 200000)
    reads = _sim_reads(rng, g, 12, 6000, 0.005)
    _write_inputs(tmp_path, g, reads)
    subprocess.run([ref_bin, "index", "-CCS", "ref.fa"], cwd=tmp_path,
                   check=True, capture_output=True, timeout=600)
    out = subprocess.run(
        [ref_bin, "align", "-CCS", "ref.fa", "reads.fa", "-t", "1",
         "-p", "p"],
        cwd=tmp_path, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-500:]
    ref_paf = {}
    for ln in out.stdout.splitlines():
        f = ln.split("\t")
        if len(f) >= 12:
            ref_paf[f[0]] = (f[4], int(f[7]), int(f[8]))
    assert len(ref_paf) >= 10
    genome = Genome.from_seqs([("chr1", g)])
    opts = preset("ccs")
    opts.print_format = "p"
    idx = build_global_index(genome, opts)
    _, lines = align_reads(reads, genome, idx, opts, use_device=False)
    agree = 0
    for ln in lines:
        f = ln.split("\t")
        if len(f) < 12 or f[0] not in ref_paf:
            continue
        strand, ts, te = ref_paf[f[0]]
        if f[4] == strand and abs(int(f[7]) - ts) <= 50 \
                and abs(int(f[8]) - te) <= 50:
            agree += 1
    assert agree >= 0.9 * len(ref_paf), (agree, len(ref_paf))
