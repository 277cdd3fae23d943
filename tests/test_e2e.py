"""End-to-end pipeline tests: simulated reads -> SAM."""

import re

import numpy as np
import pytest

from lra_tpu import preset, seq as sequtils
from lra_tpu.index.global_index import build_global_index
from lra_tpu.io.genome import Genome
from lra_tpu.pipeline import align_reads
from lra_tpu.sim import random_genome, sample_read


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(42)
    g = Genome.from_seqs([("chr1", random_genome(rng, 150000)),
                          ("chr2", random_genome(rng, 100000))])
    opts = preset("ccs")
    idx = build_global_index(g, opts)
    return rng, g, opts, idx


def parse_sam(line):
    f = line.split("\t")
    return dict(name=f[0], flag=int(f[1]), chrom=f[2], pos=int(f[3]),
                mapq=int(f[4]), cigar=f[5], seq=f[9],
                tags={x.split(":")[0]: x for x in f[11:]})


def cigar_spans(cig):
    """(read_span, ref_span, clip_pre, clip_suf, counts by op)"""
    ops = re.findall(r"(\d+)([MIDNSHP=X])", cig)
    rspan = tspan = pre = suf = 0
    counts = {}
    for i, (ln, op) in enumerate(ops):
        ln = int(ln)
        counts[op] = counts.get(op, 0) + ln
        if op in "M=XI":
            rspan += ln
        if op in "M=XD":
            tspan += ln
        if op in "SH":
            if i == 0:
                pre = ln
            else:
                suf = ln
    return rspan, tspan, pre, suf, counts


@pytest.mark.parametrize("use_device", [False, True])
def test_perfect_reads(world, use_device):
    rng, g, opts, idx = world
    reads = []
    truths = []
    for i in range(6):
        r = sample_read(rng, g.codes, 4000, rev_prob=0.5)
        reads.append((f"r{i}", r.codes))
        truths.append(r)
    states, lines = align_reads(reads, g, idx, opts, use_device=use_device)
    recs = [parse_sam(l) for l in lines]
    by_name = {}
    for r in recs:
        by_name.setdefault(r["name"], []).append(r)
    for i, tr in enumerate(truths):
        rs = by_name[f"r{i}"]
        primary = [r for r in rs if r["flag"] & 0x904 == 0 or
                   (r["flag"] & ~0x10) == 0]
        assert primary, rs
        r = primary[0]
        # position: chrom-local truth
        ci = int(g.chrom_of(tr.chrom_pos))
        local = tr.chrom_pos - int(g.starts()[ci])
        assert r["chrom"] == g.names[ci]
        assert abs(r["pos"] - 1 - local) < 40
        rspan, tspan, pre, suf, counts = cigar_spans(r["cigar"])
        # perfect read: almost all '='
        assert counts.get("=", 0) > 0.97 * len(tr.codes)
        assert counts.get("X", 0) < 0.01 * len(tr.codes)
        assert (r["flag"] & 0x10 == 0x10) == (tr.strand == 1)
        assert r["mapq"] > 0


def test_noisy_reads_cigar_consistency(world):
    rng, g, opts, idx = world
    reads = []
    truths = []
    for i in range(6):
        r = sample_read(rng, g.codes, 5000, snp=0.005, ins=0.002, dele=0.002,
                        rev_prob=0.5)
        reads.append((f"n{i}", r.codes))
        truths.append(r)
    states, lines = align_reads(reads, g, idx, opts, use_device=False)
    aligned = 0
    for line in lines:
        r = parse_sam(line)
        if r["flag"] & 4:
            continue
        aligned += 1
        i = int(r["name"][1:])
        tr = truths[i]
        rspan, tspan, pre, suf, counts = cigar_spans(r["cigar"])
        # CIGAR read-span consistency (clips + aligned = read length)
        assert rspan + pre + suf == len(tr.codes), r["cigar"][:100]
        # identity is high
        total = counts.get("=", 0) + counts.get("X", 0)
        assert counts.get("=", 0) / total > 0.97
        # NM tag present and plausible
        assert "NM" in r["tags"]
    assert aligned >= 5


def test_split_read_supplementary(world):
    """A read stitched from two distant loci yields >1 SAM segment."""
    rng, g, opts, idx = world
    a = g.codes[20000:26000]
    b = g.codes[90000:96000]
    read = np.concatenate([a, b])
    states, lines = align_reads([("split1", read)], g, idx, opts,
                                use_device=False)
    recs = [parse_sam(l) for l in lines]
    mapped = [r for r in recs if not r["flag"] & 4]
    assert len(mapped) >= 1
    # both loci covered across the segments
    spans = []
    for r in mapped:
        rspan, tspan, pre, suf, _ = cigar_spans(r["cigar"])
        spans.append((r["pos"], r["pos"] + tspan))
    covered_a = any(abs(s - 20001) < 200 for s, e in spans)
    covered_b = any(abs(s - 90001) < 200 for s, e in spans)
    assert covered_a or covered_b


def test_unmapped_read(world):
    rng, g, opts, idx = world
    junk = np.random.default_rng(9).integers(0, 4, 1000).astype(np.uint8)
    states, lines = align_reads([("junk", junk)], g, idx, opts,
                                use_device=False)
    r = parse_sam(lines[0])
    assert r["flag"] & 4


def test_reverse_read_seq_is_rc(world):
    """SAM SEQ for reverse alignments is the reverse complement."""
    rng, g, opts, idx = world
    r = sample_read(rng, g.codes, 3000, rev_prob=1.0)
    states, lines = align_reads([("rev1", r.codes)], g, idx, opts,
                                use_device=False)
    rec = parse_sam(lines[0])
    assert rec["flag"] & 0x10
    assert rec["seq"] == sequtils.decode(sequtils.revcomp(r.codes))


def test_md_tag_and_pairwise(world):
    """MD:Z must round-trip: reconstructing the reference span from
    SEQ+CIGAR+MD and comparing to the genome; pairwise format renders."""
    rng, genome, opts, idx = world
    import copy
    opts = copy.deepcopy(opts)
    reads = []
    for i in range(2):
        r = sample_read(rng, genome.codes, 3000, snp=0.005, ins=0.002,
                        dele=0.002)
        reads.append((f"md{i}", r.codes))
    opts.print_md = True
    states, lines = align_reads(reads[:2], genome, idx, opts,
                                use_device=False)
    checked = 0
    for ln in lines:
        f = ln.split("\t")
        if f[1] in ("4",):
            continue
        md = [x[5:] for x in f if x.startswith("MD:Z:")]
        assert md, ln[:80]
        cigar, seq, pos = f[5], f[9], int(f[3]) - 1
        # reconstruct reference from SEQ + CIGAR + MD
        qp = 0
        ref = []
        for num, op in re.findall(r"(\d+)([=XMIDSH])", cigar):
            n = int(num)
            if op in ("=", "X", "M"):
                ref.append(seq[qp:qp + n])
                qp += n
            elif op in ("I", "S"):
                qp += n
            elif op == "D":
                ref.append("?" * n)
        ref = list("".join(ref))
        # apply MD corrections
        i = 0
        for tok in re.findall(r"(\d+|\^[ACGTN]+|[ACGTN])", md[0]):
            if tok.isdigit():
                i += int(tok)
            elif tok.startswith("^"):
                for c in tok[1:]:
                    ref[i] = c
                    i += 1
            else:
                ref[i] = tok
                i += 1
        got = "".join(ref)
        ci = genome.names.index(f[2])
        start = genome.starts()[ci] + pos
        want = sequtils.decode(genome.codes[start:start + len(got)])
        assert got == want
        checked += 1
    assert checked >= 2

    opts.print_md = False
    opts.print_format = "a"
    _, plines = align_reads(reads[:1], genome, idx, opts, use_device=False)
    assert " q: " in plines[0] and " t: " in plines[0]


def test_inversion_split(world):
    """A read with an inverted middle must yield split segments with the
    middle on the opposite strand (inversion-aware chaining + SPLITChain;
    reference headline feature)."""
    rng, g, opts, idx = world
    start = 20000
    span = np.array(g.codes[start:start + 6000])
    mid = sequtils.revcomp(span[2500:4000])
    read = np.concatenate([span[:2500], mid, span[4000:]])
    states, lines = align_reads([("inv1", read)], g, idx, opts,
                                use_device=False)
    assert not states[0].unaligned
    segs = states[0].groups[0].segments
    strands = sorted(set(s.strand for s in segs))
    assert len(segs) >= 2, [s.blocks[:2] for s in segs]
    assert strands == [0, 1], strands
    # middle inversion typed I when length gates pass (nm >= 500)
    tps = [ln.split("TP:A:")[1][0] for ln in lines if "TP:A:" in ln]
    assert "I" in tps, (tps, lines)


def test_translocation_split(world):
    """A chimeric read (chr1 + chr2) must split into segments on both
    chromosomes (SPLITChain 'T' boundary)."""
    rng, g, opts, idx = world
    c2_start = int(g.starts()[1])
    part1 = np.array(g.codes[30000:33000])
    part2 = np.array(g.codes[c2_start + 40000:c2_start + 43000])
    read = np.concatenate([part1, part2])
    states, lines = align_reads([("tra1", read)], g, idx, opts,
                                use_device=False)
    assert not states[0].unaligned
    chroms = set()
    for group in states[0].groups:
        for s in group.segments:
            chroms.add(s.chrom)
    assert chroms == {0, 1}, chroms


def test_contig_preset_svs(world):
    """CONTIG preset: a 60kb contig with SNPs, a deletion, and an
    insertion must align as one segment with the SVs as exact-length
    D/I CIGAR runs."""
    rng, g, opts_ccs, _ = world
    opts = preset("contig")
    idx = build_global_index(g, opts)
    start = 30000
    span = np.array(g.codes[start:start + 60000])
    for p in rng.integers(0, len(span), 60):
        span[p] = (span[p] + 1) % 4
    span = np.concatenate([span[:20000], span[20500:40000],
                           rng.integers(0, 4, 300).astype(np.uint8),
                           span[40000:]])
    states, lines = align_reads([("ctg1", span)], g, idx, opts,
                                use_device=False)
    st = states[0]
    assert not st.unaligned
    seg = st.groups[0].segments[-1]
    assert abs(seg.tStart - start) <= 50
    cig = seg.stats.cigar
    assert re.search(r"500D", cig), cig[:200]
    assert re.search(r"300I", cig), cig[:200]


def test_inversion_breakpoint_recovery(world):
    """The two-block INV boundary reseed must recover the inversion to
    (near) its true breakpoints, not just its seeded core."""
    rng, g, opts, idx = world
    start = 20000
    span = np.array(g.codes[start:start + 12000])
    mid = sequtils.revcomp(span[5000:7500])
    read = np.concatenate([span[:5000], mid, span[7500:]])
    states, _ = align_reads([("invbp", read)], g, idx, opts,
                            use_device=False)
    st = states[0]
    assert not st.unaligned
    cov = sum(sg.tEnd - sg.tStart
              for gr in st.groups for sg in gr.segments if sg.strand == 1)
    assert cov >= 2300, cov
