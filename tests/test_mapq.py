"""Pin MAPQ and inversion-typing to hand-computed reference values.

MAPQ formula: reference Mapping_ultility.h:497-590 (SimpleMapQV).
Inversion typing: reference LocalRefineAlignment.h:739-765.
Every expected value below is computed by hand from the reference's
arithmetic (int truncation, clamps, the n==2 -> mapq 1 rescue), with
inputs chosen away from float32 truncation boundaries.
"""

import numpy as np

from lra_tpu import preset
from lra_tpu.align.cigar import AlnStats
from lra_tpu.align.mapq import set_mapq
from lra_tpu.align.segment import SegGroup, Segment
from lra_tpu.pipeline.highacc import type_inversions


def seg(value=0.0, anchors=0, nm=1000, nmm=0, ndel=0, nins=0,
        strand=0, tS=0, tE=0):
    s = Segment(blocks=[(0, tS, max(0, tE - tS))], strand=strand, chrom=0,
                read_len=10000)
    s.value = value
    s.num_anchors0 = anchors
    s.stats = AlnStats(nm=nm, nmm=nmm, ndel=ndel, nins=nins)
    return s


def group(*segs):
    g = SegGroup(segments=list(segs))
    g.value = sum(s.value for s in segs)
    g.num_anchors0 = segs[0].num_anchors0
    return g


def test_mapq_single_ccs_saturates():
    """len==1, non-bypass: pen_cm=30 (anchors>20), identity=1,
    l=log(6000/25)=5.4806 -> int(30*1*5.4806*1)=164 -> clamp 60."""
    opts = preset("ccs")
    opts.global_k = 25
    g = group(seg(value=6000.0, anchors=30, nm=5900, nmm=60, ndel=20,
                  nins=20))
    set_mapq([g], opts)
    assert g.segments[0].mapq == 60


def test_mapq_single_low_anchor():
    """len==1: anchors=4 -> pen=(0.05*4)*0.1=0.02; value=4k ->
    l=log(4)=1.3863 -> int(0.02*1.3863)=0."""
    opts = preset("ccs")
    opts.global_k = 25
    g = group(seg(value=100.0, anchors=4))
    set_mapq([g], opts)
    assert g.segments[0].mapq == 0


def test_mapq_three_groups_ccs():
    """len==3, x=3000/6000=0.5, pen=30, l=log(100/25)=1.3863, y=1,
    ident=1 -> int(30*1*0.5*1.3863)=20; -int(4.343*ln3+.499)=5 -> 15."""
    opts = preset("ccs")
    opts.global_k = 25
    g0 = group(seg(value=100.0, anchors=30))
    g0.value = 6000.0
    g1 = group(seg(value=50.0, anchors=10))
    g1.value = 3000.0
    g2 = group(seg(value=10.0, anchors=5))
    g2.value = 100.0
    set_mapq([g0, g1, g2], opts)
    assert g0.segments[0].mapq == 15
    assert g1.segments[0].mapq == 0
    assert g2.segments[0].mapq == 0


def test_mapq_bypass_clr_single():
    """CLR bypass: q_coef=4, no l factor; anchors=12 -> pen=12;
    identity=min(1, 900/300)=1 -> int(12*4*1)=48."""
    opts = preset("clr")
    g = group(seg(value=800.0, anchors=12, nm=900, nmm=100, ndel=100,
                  nins=100))
    set_mapq([g], opts)
    assert g.segments[0].mapq == 48


def test_mapq_bypass_ont_two_groups():
    """ONT bypass: q_coef=30; x=1750/2000=0.875, y=11/11=1, pen=11,
    identity=100/200=0.5 -> int(11*30*0.125*1*0.5)=20;
    -int(4.343*ln2+.499)=3 -> 17."""
    opts = preset("ont")
    g0 = group(seg(value=10.0, anchors=11, nm=100, nmm=200))
    g0.value = 2000.0
    g1 = group(seg(value=5.0, anchors=11))
    g1.value = 1750.0
    set_mapq([g0, g1], opts)
    assert g0.segments[0].mapq == 17


def test_mapq_two_groups_near_tie_rescue():
    """x>=0.990 branch: mapq=int(pen*(1-x)*y*ident)=0, minus 3, clamps
    to 0, then the n==2 rescue lifts it to 1."""
    opts = preset("ccs")
    g0 = group(seg(value=100.0, anchors=30))
    g0.value = 1000.0
    g1 = group(seg(value=99.0, anchors=30))
    g1.value = 995.0
    set_mapq([g0, g1], opts)
    assert g0.segments[0].mapq == 1


def test_inversion_typing_middle_marked():
    a = seg(nm=1000, strand=0, tS=0, tE=5000)
    b = seg(nm=800, strand=1, tS=6000, tE=7000)
    c = seg(nm=900, strand=0, tS=7500, tE=12000)
    type_inversions([a, b, c])
    assert b.typeofaln == 3 and a.typeofaln == 0 and c.typeofaln == 0


def test_inversion_typing_gates():
    # too-far t gap (>10kb) blocks typing
    a = seg(nm=1000, strand=0, tS=0, tE=5000)
    b = seg(nm=800, strand=1, tS=16000, tE=17000)
    c = seg(nm=900, strand=0, tS=17500, tE=22000)
    type_inversions([a, b, c])
    assert b.typeofaln == 0
    # flank nm below 40 blocks typing
    a = seg(nm=30, strand=0, tS=0, tE=5000)
    b = seg(nm=800, strand=1, tS=6000, tE=7000)
    c = seg(nm=900, strand=0, tS=7500, tE=12000)
    type_inversions([a, b, c])
    assert b.typeofaln == 0
    # middle nm below 500 blocks typing
    a = seg(nm=1000, strand=0, tS=0, tE=5000)
    b = seg(nm=400, strand=1, tS=6000, tE=7000)
    c = seg(nm=900, strand=0, tS=7500, tE=12000)
    type_inversions([a, b, c])
    assert b.typeofaln == 0
    # left segment already typed I blocks re-typing
    a = seg(nm=1000, strand=1, tS=0, tE=5000)
    b = seg(nm=800, strand=0, tS=6000, tE=7000)
    c = seg(nm=900, strand=1, tS=7500, tE=12000)
    a.typeofaln = 3
    type_inversions([a, b, c])
    assert b.typeofaln == 0
