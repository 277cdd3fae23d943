"""Stage-level dotplot-oracle diffs vs the reference binary (SURVEY §4).

The reference's de-facto test harness is its ``-d --read <name>``
per-stage TSV dumps; this test runs both aligners with dumping enabled
on the same read and diffs the stages:

* all-matches: the anchor sets must agree almost exactly (the only
  permitted delta is the documented minimizer tie-break difference,
  index/minimizers.py:18-26);
* roughClusters: every reference rough-cluster anchor must fall inside
  the union of our fine clusters' bounding boxes (and vice versa),
  i.e. the clustering stages see the same signal.
"""

import os
import subprocess

import numpy as np
import pytest

from lra_tpu import preset, seq as sequtils
from lra_tpu.index.global_index import build_global_index
from lra_tpu.io.genome import Genome
from lra_tpu.pipeline import align_reads
from lra_tpu.sim import random_genome, sample_read
from lra_tpu.utils.dots import DotDumper

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


def parse_dots(path):
    rows = []
    with open(path) as f:
        for ln in f:
            p = ln.split("\t")
            if len(p) >= 4:
                rows.append((int(p[0]), int(p[1])))
    return rows


def test_stage_dots_match_reference(ref_bin, tmp_path):
    rng = np.random.default_rng(202)
    g = random_genome(rng, 200000)
    genome = Genome.from_seqs([("chr1", g)])
    read = sample_read(rng, g, 6000, snp=0.003, ins=0.001, dele=0.001)
    (tmp_path / "ref.fa").write_text(">chr1\n" + sequtils.decode(g) + "\n")
    (tmp_path / "reads.fa").write_text(
        ">r0\n" + sequtils.decode(read.codes) + "\n")

    # NO `lra index` first: the index subcommand uses the index-side
    # preset (CCS k=17); letting align self-build (lra.cpp:623-625) uses
    # the align-side k=25 preset that our build_global_index mirrors, so
    # the anchor dumps are directly comparable
    out = subprocess.run(
        [ref_bin, "align", "-CCS", "ref.fa", "reads.fa", "-t", "1",
         "-d", "--read", "r0", "-p", "s"],
        cwd=tmp_path, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-400:]
    assert (tmp_path / "all-matches.dots").exists()

    opts = preset("ccs")
    idx = build_global_index(genome, opts)
    dd = DotDumper(str(tmp_path / "ours"), "r0")
    align_reads([("r0", read.codes)], genome, idx, opts,
                use_device=False, dots={"r0": dd})

    # ---- all-matches: near-exact anchor-set agreement ----
    ref_m = set(parse_dots(tmp_path / "all-matches.dots"))
    our_m = set(parse_dots(tmp_path / "ours" / "all-matches.dots"))
    assert ref_m and our_m
    inter = len(ref_m & our_m)
    jac = inter / len(ref_m | our_m)
    assert jac >= 0.90, (jac, len(ref_m), len(our_m))

    # ---- clustering stage: same signal region (fwd + rev strand) ----
    ref_rc = []
    for fn in ("roughClusters.dots", "revroughClusters.dots"):
        if (tmp_path / fn).exists():
            ref_rc += parse_dots(tmp_path / fn)
    assert ref_rc
    ours_fc = tmp_path / "ours" / "fineclusters_byunique.tab"
    if not ours_fc.exists():
        ours_fc = tmp_path / "ours" / "roughClusters.dots"
    our_c = parse_dots(ours_fc)
    assert our_c
    rq = np.array([r[0] for r in ref_rc])
    rt = np.array([r[1] for r in ref_rc])
    oq = np.array([r[0] for r in our_c])
    ot = np.array([r[1] for r in our_c])
    # bounding boxes agree within one k-mer + band slack
    assert abs(int(rq.min()) - int(oq.min())) <= 500
    assert abs(int(rq.max()) - int(oq.max())) <= 500
    assert abs(int(rt.min()) - int(ot.min())) <= 500
    assert abs(int(rt.max()) - int(ot.max())) <= 500
    # our cluster anchors sit inside the reference's rough signal span
    inside = ((ot >= rt.min() - 1000) & (ot <= rt.max() + 1000)).mean()
    assert inside >= 0.95, inside
