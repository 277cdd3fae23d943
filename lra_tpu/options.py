"""Configuration for the TPU-native long-read aligner.

Typed equivalent of the reference's flat ``Options`` struct
(reference: Options.h:8-241) plus the four read-type preset tables
(reference: lra.cpp:268-431).  The presets carry the empirically tuned
constants of the method and are transcribed value-for-value; the runtime
knobs that only made sense for the pthread CPU binary (nproc, stride, ...)
are replaced by batching/sharding parameters for the TPU pipeline.
"""

from __future__ import annotations

import dataclasses
import enum
from dataclasses import dataclass


class ReadType(enum.Enum):
    ONT = "ont"
    CLR = "clr"
    CCS = "ccs"
    CONTIG = "contig"


@dataclass
class Options:
    # --- indexing (reference: Options.h:11-16, defaults Options.h:141-147) ---
    global_k: int = 17
    local_k: int = 7
    global_w: int = 10
    local_w: int = 5
    global_max_freq: int = 50
    local_max_freq: int = 30
    global_winsize: int = 16          # per-window thinning window (bp)
    num_minimizers_per_window: int = 5
    # the reference's Options.h:200 says 256, but `lra index` constructs
    # its LocalIndex with the DEFAULT constructor, whose window is
    # 1 << (LOCAL_POS_BITS-1) = 2048 (MMIndex.h:110-117, lra.cpp:988);
    # the .gli then carries 2048 into every align run and the read-side
    # indexes copy it (Map_lowacc.h:246).  2048 is therefore the
    # production value — it widens the per-window frequency cap scope
    # and the reseed walk granularity.
    local_index_window: int = 2048
    # reference streaming-emission minimizer semantics (MinCount.h:8-179:
    # change-driven emission, keep-older slide ties, circular-buffer
    # expiry recompute); False = leftmost windowed-argmin rule
    exact_ref_minimizers: bool = True

    # --- cleaning / clustering (Options.h:148-158,219-229) ---
    max_diag: int = 500
    clean_max_diag: int = 100
    min_diag_cluster: int = 10
    second_clean_min_diag_cluster: int = 40
    second_clean_max_diag: int = 10
    min_cluster_size: int = 2
    min_cluster_length: int = 50
    min_refined_cluster_size: int = 40
    rough_cluster_max_gap: int = 1000
    clean_cluster_size: int = 100
    anchor_per_length: int = 10
    punish_anchorfreq: int = 10
    max_gap: int = 5000
    max_gap_btwn_anchors: int = 1000
    min_unique_stretch_num: int = 1
    min_unique_stretch_dist: int = 50
    bypass_clustering: bool = False   # True => low-accuracy path
    extract_diagonal_from_clean: bool = False

    # --- chaining / SDP (Options.h:185-213) ---
    num_aln: int = 3                  # secondary chains kept by SDP-1
    print_num_aln: int = 1
    aln_thres: float = 0.7
    initial_anchorbonus: float = 1.0  # SDP-1 per-base anchor bonus
    second_anchorbonus: float = 2.0   # SDP-2 per-base anchor bonus
    rate_first_sdp_value: float = 0.2
    rate_value: float = 0.8
    first_coefficient: float = 18.0
    second_coefficient: float = 12.0
    max_drift: int = 400
    split_dist: int = 50000
    anchors_too_sparse: float = 0.01
    merge_dist: int = 100
    remove_paired_indels: bool = True
    remove_spurious_anchors: bool = True
    max_remove_paired_indels_length: int = 500
    max_remove_spurious_anchors_dist: int = 500
    min_remove_spurious_anchors_num: int = 10

    # --- concave gap cost (Options.h:113-119,235-239; SubRountine.h:43-126) ---
    free_gap: int = 10
    gap_open: float = 2.0
    gap_extend: float = 10.0
    gap_root: float = 2.0
    gap_ceiling1: int = 1500
    gap_ceiling2: int = 3000

    # --- base-level alignment (Options.h:132-137) ---
    local_match: int = 4
    local_mismatch: int = -3
    local_indel: int = -4
    local_band: int = 15
    refine_band: int = 7
    sse_band: int = 30
    refine_space_diag: int = 5
    refine_space_dist: int = 10000
    refine_breakpoint: bool = False
    skip_banded_refine: bool = False

    # --- refinement behaviour ---
    highly_accurate: bool = False
    refine_by_sdp: bool = True
    refine_end: bool = False
    limit_refine: bool = True
    btn_subclusters_window: int = 800
    # indel-refine device-routing cutoff: refine regions with max side
    # length above this solve on the host shaped-band DP instead of the
    # device size tiers (measured split on the tunneled v5e — see
    # pipeline/gap_align.py; re-tune per deployment with
    # `-x refine_dev_max=N` where dispatch latency differs)
    refine_dev_max: int = 4096

    # --- output (Options.h:27-29,120-122) ---
    read_type: ReadType = ReadType.ONT
    print_format: str = "s"           # s=SAM p/pc=PAF a=pairwise b=BED
    hard_clip: bool = False
    show_mismatch: bool = True        # '=' /'X' CIGAR ops vs 'M'
    print_md: bool = False
    passthrough_tag: bool = False
    time_read: bool = False           # RT:i per-read runtime tag (ms)
    # Fused Pallas banded kernel (ops/affine_pallas.py): bit-identical
    # output; in isolation 30-80x faster than the XLA path on TPU, but
    # on the tunneled dev chip multi-program dispatch makes it a net
    # loss end to end, so it is opt-in (-x use_pallas=true).
    use_pallas: bool = False
    max_p: int = 2000

    # --- TPU batching / sharding (new; no reference analog) ---
    batch_reads: int = 32             # reads batched per device step
    anchor_buckets: tuple = (256, 1024, 4096, 16384)
    pair_buckets: tuple = (64, 256, 1024)   # banded-alignment length buckets
    band_width: int = 16              # padded affine band


def _ccs(o: Options) -> Options:
    """-CCS preset (reference: lra.cpp:309-341)."""
    o.global_k = 25; o.global_w = 20; o.global_max_freq = 150
    o.global_winsize = 15; o.num_minimizers_per_window = 1
    o.local_max_freq = 15
    o.read_type = ReadType.CCS
    o.gap_root = 1.5; o.gap_extend = 15.0; o.gap_open = 4.0
    o.initial_anchorbonus = 10.0
    o.gap_ceiling1 = 2000; o.gap_ceiling2 = 3000
    o.highly_accurate = True
    o.num_aln = 2; o.print_num_aln = 1
    o.merge_dist = 100
    o.rough_cluster_max_gap = 500
    o.max_gap = 400
    o.clean_max_diag = 150
    o.second_clean_max_diag = 100; o.second_clean_min_diag_cluster = 30
    o.min_diag_cluster = 10; o.min_cluster_size = 10
    o.clean_cluster_size = 100
    o.punish_anchorfreq = 10; o.anchor_per_length = 10
    o.refine_space_dist = 30000
    o.anchors_too_sparse = 0.005
    o.hard_clip = True
    o.extract_diagonal_from_clean = True
    return o


def _contig(o: Options) -> Options:
    """-CONTIG preset (reference: lra.cpp:268-308)."""
    o.global_k = 19; o.global_w = 10; o.global_max_freq = 30
    o.global_winsize = 20; o.num_minimizers_per_window = 1
    o.local_max_freq = 15
    o.read_type = ReadType.CONTIG
    o.refine_band = 50
    o.gap_root = 1.5; o.gap_extend = 20.0; o.gap_open = 4.0
    o.gap_ceiling1 = 3000; o.gap_ceiling2 = 5000
    o.highly_accurate = True
    o.initial_anchorbonus = 1.0
    o.max_diag = 100
    o.max_gap = 500
    o.rough_cluster_max_gap = 500
    o.num_aln = 2; o.print_num_aln = 1
    o.anchors_too_sparse = 0.005
    o.min_cluster_length = 100
    o.first_coefficient = 24.0
    o.merge_dist = 100
    o.clean_max_diag = 150
    o.second_clean_max_diag = 100; o.second_clean_min_diag_cluster = 30
    o.min_diag_cluster = 30; o.min_cluster_size = 10
    o.refine_space_dist = 50000
    o.clean_cluster_size = 100
    o.punish_anchorfreq = 10; o.anchor_per_length = 10
    o.hard_clip = True
    o.extract_diagonal_from_clean = True
    return o


def _clr(o: Options) -> Options:
    """-CLR preset (reference: lra.cpp:342-392)."""
    o.global_k = 15; o.global_w = 10; o.global_max_freq = 250
    o.global_winsize = 12; o.num_minimizers_per_window = 1
    o.local_k = 10; o.local_w = 5; o.local_max_freq = 15
    o.read_type = ReadType.CLR
    o.refine_band = 20
    o.gap_root = 1.5; o.gap_extend = 10.0; o.gap_open = 7.0
    o.initial_anchorbonus = 15.0
    o.local_mismatch = -1; o.local_indel = -2
    o.gap_ceiling1 = 1500; o.gap_ceiling2 = 3000
    o.highly_accurate = False
    o.num_aln = 2; o.print_num_aln = 1
    o.merge_dist = 100
    o.rough_cluster_max_gap = 1000
    o.max_gap = 1000
    o.clean_max_diag = 200
    o.second_clean_max_diag = 120; o.second_clean_min_diag_cluster = 10
    o.refine_space_dist = 30000
    o.min_diag_cluster = 3; o.min_cluster_size = 3
    o.remove_paired_indels = False; o.remove_spurious_anchors = False
    o.bypass_clustering = True
    o.punish_anchorfreq = 5; o.anchor_per_length = 5
    o.clean_cluster_size = 100
    o.anchors_too_sparse = 0.005
    o.hard_clip = True
    o.aln_thres = 0.50
    o.extract_diagonal_from_clean = True
    o.second_anchorbonus = 6.0
    return o


def _ont(o: Options) -> Options:
    """-ONT preset (reference: lra.cpp:393-431)."""
    o.global_k = 17; o.global_w = 10; o.global_max_freq = 150
    o.global_winsize = 15; o.num_minimizers_per_window = 1
    o.local_k = 10; o.local_w = 5; o.local_max_freq = 15
    o.read_type = ReadType.ONT
    o.gap_root = 1.5; o.gap_extend = 10.0; o.gap_open = 7.0
    o.local_mismatch = -1; o.local_indel = -2
    o.gap_ceiling1 = 1500; o.gap_ceiling2 = 3000
    o.highly_accurate = False
    o.num_aln = 2; o.print_num_aln = 1
    o.merge_dist = 100
    o.rough_cluster_max_gap = 1000
    o.max_gap = 1000
    o.clean_max_diag = 200
    o.second_clean_max_diag = 100; o.second_clean_min_diag_cluster = 10
    o.refine_space_dist = 30000
    o.min_diag_cluster = 3; o.min_cluster_size = 3
    o.remove_paired_indels = False; o.remove_spurious_anchors = False
    o.bypass_clustering = True
    o.initial_anchorbonus = 20.0
    o.punish_anchorfreq = 5; o.anchor_per_length = 5
    o.clean_cluster_size = 100
    o.anchors_too_sparse = 0.005
    o.hard_clip = True
    o.aln_thres = 0.65
    o.extract_diagonal_from_clean = True
    return o


_PRESETS = {
    ReadType.CCS: _ccs,
    ReadType.CONTIG: _contig,
    ReadType.CLR: _clr,
    ReadType.ONT: _ont,
}

# Index-build-side presets (reference: lra.cpp:884-911).  NOTE: the index CCS
# preset uses k=17 while align-side CCS uses k=25; align re-indexes when the
# on-disk index k mismatches (reference: lra.cpp:623-625).  We always build
# the index with the align-side parameters to avoid the double build.
def preset(read_type: ReadType | str, **overrides) -> Options:
    if isinstance(read_type, str):
        read_type = ReadType(read_type.lower())
    o = _PRESETS[read_type](Options())
    for key, val in overrides.items():
        if not hasattr(o, key):
            raise AttributeError(f"unknown option {key!r}")
        setattr(o, key, val)
    return o
