"""Anchor-chain cleaners (reference: Chain.h:547-986).

Chains are stored end-first (descending read coordinate), matching the
reference's traceback order; the cleaners' sign conventions depend on it.

UltimateChain here is a struct-of-arrays: (qpos, tpos, length, strand,
cluster) per anchor.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class AnchorChain:
    qpos: np.ndarray     # int64, end-first (descending)
    tpos: np.ndarray     # chrom-local
    length: np.ndarray
    strand: np.ndarray   # uint8 per anchor
    cluster: np.ndarray  # originating extended-cluster index
    second_sdp_value: float = 0.0

    def __len__(self):
        return len(self.qpos)

    def take(self, keep: np.ndarray) -> None:
        self.qpos = self.qpos[keep]
        self.tpos = self.tpos[keep]
        self.length = self.length[keep]
        self.strand = self.strand[keep]
        self.cluster = self.cluster[keep]


def _gaps(ch: AnchorChain):
    """Per-adjacent-pair diagonal gap (reference sign conventions:
    Chain.h:556-575)."""
    n = len(ch)
    sv = np.zeros(n, dtype=np.int64)      # 0 means strand flip or no entry
    has = np.zeros(n, dtype=bool)
    q, t, ln, s = ch.qpos, ch.tpos, ch.length, ch.strand
    for c in range(1, n):
        if s[c] == s[c - 1]:
            if s[c] == 0:
                gap = (t[c] - q[c]) - (t[c - 1] - q[c - 1])
            else:
                gap = (q[c] + ln[c] + t[c]) - (q[c - 1] + ln[c - 1] + t[c - 1])
            sv[c] = gap
            has[c] = True
        else:
            sv[c] = 0
            has[c] = True
    return sv, has


def remove_small_paired_indels(ch: AnchorChain) -> None:
    """reference: Chain.h:547-600 (RemoveSmallPairedIndels)."""
    n = len(ch)
    if n < 2:
        return
    sv_list, pos_list = [], []
    q, t, ln, s = ch.qpos, ch.tpos, ch.length, ch.strand
    for c in range(1, n):
        if s[c] == s[c - 1]:
            if s[c] == 0:
                gap = int((t[c] - q[c]) - (t[c - 1] - q[c - 1]))
            else:
                gap = int((q[c] + ln[c] + t[c]) - (q[c - 1] + ln[c - 1] + t[c - 1]))
            if 5 < abs(gap) <= 50:
                sv_list.append(gap)
                pos_list.append(c)
        else:
            sv_list.append(0)
            pos_list.append(c)
    remove = np.zeros(n, dtype=bool)
    for c in range(1, len(sv_list)):
        a, b = sv_list[c - 1], sv_list[c]
        if (a != 0 and b != 0 and (a >= 0) != (b >= 0)
                and abs(a + b) <= 20 and pos_list[c] - pos_list[c - 1] < 3):
            for i in range(pos_list[c - 1], pos_list[c]):
                if ln[i] <= 50:
                    remove[i] = True
    if remove.any():
        ch.take(~remove)


def remove_paired_indels(ch: AnchorChain, refine_ends: bool = True) -> None:
    """reference: Chain.h:607-750 (RemovePairedIndels): cancel opposite
    >=300b or sum<100 paired gaps; optional end trim via mean+4sd of
    inter-anchor distance."""
    n = len(ch)
    if n < 2:
        return
    q, t, ln, s = ch.qpos, ch.tpos, ch.length, ch.strand
    remove = np.zeros(n, dtype=bool)

    dists = []
    if refine_ends:
        for c in range(1, n):
            tdist = (t[c] - (t[c - 1] + ln[c - 1])
                     if t[c] > t[c - 1] + ln[c - 1]
                     else t[c - 1] - (t[c] + ln[c]))
            # reference computes qDist with a t/q typo (Chain.h:633);
            # we use the sane q distance
            qdist = (q[c] - (q[c - 1] + ln[c - 1])
                     if q[c] > q[c - 1] + ln[c - 1]
                     else q[c - 1] - (q[c] + ln[c]))
            dists.append(min(int(tdist), int(qdist)))
        dists = np.array(dists, dtype=np.float64)
        mean = dists.mean()
        sd = np.sqrt(max(0.0, (dists ** 2).mean() - mean ** 2))

    sv_list, pos_list = [], []
    for c in range(1, n):
        if s[c] == s[c - 1]:
            if s[c] == 0:
                gap = int((t[c] - q[c]) - (t[c - 1] - q[c - 1]))
            else:
                gap = int((q[c] + ln[c] + t[c]) - (q[c - 1] + ln[c - 1] + t[c - 1]))
            if abs(gap) > 30:
                sv_list.append(gap)
                pos_list.append(c)
        else:
            sv_list.append(0)
            pos_list.append(c)
    for c in range(1, len(sv_list)):
        a, b = sv_list[c - 1], sv_list[c]
        if a == 0 or b == 0 or (a >= 0) == (b >= 0):
            continue
        if pos_list[c] - pos_list[c - 1] >= 3:
            continue
        if (abs(a) >= 300 and abs(b) >= 300) or abs(a + b) < 100:
            for i in range(pos_list[c - 1], pos_list[c]):
                if ln[i] < 100:
                    remove[i] = True

    if refine_ends and len(dists):
        thresh = mean + 4 * sd
        valid = np.nonzero(dists < thresh)[0]
        if len(valid) == 0:
            remove |= ln < 100
        else:
            first_valid = int(valid[0])       # dist index c-1 -> anchors c-1,c
            last_valid = int(valid[-1]) + 1
            if 0 < first_valid < 3:
                for i in range(first_valid):
                    if ln[i] < 100:
                        remove[i] = True
            if n - last_valid < 3 and last_valid + 1 <= n:
                for i in range(last_valid + 1, n):
                    if ln[i] < 100:
                        remove[i] = True
    if remove.any():
        ch.take(~remove)


def clean_spurious_jumping_anchors(ch: AnchorChain) -> None:
    """reference: Chain.h:278-329 (UltimateChain::CleanSpuriousJumpingAnchors).

    Chains are end-first (descending q), so t should descend on strand 0
    and ascend on strand 1.  A run of <=3 anchors that jumps against that
    direction and then returns past the jump origin is removed.  NOTE:
    the reference declares and defines this cleaner but never calls it
    (no call site in the tree); it is provided for API parity and is
    likewise not wired into the pipelines.
    """
    n = len(ch)
    if n < 2:
        return
    t, ln, s = ch.tpos, ch.length, ch.strand
    remove = np.zeros(n, dtype=bool)
    jump = -1
    jump_tpos = 0
    cur = 0
    for im in range(n - 1):
        cur = im + 1
        prev = im
        if jump == -1:
            if s[cur] == s[prev]:
                if s[cur] == 0:
                    if t[cur] + ln[cur] > t[prev]:
                        jump, jump_tpos = cur, int(t[prev])
                else:
                    if t[cur] < t[prev] + ln[prev]:
                        jump, jump_tpos = cur, int(t[prev] + ln[prev])
        else:
            if s[cur] == 0:
                if t[cur] + ln[cur] <= jump_tpos and cur - jump <= 3:
                    remove[jump:cur] = True
                    jump = -1
            else:
                if t[cur] >= jump_tpos and cur - jump <= 3:
                    remove[jump:cur] = True
                    jump = -1
    if jump != -1 and cur - jump <= 3:
        remove[jump:cur + 1] = True
    if remove.any():
        ch.take(~remove)


def remove_spurious_anchors(ch: AnchorChain) -> None:
    """reference: Chain.h:828-895: between two >=500 diagonal jumps within
    10 anchors, drop the short (<50) anchors if none is >=50."""
    n = len(ch)
    if n < 2:
        return
    q, t, ln, s = ch.qpos, ch.tpos, ch.length, ch.strand
    sv_list, pos_list = [], []
    for c in range(1, n):
        if s[c] == s[c - 1]:
            if s[c] == 0:
                gap = int((t[c] - q[c]) - (t[c - 1] - q[c - 1]))
            else:
                gap = int((q[c] + ln[c] + t[c]) - (q[c - 1] + ln[c - 1] + t[c - 1]))
            if abs(gap) >= 500:
                sv_list.append(gap)
                pos_list.append(c)
        else:
            sv_list.append(0)
            pos_list.append(c)
    remove = np.zeros(n, dtype=bool)
    for c in range(1, len(sv_list)):
        if sv_list[c] != 0 and sv_list[c - 1] != 0 and \
           pos_list[c] - pos_list[c - 1] <= 10:
            span = range(pos_list[c - 1], pos_list[c])
            if not any(ln[i] >= 50 for i in span):
                for i in span:
                    if ln[i] < 50:
                        remove[i] = True
    if remove.any():
        ch.take(~remove)
