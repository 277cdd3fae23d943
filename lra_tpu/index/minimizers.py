"""Vectorized minimizer extraction.

Semantics follow the reference's streaming state machine
(reference: MinCount.h:8-179 ``StoreMinimizers`` and
MinCount.h:182-338 ``StoreMinimizers_noncanonical``):

* k-mers packed 2 bits/base, first base in the highest bits
  (reference: TupleOps.h:104-112 ``StoreTuple``).
* canonical mode takes min(fwd, revcomp) per position; the chosen strand is
  recorded (the reference packs it into the tuple MSB via ``rev_mask_s``,
  lra.cpp:1008-1027 — we keep a separate strand array, which is equivalent
  because all tuple comparisons mask that bit out).
* windowed minimum over ``w`` consecutive k-mer positions; one minimizer
  occurrence is emitted per distinct (tuple, pos) across sliding windows.
* windows overlapping an N produce nothing (reference: MinCount.h:21-41,
  106-131 valid-window scan).

Tie-breaking inside a window: we take the *leftmost* minimal k-mer.  The
reference keeps the older active minimizer when sliding (MinCount.h:91,164)
but recomputes through a circular buffer on expiry (MinCount.h:148-154),
which for duplicated minimal tuples inside one window can pick a different
occurrence.  With the odd k of every preset, duplicate minimal tuples within
a <=20bp window are vanishingly rare; the leftmost rule is self-consistent
between index and read sides.

The extraction is pure array code (numpy here, identical jnp formulation on
device) — no per-base scalar loop.
"""

from __future__ import annotations

import numpy as np

_STRAND_BIT = np.uint64(1) << np.uint64(63)


def kmer_codes(codes: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pack all k-mers of a 2-bit code array.

    Returns (fwd, rc, valid): fwd[i]/rc[i] are the forward and
    reverse-complement packings of codes[i:i+k]; valid[i] is False if the
    window contains an N.
    """
    n = len(codes) - k + 1
    if n <= 0:
        e = np.zeros(0, dtype=np.uint64)
        return e, e.copy(), np.zeros(0, dtype=bool)
    base = codes.astype(np.uint64)
    safe = base & np.uint64(3)
    comp = np.uint64(3) - safe
    fwd = np.zeros(n, dtype=np.uint64)
    rc = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        fwd += safe[j:j + n] << np.uint64(2 * (k - 1 - j))
        rc += comp[j:j + n] << np.uint64(2 * j)
    bad = (codes > 3).astype(np.int32)
    cs = np.concatenate([[0], np.cumsum(bad)])
    valid = (cs[k:] - cs[:-k]) == 0
    return fwd, rc, valid


def _sliding_min(vals: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Windowed minimum with leftmost tie-break via doubling sparse table.

    Returns (minval, argpos) for each of the len(vals)-w+1 windows.
    O(L log w) work, fully vectorized.
    """
    n = len(vals)
    pos = np.arange(n, dtype=np.int64)
    v, p = vals.copy(), pos
    span = 1
    while span * 2 <= w:
        m = len(v) - span
        left_v, right_v = v[:m], v[span:]
        left_p, right_p = p[:m], p[span:]
        take_left = left_v <= right_v
        v = np.where(take_left, left_v, right_v)
        p = np.where(take_left, left_p, right_p)
        span *= 2
    # combine two (possibly overlapping) spans covering the window
    m = n - w + 1
    off = w - span
    lv, rv = v[:m], v[off:off + m]
    lp, rp = p[:m], p[off:off + m]
    take_left = lv <= rv
    return np.where(take_left, lv, rv), np.where(take_left, lp, rp)


def minimizers(
    codes: np.ndarray, k: int, w: int, canonical: bool = True
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Extract minimizer occurrences from a 2-bit code array.

    Returns (tuples, positions, strands), positions strictly increasing.
    strands is all-zero when canonical=False.  Uses the native C++
    extractor when built (identical output; see native/lra_native.cpp).
    """
    empty = (np.zeros(0, np.uint64), np.zeros(0, np.uint32), np.zeros(0, np.uint8))
    if len(codes) < k + w - 1:
        return empty
    from .. import native
    res = native.minimizers(codes, k, w, canonical) if native.available() \
        else None
    if res is not None:
        return res
    fwd, rc, valid = kmer_codes(codes, k)
    if canonical:
        use_rc = rc < fwd  # ties -> forward (k odd => no self-RC ties)
        canon = np.where(use_rc, rc, fwd)
        strand = use_rc.astype(np.uint8)
    else:
        canon = fwd
        strand = np.zeros(len(fwd), dtype=np.uint8)

    # Mask invalid k-mers so they never win a window minimum; windows touching
    # them are dropped anyway.
    canon_m = np.where(valid, canon, np.uint64(0xFFFFFFFFFFFFFFFF))
    _, argpos = _sliding_min(canon_m, w)

    # window j covers k-mers [j, j+w); valid iff all its k-mers are valid
    vcs = np.concatenate([[0], np.cumsum(valid.astype(np.int32))])
    win_valid = (vcs[w:] - vcs[:-w]) == w

    # one occurrence per distinct argmin position among valid windows
    argpos = argpos[win_valid]
    if len(argpos) == 0:
        return empty
    keep = np.empty(len(argpos), dtype=bool)
    keep[0] = True
    np.not_equal(argpos[1:], argpos[:-1], out=keep[1:])
    occ = argpos[keep]
    return canon[occ], occ.astype(np.uint32), strand[occ]
