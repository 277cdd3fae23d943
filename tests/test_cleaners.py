"""Unit tests for chain cleaners (reference: Chain.h:278-986)."""

import numpy as np

from lra_tpu.chain.cleaners import (AnchorChain,
                                    clean_spurious_jumping_anchors,
                                    remove_small_paired_indels)


def make_chain(q, t, ln=None, s=None):
    q = np.asarray(q, np.int64)
    t = np.asarray(t, np.int64)
    ln = np.full(len(q), 20, np.int64) if ln is None else \
        np.asarray(ln, np.int64)
    s = np.zeros(len(q), np.uint8) if s is None else \
        np.asarray(s, np.uint8)
    return AnchorChain(q, t, ln, s, np.zeros(len(q), np.int64))


def test_jumping_anchors_removed_fwd():
    """End-first strand-0 chain: t must descend; a 2-anchor excursion
    that jumps up in t then returns is removed (Chain.h:285-311)."""
    q = [900, 800, 700, 600, 500]
    t = [900, 800, 2000, 1900, 500]  # anchors 2,3 jump far up then return
    ch = make_chain(q, t)
    clean_spurious_jumping_anchors(ch)
    assert list(ch.tpos) == [900, 800, 500]


def test_jumping_anchors_kept_if_long():
    """A jump of more than 3 anchors is not removed."""
    q = [900, 800, 700, 600, 500, 400, 300]
    t = [900, 800, 2000, 1950, 1900, 1850, 500]
    ch = make_chain(q, t)
    clean_spurious_jumping_anchors(ch)
    assert len(ch) == 7


def test_jumping_anchors_monotone_untouched():
    q = [900, 800, 700]
    t = [900, 800, 700]
    ch = make_chain(q, t)
    clean_spurious_jumping_anchors(ch)
    assert len(ch) == 3


def test_jumping_anchors_rev_strand():
    """Strand-1 end-first chain: t ascends; a dip below the origin that
    comes back is removed."""
    q = [900, 800, 700, 600]
    t = [100, 200, 50, 300]   # anchor 2 dips against direction
    ch = make_chain(q, t, s=[1, 1, 1, 1])
    clean_spurious_jumping_anchors(ch)
    assert list(ch.tpos) == [100, 200, 300]


def test_small_paired_indels_cancel():
    """Opposite small gaps within 3 anchors cancel: the middle anchor
    between them is dropped (Chain.h:547-600)."""
    # strand 0, end-first: diag gaps +30 then -30 around anchor 2
    q = [900, 800, 700, 600]
    t = [1000, 900, 830, 700]
    ch = make_chain(q, t)
    n0 = len(ch)
    remove_small_paired_indels(ch)
    assert len(ch) < n0
