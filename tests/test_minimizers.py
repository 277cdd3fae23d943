import numpy as np
import pytest

from lra_tpu import seq as sequtils
from lra_tpu.index.minimizers import kmer_codes, minimizers, _sliding_min


def brute_kmer(codes, i, k):
    v = 0
    for j in range(k):
        v = (v << 2) | int(codes[i + j] & 3)
    return v


def brute_rc_kmer(codes, i, k):
    v = 0
    for j in range(k - 1, -1, -1):
        v = (v << 2) | (3 - int(codes[i + j] & 3))
    return v


def brute_minimizers(codes, k, w, canonical=True):
    """Independent re-derivation: per-window leftmost min, distinct by pos
    (the exact=False rule)."""
    n = len(codes) - k + 1
    if n < w:
        return []
    vals = []
    for i in range(n):
        f = brute_kmer(codes, i, k)
        r = brute_rc_kmer(codes, i, k)
        valid = all(codes[i + j] < 4 for j in range(k))
        if canonical:
            vals.append((min(f, r), int(r < f), valid))
        else:
            vals.append((f, 0, valid))
    out = []
    last_pos = None
    for j in range(n - w + 1):
        window = vals[j:j + w]
        if not all(v[2] for v in window):
            continue
        best = min(range(w), key=lambda x: window[x][0])
        pos = j + best
        if pos != last_pos:
            out.append((window[best][0], pos, window[best][1]))
            last_pos = pos
    return out


def ref_oracle(codes, k, w, canonical=True):
    """Direct transliteration of the reference streaming state machine
    (MinCount.h:8-179) — the exact=True oracle: change-driven emission,
    keep-older slide ties, circular-buffer expiry recompute (ties to the
    smallest pos %% w), unmasked first-window compare, tracked-valid-span
    N gating."""
    L = len(codes)
    span = w + k - 1
    out = []
    if L < k or L < span:
        return out
    mask = (1 << (2 * k)) - 1
    fwd = rc = 0
    mvs, strs = [], []
    for i in range(L):
        c = int(codes[i])
        b = 0 if c >= 4 else c
        fwd = ((fwd << 2) | b) & mask
        rc = (rc >> 2) | ((3 - b) << (2 * (k - 1)))
        if i >= k - 1:
            if canonical and rc < fwd:
                mvs.append(rc)
                strs.append(1)
            else:
                mvs.append(fwd)
                strs.append(0)
    nk = L - k + 1
    MSB = 1 << 63

    def unm(p):
        return mvs[p] | (MSB if strs[p] else 0)

    def search(start):
        valid = False
        while start < L - span and not valid:
            valid = True
            for n in range(start, start + span):
                if codes[n] > 3:
                    start = n + 1
                    valid = False
                    break
        return start, valid

    nvs, valid = search(0)
    if not valid:
        return out
    nve = nvs + span
    active, abest = 0, unm(0)
    ring = [0] * w
    for p in range(1, w):
        ring[p % w] = p
        if unm(p) < abest:
            abest, active = unm(p), p
    if nve == span:
        out.append((mvs[active], active, strs[active]))
    for p in range(w, nk):
        b = p + k - 1
        if nve == b:
            if codes[b] <= 3:
                nve += 1
            else:
                nvs, valid = search(p + k)
                if not valid:
                    return out
                nve = nvs + span
        ring[p % w] = p
        if active <= p - w:
            best = ring[0]
            for j in range(1, w):
                if mvs[ring[j]] < mvs[best]:
                    best = ring[j]
            active = best
            if nve == p + k:
                out.append((mvs[active], active, strs[active]))
        elif mvs[p] < mvs[active]:
            active = p
            if nve == p + k:
                out.append((mvs[active], active, strs[active]))
    return out


@pytest.mark.parametrize("k,w", [(5, 3), (15, 10), (25, 20)])
@pytest.mark.parametrize("exact", [False, True])
def test_minimizers_match_bruteforce(rng, k, w, exact):
    codes = rng.integers(0, 4, size=800).astype(np.uint8)
    t, p, s = minimizers(codes, k, w, exact=exact)
    oracle = ref_oracle if exact else brute_minimizers
    expected = oracle(codes, k, w)
    got = list(zip(t.tolist(), p.tolist(), s.tolist()))
    assert got == expected
    assert (np.diff(p.astype(np.int64)) > 0).all()


@pytest.mark.parametrize("exact", [False, True])
def test_minimizers_skip_n_windows(rng, exact):
    codes = rng.integers(0, 4, size=300).astype(np.uint8)
    codes[100:110] = 4  # N block
    k, w = 15, 10
    t, p, s = minimizers(codes, k, w, exact=exact)
    oracle = ref_oracle if exact else brute_minimizers
    expected = oracle(codes, k, w)
    assert list(zip(t.tolist(), p.tolist(), s.tolist())) == expected
    # no minimizer k-mer may overlap the N block
    for pos in p:
        assert pos + k <= 100 or pos >= 110


def test_exact_homopolymer_emission_density(rng):
    """In a long equal-tuple run the reference emits ~1 occurrence per w
    (keep-older ties + expiry recompute), the leftmost rule one per
    position — the headline behavioral delta between the two modes."""
    codes = np.zeros(200, np.uint8)  # poly-A
    k, w = 15, 10
    t_e, p_e, _ = minimizers(codes, k, w, exact=True)
    t_l, p_l, _ = minimizers(codes, k, w, exact=False)
    nk = 200 - k + 1
    assert len(p_l) == nk - w + 1          # every window start
    assert len(p_e) <= nk // w + 2          # ~one per w
    assert list(zip(t_e.tolist(), p_e.tolist(), (0,) * len(p_e))) == \
        ref_oracle(codes, k, w)


def test_exact_python_fallback_matches_native(rng):
    """The numpy event-chain and the C++ state machine are bit-identical
    on random + N + homopolymer-salted inputs (both modes)."""
    from lra_tpu import native
    from lra_tpu.index.minimizers import _minimizers_exact_np

    if not native.available():
        pytest.skip("native library unavailable")
    for trial in range(60):
        L = int(rng.integers(30, 600))
        k = int(rng.integers(3, 16))
        w = int(rng.integers(2, 12))
        codes = rng.integers(0, 4, L).astype(np.uint8)
        if trial % 3 == 0:
            codes[rng.integers(0, L, 3)] = 4
        if trial % 4 == 0 and L > 40:
            s = int(rng.integers(0, L - 30))
            codes[s:s + 30] = 1
        for canonical in (True, False):
            a = native.minimizers(codes, k, w, canonical, True)
            b = _minimizers_exact_np(codes, k, w, canonical)
            for x, y in zip(a, b):
                assert np.array_equal(x, y), (trial, k, w, canonical)


def test_kmer_codes_first_base_high_bits():
    codes = sequtils.encode("ACGTA")
    fwd, rc, valid = kmer_codes(codes, 3)
    # ACG = 0b000110
    assert fwd[0] == 0b000110
    # rc(ACG) = CGT = 0b011011
    assert rc[0] == 0b011011
    assert valid.all()


def test_canonical_strand_consistency(rng):
    """minimizers of revcomp(read) mirror those of the read."""
    codes = rng.integers(0, 4, size=500).astype(np.uint8)
    k, w = 15, 10
    t_f, p_f, s_f = minimizers(codes, k, w)
    t_r, p_r, s_r = minimizers(sequtils.revcomp(codes), k, w)
    # canonical tuples are strand-invariant: the multisets largely coincide
    # (window boundary effects at the ends can differ)
    inter = np.intersect1d(t_f, t_r)
    assert len(inter) >= 0.9 * min(len(t_f), len(t_r))


def test_sliding_min_leftmost(rng):
    vals = rng.integers(0, 10, size=200).astype(np.uint64)
    for w in (2, 3, 7, 16):
        mv, mp = _sliding_min(vals, w)
        for j in range(len(vals) - w + 1):
            window = vals[j:j + w]
            assert mv[j] == window.min()
            assert mp[j] == j + int(np.argmin(window))


def test_parallel_index_build_identical(rng):
    """threads=N builds a bit-identical index to threads=1 (cli -t for
    `lra_tpu index`; extraction is per-chromosome, collected in order)."""
    from lra_tpu import preset
    from lra_tpu.index.global_index import build_global_index
    from lra_tpu.index.local_index import build_genome_local_index
    from lra_tpu.io.genome import Genome

    seqs = [(f"chr{i}", rng.integers(0, 4, size=20000 + 777 * i)
             .astype(np.uint8)) for i in range(5)]
    genome = Genome.from_seqs([(n, sequtils.decode(c)) for n, c in seqs])
    opts = preset("ccs")
    g1 = build_global_index(genome, opts, threads=1)
    g4 = build_global_index(genome, opts, threads=4)
    assert np.array_equal(g1.tuples, g4.tuples)
    assert np.array_equal(g1.pos, g4.pos)
    assert np.array_equal(g1.strand, g4.strand)
    l1 = build_genome_local_index(genome, threads=1)
    l4 = build_genome_local_index(genome, threads=4)
    for f in ("tuples", "pos", "seq_offsets", "tuple_bounds"):
        assert np.array_equal(getattr(l1, f), getattr(l4, f)), f
