"""Device-efficiency microbenchmarks (VERDICT r2 item 2).

Times the hot kernels standalone on the real chip (steady-state
dispatch + block_until_ready over many iterations, inputs resident on
device) and prints a table with achieved element/cell/anchor rates, an
arithmetic-throughput estimate, and an MFU-style fraction of the
assumed VPU peak.

All hot kernels here are VPU (elementwise/select) work, not MXU matmuls
— the right peak is the vector unit's.  Assumed v5e peaks (per chip):
  MXU bf16: 197 TFLOP/s (unused by these kernels)
  VPU f32:  ~0.9 TFLOP/s  (8 ALUs x 1024 lanes x 2 ops/cycle-ish at
            ~940MHz x 1/16... the public number is not precisely
            documented; this is the conventional ~0.5-1 TFLOP/s band —
            treat the MFU column as order-of-magnitude)

Run alone (the tunneled chip starves under two workloads).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

# f32 elementwise ops/s assumed for MFU estimates.  The public number
# is not documented; 0.9e12 made the blocked-SDP row read 167%, so the
# true peak is at least ~2e12 — treat the MFU column as order-of-
# magnitude only (the rate and ms columns are the measurements).
VPU_PEAK = 2.0e12


def timeit(fn, iters=10):
    """Median device time of fn() with the d2h transfer subtracted.

    block_until_ready does NOT wait for remote completion on the
    tunneled axon backend (verified: one_gap at B=64..1024 all returned
    ~0.08ms), so the only reliable fence is materializing the output;
    a same-size resident-buffer download is timed as the baseline and
    subtracted."""
    import jax

    r = fn()  # warm (compile)
    out = np.asarray(r)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    dummy = jax.device_put(out)
    db = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(dummy + 0)
        db.append(time.perf_counter() - t0)
    return max(1e-6, float(np.median(ts)) - float(np.median(db)))


def bench_chain_blocked():
    import jax
    import jax.numpy as jnp

    from lra_tpu import preset
    from lra_tpu.ops.gapcost import from_options
    from lra_tpu.ops.sdp_blocked import chain_scores_blocked

    B, N, L = 64, 2048, 64
    rng = np.random.default_rng(0)
    qS = np.sort(rng.integers(0, 100000, (B, N)).astype(np.int32), axis=1)
    ln = rng.integers(15, 60, (B, N)).astype(np.int32)
    qE = qS + ln
    tS = qS + rng.integers(-500, 500, (B, N)).astype(np.int32) + 10000
    tE = tS + ln
    sc = ln.astype(np.float32)
    l1 = np.ones((B, N), bool)
    l2 = np.ones((B, N), bool)
    va = np.ones((B, N), bool)
    key = from_options(preset("ccs")).static_key()
    args = [jax.device_put(a) for a in (qS, qE, tS, tE, sc, l1, l2, va)]

    def fn():
        V, bp, lane = chain_scores_blocked(*args, key, L=L)
        return V

    dt = timeit(fn)
    anchors = B * N
    pairs = B * N * N  # candidate pairs evaluated (near+in-block), per lane
    # per pair: 2 lanes x (PWL ~45 select-chain ops + ~12 mask/max ops)
    flops = pairs * 2 * 57
    return ("chain_scores_blocked (SDP)", f"B={B} N={N} L={L}",
            f"{anchors/dt/1e6:.1f}M anchors/s",
            f"{pairs/dt/1e9:.2f}G pairs/s", flops / dt, dt)


def bench_banded():
    import jax

    from lra_tpu.ops.affine_kernel import banded_global_traced_packed

    B, S, K = 1024, 256, 30
    rng = np.random.default_rng(1)
    t = rng.integers(0, 4, (B, S)).astype(np.int8)
    q = t.copy()
    mut = rng.random((B, S)) < 0.05
    q[mut] = (q[mut] + 1) % 4
    qlen = np.full(B, S, np.int32)
    tlen = np.full(B, S, np.int32)
    kband = np.full(B, 2 * K, np.int32)
    qd, td, qld, tld, kbd = (jax.device_put(a)
                             for a in (q, t, qlen, tlen, kband))

    def fn():
        return banded_global_traced_packed(qd, td, qld, tld, 2 * K, 4, -3,
                                           -4, kband=kbd)

    dt = timeit(fn)
    cells = B * S * (2 * (2 * K) + 1)
    # per cell: ~8 DP ops + ~7 closure (log2 band) + ~6 arrow/mask
    flops = cells * 21 + B * (2 * S) * 12   # + traceback scan
    return ("banded_global + device traceback", f"B={B} S={S} band={4*K+1}",
            f"{cells/dt/1e9:.2f}G cells/s",
            f"{B/dt:.0f} problems/s", flops / dt, dt)


def bench_windowed():
    import jax

    from lra_tpu import preset
    from lra_tpu.ops.gapcost import from_options
    from lra_tpu.ops.sdp_windowed import chain_scores_windowed, far_schedule

    B, N, L, W = 1, 49152, 64, 4096
    rng = np.random.default_rng(2)
    qS = np.sort(rng.integers(0, 1_000_000, (B, N)).astype(np.int32), 1)
    ln = rng.integers(15, 60, (B, N)).astype(np.int32)
    qE = qS + ln
    tS = qS + rng.integers(-2000, 2000, (B, N)).astype(np.int32) + 10000
    tE = tS + ln
    sc = ln.astype(np.float32)
    ones = np.ones((B, N), bool)
    sch = far_schedule(qS[0], qE[0], tS[0], tE[0], ones[0], ones[0],
                       ones[0], L)
    key = from_options(preset("contig")).static_key()
    stack = [qS, qE, tS, tE, sc, ones, ones, ones]
    stack += [sch[k][None] for k in ("perm1", "perm2", "ok1", "ok2",
                                     "qer1", "qer2", "rank1", "rank2",
                                     "ins_hi")]
    dargs = [jax.device_put(a) for a in stack]

    def fn():
        V, bp, lane = chain_scores_windowed(*dargs, key, L=L, W=W)
        return V

    dt = timeit(fn, iters=4)
    pairs = B * N * (W + L)
    flops = pairs * 2 * 57
    return ("chain_scores_windowed (large-N SDP)",
            f"B={B} N={N} W={W}", f"{B*N/dt/1e6:.2f}M anchors/s",
            f"{pairs/dt/1e9:.2f}G pairs/s", flops / dt, dt)


def bench_one_gap():
    import jax

    from lra_tpu.ops.one_gap import one_gap_traced, pack_one_gap_bucket

    B, K, D = 256, 16, 256
    rng = np.random.default_rng(3)
    qs, ts = [], []
    for _ in range(B):
        small = int(rng.integers(120, 250))
        gap = int(rng.integers(200, 5000))
        sm = rng.integers(0, 4, small).astype(np.uint8)
        bg = np.concatenate([sm[:small // 2],
                             rng.integers(0, 4, gap).astype(np.uint8),
                             sm[small // 2:]])
        if rng.random() < 0.5:
            qs.append(sm), ts.append(bg)
        else:
            qs.append(bg), ts.append(sm)
    kb = np.full(B, 15, np.int32)
    qh, th, qt, tt, qlen, tlen = pack_one_gap_bucket(qs, ts, K, D)
    L = 2 * (D + K) + 8
    args = [jax.device_put(a) for a in (qh, th, qt, tt, qlen, tlen, kb)]

    def fn():
        ops, jump, score = one_gap_traced(*args, K, D, 4, -3, -4, L)
        return ops

    dt = timeit(fn)
    cells = B * 2 * (D + K) * (2 * K + 4)
    flops = cells * 30
    return ("one_gap_traced (SV long-gap)", f"B={B} D={D} K={K}",
            f"{cells/dt/1e9:.2f}G cells/s",
            f"{B/dt:.0f} problems/s", flops / dt, dt)


def main():
    rows = [bench_banded(), bench_chain_blocked(), bench_windowed(),
            bench_one_gap()]
    print("| kernel | config | rate | aux rate | est GFLOP/s | VPU-MFU | ms |")
    print("|---|---|---|---|---|---|---|")
    for name, cfg, rate, aux, fps, dt in rows:
        print(f"| {name} | {cfg} | {rate} | {aux} | {fps/1e9:.0f} | "
              f"{fps/VPU_PEAK*100:.1f}% | {dt*1e3:.1f} |")


if __name__ == "__main__":
    main()
