"""Roofline account for the flagship GEM iteration (VERDICT r3 item 5).

Computes per-iteration FLOPs and HBM bytes of the three phases at the
flagship bench shapes (F=513, N=862, J=2, K=8, I=2, float32) against
TPU v5e single-chip peaks, and the attainable xRT ceiling those imply,
next to the measured numbers (docs/design.md §4).

Everything here is an analytic model with stated assumptions -- the op
counts come from the E-step algebra (ops/estep.py packed-real forms; the
design doc's measured "~150 elementwise ops + ~5 divides per bin") and
the spectral M-step's plane traffic; the point is the ORDER of the
ceiling and which resource binds each phase, not 3-digit precision.

v5e peaks (public spec): 197 bf16 TFLOP/s MXU -> ~49 f32; VPU ~3.9
f32 TFLOP/s (8x128 lanes x 4 ALUs x ~0.94 GHz, FMA=2); HBM 819 GB/s.

Usage: python tools/roofline.py
"""
from __future__ import annotations

F, N, J, K, I = 513, 862, 2, 8, 2
BINS = F * N
B4 = 4                                  # f32 bytes

VPU_FLOPS = 3.9e12
MXU_F32_FLOPS = 49e12
HBM_BPS = 819e9

# measured steady-state anatomy (docs/design.md §4, honest timings)
MEAS = {"estep_us": 58.0, "spectral_us": 53.0, "spatial_us": 8.0,
        "iter_us": 106.0, "xrt_batch8": 201.8}


def phase_estep():
    """Fused Pallas E-step: VPU elementwise algebra per (f, n) bin.

    ~150 elementwise ops + ~5 divides per bin (measured knockout count,
    design.md §4); a VPU divide is ~7 ALU-op equivalents. Traffic: the
    packed mixture plane x4 (4 f32), per-source xi writes (J), plus the
    frame-reduced statistics (O(F) -- negligible against F*N planes).
    """
    flops = BINS * (150 + 5 * 7)
    bytes_ = BINS * B4 * (4 + J)        # x4 read + xi_j writes
    return flops, bytes_


def phase_spectral():
    """IS-NMF multiplicative updates (XLA): HBM-bound plane traffic.

    Per source: read xi, rebuild V = FB @ TW (write + 2 reads for the
    num/den elementwise passes), ratio planes for the two matmul
    contractions of each factor update (FB and TW). ~8 F*N f32 planes
    per source is the design-doc estimate the fused-spectral experiment
    independently confirmed (~20 MB/iter savings available). MXU work:
    4 contractions per source of (F,N)x(N,K) shape.
    """
    bytes_ = J * 8 * BINS * B4
    flops = J * 4 * 2 * F * N * K
    return flops, bytes_


def phase_spatial():
    """Per-frequency 2x2 solves + renormalization: O(F) work, launch-
    dominated (measured ~8 us incl. loop overhead)."""
    return F * 500, F * 64 * B4


def us(flops, bytes_, engine=VPU_FLOPS):
    t_c = flops / engine * 1e6
    t_m = bytes_ / HBM_BPS * 1e6
    return t_c, t_m, max(t_c, t_m)


def main():
    fe, be = phase_estep()
    fs_, bs = phase_spectral()
    fp, bp = phase_spatial()
    ce, me, te = us(fe, be)
    cs, ms, ts = us(fs_, bs, engine=MXU_F32_FLOPS)
    cp, mp, tp = us(fp, bp)
    tot = te + ts + tp

    print(f"flagship shapes: F={F} N={N} J={J} K={K} I={I} "
          f"({BINS} bins/iter)")
    rows = [
        ("E-step (VPU)", fe / 1e6, be / 1e6, ce, me, te,
         MEAS["estep_us"]),
        ("spectral M (MXU+HBM)", fs_ / 1e6, bs / 1e6, cs, ms, ts,
         MEAS["spectral_us"]),
        ("spatial M (O(F))", fp / 1e6, bp / 1e6, cp, mp, tp,
         MEAS["spatial_us"]),
    ]
    print(f"{'phase':<22}{'MFLOP':>7}{'MB':>7}{'t_comp':>8}{'t_mem':>7}"
          f"{'roof us':>9}{'meas us':>9}{'gap':>6}")
    for name, mf, mb, tc, tm, t, m in rows:
        print(f"{name:<22}{mf:>7.1f}{mb:>7.1f}{tc:>8.1f}{tm:>7.1f}"
              f"{t:>9.1f}{m:>9.1f}{m / t:>6.1f}x")
    print(f"{'TOTAL iteration':<22}{'':>7}{'':>7}{'':>8}{'':>7}"
          f"{tot:>9.1f}{MEAS['iter_us']:>9.1f}"
          f"{MEAS['iter_us'] / tot:>6.1f}x")

    # xRT ceilings: 500 iterations + ~6 ms front/back (STFT+Wiener+ISTFT)
    niter, dur = 500, 10.0
    over_s = 6e-3
    ceil_single = dur / (niter * tot * 1e-6 + over_s)
    # batch-8 amortizes the per-dispatch overhead but not per-bin work
    ceil_batch = 8 * dur / (8 * niter * tot * 1e-6 + over_s + 14e-3)
    print(f"\nxRT ceiling single-clip: {ceil_single:.0f}   "
          f"batch-8: {ceil_batch:.0f}   measured batch-8: "
          f"{MEAS['xrt_batch8']:.0f} "
          f"({ceil_batch / MEAS['xrt_batch8']:.2f}x from roofline)")


if __name__ == "__main__":
    main()
