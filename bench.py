"""Benchmark: xRT (audio-seconds processed per second per chip).

BASELINE.json metric: separate 10 s stereo mixtures with 500 EM iterations;
north-star >= 50x real-time per v5e chip. Prints ONE JSON line:
    {"metric": "xRT", "value": N, "unit": "audio-sec/sec/chip", "vs_baseline": N}
vs_baseline is xRT / 50 (the driver-set target; the reference publishes no
numbers -- BASELINE.md).

The headline is the chip's real steady-state capability (VERDICT r2 #8):
BATCH clips through the batched GEM + Wiener path at the throughput-optimal
batch size (single-clip dispatch leaves the chip underutilized -- measured
at flagship shapes: single 169 / batch-4 198 / batch-8 202 / batch-10 204 /
batch-12 200 / batch-16 182 / batch-32 149 xRT, so the optimum is shallow
and flat across 8-10; the earlier 344
figure from tools/batch_scaling.py was at ~4.5x smaller N where per-dispatch
overhead dominates). Every
clip in the batch is a distinct mixture and every clip's separation must
pass the SDR quality gate. The timed region is the full device pipeline:
STFT -> 500-iteration GEM fori_loop -> Wiener separation -> ISTFT. WAV I/O
and compilation are excluded (compile is once-per-shape; the metric is
steady-state throughput). Falls back to XLA (no Pallas) and then to the
single-clip path if the batched program fails to build.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pyfasst_tpu.models.components import (
    FasstParams, SpectralComp, SpatialComp, init_inst_mixing,
)
from pyfasst_tpu.ops.gem import annealing_endpoints, run_gem
from pyfasst_tpu.ops.wiener import separate_sources
from pyfasst_tpu.tf.stft import _stft_core, _istft_core, sine_window
from pyfasst_tpu.utils.config import GEMConfig

FS = 44100
DUR = 10.0
WLEN = 1024
HOP = 512
NITER = 500
J, K = 2, 8
TARGET_XRT = 50.0
BATCH = 8           # throughput-optimal on v5e at flagship shapes (sweep above)
NITER_ERB = 200     # extra erblet row (its subband plane is ~10x the STFT's)


def make_mixture(fs=FS, dur=DUR, seed=0, return_sources=False):
    rng = np.random.default_rng(seed)
    n = int(fs * dur)
    t = np.arange(n) / fs
    f0 = 180.0 + 20.0 * (seed % 5)          # distinct mixtures per clip
    s1 = (0.4 * np.sin(2 * np.pi * (f0 * t
                                    + 3 * np.sin(2 * np.pi * 0.5 * t)))
          + 0.2 * np.sin(2 * np.pi * 2 * f0 * t)
          + 0.1 * np.sin(2 * np.pi * 3 * f0 * t))
    env = (np.sin(2 * np.pi * (1.0 + 0.1 * (seed % 7)) * t) > 0)
    s2 = 0.3 * rng.standard_normal(n) * env.astype(np.float64)
    a1, a2 = np.array([0.95, 0.31]), np.array([0.31, 0.95])
    y1 = s1[:, None] * a1
    y2 = s2[:, None] * a2
    mix = y1 + y2
    scale = np.max(np.abs(mix))
    if return_sources:
        return ((mix / scale).astype(np.float32),
                (y1 / scale).astype(np.float32),
                (y2 / scale).astype(np.float32))
    return (mix / scale).astype(np.float32)


def build_params(F, N, seed=0):
    rng = np.random.default_rng(seed)
    spat = tuple(SpatialComp(A=a) for a in init_inst_mixing(None, 2, 1, J))
    spec = tuple(SpectralComp(
        FB=jnp.asarray(0.5 + rng.random((F, K)), jnp.float32),
        TW=jnp.asarray(0.5 + rng.random((K, N)), jnp.float32),
        spat_ind=j) for j in range(J))
    return FasstParams(spat=spat, spec=spec)


def pipeline(mix, params, cfg, window, nsamples):
    """Full device pipeline for one clip (vmapped over the batch).

    The scalar `probe` depends on both outputs, so ONE tiny host fetch
    proves the whole executable ran (the axon tunnel's block_until_ready
    is a no-op and every fetch is a full round-trip)."""
    X = _stft_core(mix, window, WLEN, HOP, "fft")        # (F, N, 2)
    params, logliks = run_gem(params, X, cfg)
    _, sigma1 = annealing_endpoints(X, cfg)
    Y = separate_sources(params, X, sigma1)               # (J, F, N, 2)
    ys = [_istft_core(Y[j], window, WLEN, HOP, nsamples) for j in range(J)]
    ys = jnp.stack(ys)
    probe = logliks[-1] + 1e-12 * ys[0, 0, 0]
    return ys, logliks, probe


def _timed(run, args, label):
    """Warm-up + steady-state timing: R back-to-back dispatches, ONE probe
    fetch. Device executions serialize in dispatch order, so the last probe
    proves all R ran; the fetch costs a full tunnel round-trip (~30 ms on
    the axon dev tunnel -- NOT device time), amortized over R runs."""
    ys, logliks, probe = run(*args)
    _ = np.asarray(probe)
    R = 3
    times = []
    for _rep in range(3):
        t0 = time.perf_counter()
        for _i in range(R):
            ys, logliks, probe = run(*args)
        _ = np.asarray(probe)
        times.append((time.perf_counter() - t0) / R)
    ll = np.asarray(logliks, np.float64)
    if not np.all(np.isfinite(ll[..., -1])):
        raise FloatingPointError("non-finite loglik")
    print(f"bench: {label} per-dispatch {min(times):.3f}s", file=sys.stderr)
    return min(times), ys


def _sdr_gate_batch(ys_b, y_true):
    """Per-clip permutation-best min source SDR, computed ON device (the
    images are ~100 MB; only (B,) scalars cross the tunnel)."""
    yt = jnp.asarray(np.stack(y_true))                    # (B, J, T, 2)

    def clip_min_sdr(ys, yt1):
        def sdr(e, r):
            return 10.0 * jnp.log10(jnp.sum(r ** 2)
                                    / jnp.maximum(jnp.sum((e - r) ** 2),
                                                  1e-12))
        p0 = jnp.minimum(sdr(ys[0], yt1[0]), sdr(ys[1], yt1[1]))
        p1 = jnp.minimum(sdr(ys[1], yt1[0]), sdr(ys[0], yt1[1]))
        return jnp.maximum(p0, p1)

    return np.asarray(jax.jit(jax.vmap(clip_min_sdr))(ys_b, yt))


def _run_batched(cfg, window, nsamples, batch):
    import functools
    mixes, y1s, y2s = zip(*(make_mixture(seed=b, return_sources=True)
                            for b in range(batch)))
    mix_b = jax.device_put(jnp.asarray(np.stack(mixes)))
    X0 = _stft_core(jnp.asarray(mixes[0]), window, WLEN, HOP, "fft")
    F, N = int(X0.shape[0]), int(X0.shape[1])
    params_b = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[build_params(F, N, seed=b)
                                     for b in range(batch)])
    run = jax.jit(jax.vmap(functools.partial(
        pipeline, cfg=cfg, window=window, nsamples=nsamples)))
    elapsed, ys_b = _timed(run, (mix_b, params_b), f"batch-{batch}")
    sdrs = _sdr_gate_batch(ys_b, [np.stack([y1s[b], y2s[b]])
                                  for b in range(batch)])
    print("bench: per-clip min SDR "
          + " ".join(f"{s:.1f}" for s in sdrs), file=sys.stderr)
    assert float(sdrs.min()) > 60.0, \
        f"benchmark separation quality regressed: {sdrs.min():.2f} dB (measured 82+)"
    return batch * DUR / elapsed


def _run_single(cfg, window, nsamples):
    import functools
    mix, y1, y2 = make_mixture(return_sources=True)
    mix_d = jax.device_put(jnp.asarray(mix))
    X0 = _stft_core(mix_d, window, WLEN, HOP, "fft")
    F, N = int(X0.shape[0]), int(X0.shape[1])
    params = build_params(F, N)
    run = jax.jit(functools.partial(pipeline, cfg=cfg, window=window,
                                    nsamples=nsamples))
    elapsed, ys = _timed(run, (mix_d, params), "single")
    ys = np.asarray(ys)

    def sdr(e, r):
        return 10 * np.log10(np.sum(r ** 2)
                             / max(np.sum((e - r) ** 2), 1e-12))

    best = max(min(sdr(ys[p[0]], y1), sdr(ys[p[1]], y2))
               for p in [(0, 1), (1, 0)])
    print(f"bench: separation SDR {best:.2f} dB", file=sys.stderr)
    assert best > 60.0, \
        f"benchmark separation quality regressed: {best:.2f} dB (measured 82+)"
    return DUR / elapsed


def _extra_row_erblet():
    """stderr-only breadth row: the ERBlet front-end through the same
    GEM + Wiener pipeline (VERDICT r3 item 5 -- the headline is
    stereo-STFT-only). 200 iters (the uniform-hop ERBlet plane is ~10x
    the STFT's bins; the row is a throughput diagnostic, not the
    headline metric)."""
    from pyfasst_tpu.tf.erblet import ERBLetTransform

    iters = NITER_ERB
    mix = make_mixture()
    tft = ERBLetTransform(fs=FS, n_bands=48)
    cfg = GEMConfig(niter=iters)
    # analysis once, eagerly (computeTransform hosts its geometry build);
    # the timed region is GEM + Wiener + inverse on the subband plane --
    # the transform itself is a handful of FFT-sized ops, negligible
    # against `iters` EM iterations. X stays a DEVICE complex array and
    # enters jit as an ARGUMENT (axon: never capture complex constants).
    X = tft.computeTransform(mix)
    F, N = int(X.shape[0]), int(X.shape[1])
    params = build_params(F, N)

    def run(X, params):
        params, logliks = run_gem(params, X, cfg)
        _, sigma1 = annealing_endpoints(X, cfg)
        Y = separate_sources(params, X, sigma1)
        ys = jnp.stack([tft.invertTransform(Y[j], nsamples=mix.shape[0])
                        for j in range(J)])
        probe = logliks[-1] + 1e-12 * ys[0, 0, 0]
        return ys, logliks, probe

    run = jax.jit(run)
    elapsed, _ = _timed(run, (X, params), "erblet-single")
    print(f"bench: extra-row erblet48 F={F} N={N} iters={iters} "
          f"xRT={DUR / elapsed:.1f}", file=sys.stderr)


def _extra_row_general_i():
    """stderr-only breadth row: the I=3 square-root general engine
    (ops/engine_general.py) at flagship shapes, 500 iters."""
    rng = np.random.default_rng(3)
    n = int(FS * DUR)
    t = np.arange(n) / FS
    s1 = np.sin(2 * np.pi * (200 * t + 3 * np.sin(2 * np.pi * 0.5 * t)))
    s2 = rng.standard_normal(n) * (np.sin(2 * np.pi * 1.3 * t) > 0)
    mix = (np.outer(s1, [0.9, 0.5, 0.2])
           + np.outer(s2, [0.2, 0.6, 0.95])).astype(np.float32)
    mix /= np.max(np.abs(mix))
    window = jnp.asarray(sine_window(WLEN), jnp.float32)
    cfg = GEMConfig(niter=NITER)
    X0 = _stft_core(jnp.asarray(mix), window, WLEN, HOP, "fft")
    F, N = int(X0.shape[0]), int(X0.shape[1])
    rngp = np.random.default_rng(0)
    spat = tuple(SpatialComp(A=jnp.asarray(
        0.4 + np.abs(rngp.standard_normal((3, 1))), jnp.float32))
        for _ in range(J))
    spec = tuple(SpectralComp(
        FB=jnp.asarray(0.5 + rngp.random((F, K)), jnp.float32),
        TW=jnp.asarray(0.5 + rngp.random((K, N)), jnp.float32),
        spat_ind=j) for j in range(J))
    params = FasstParams(spat=spat, spec=spec)

    def run(mix_d, params):
        X = _stft_core(mix_d, window, WLEN, HOP, "fft")
        params, logliks = run_gem(params, X, cfg)
        _, sigma1 = annealing_endpoints(X, cfg)
        Y = separate_sources(params, X, sigma1)
        ys = jnp.stack([_istft_core(Y[j], window, WLEN, HOP, mix.shape[0])
                        for j in range(J)])
        probe = logliks[-1] + 1e-12 * ys[0, 0, 0]
        return ys, logliks, probe

    run = jax.jit(run)
    elapsed, _ = _timed(run, (jax.device_put(jnp.asarray(mix)), params),
                        "general-I3-single")
    print(f"bench: extra-row general-I3 F={F} N={N} iters={NITER} "
          f"xRT={DUR / elapsed:.1f}", file=sys.stderr)


def main():
    import dataclasses
    nsamples = int(FS * DUR)
    window = jnp.asarray(sine_window(WLEN), jnp.float32)
    cfg = GEMConfig(niter=NITER)

    attempts = [(cfg, BATCH, "pallas-batch"),
                (dataclasses.replace(cfg, use_pallas=False), BATCH,
                 "xla-batch"),
                (cfg, 0, "pallas-single"),
                (dataclasses.replace(cfg, use_pallas=False), 0,
                 "xla-single")]
    xrt, path = None, None
    for cfg_i, batch, name in attempts:
        try:
            xrt = (_run_batched(cfg_i, window, nsamples, batch) if batch
                   else _run_single(cfg_i, window, nsamples))
            path = name
            break
        except Exception as e:
            print(f"bench: {name} failed ({type(e).__name__}: {e})",
                  file=sys.stderr)
    if xrt is None:
        raise SystemExit("bench: every path failed")

    # stderr-only breadth rows (VERDICT r3 item 5); failures must not
    # affect the stdout contract
    for extra in (_extra_row_erblet, _extra_row_general_i):
        try:
            extra()
        except Exception as e:                    # pragma: no cover
            print(f"bench: extra row {extra.__name__} failed "
                  f"({type(e).__name__}: {e})", file=sys.stderr)

    print(f"bench: path={path} xRT={xrt:.1f}", file=sys.stderr)
    print(json.dumps({
        "metric": "xRT",
        "value": round(float(xrt), 3),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(float(xrt / TARGET_XRT), 4),
    }))


if __name__ == "__main__":
    main()
