"""Benchmark: xRT (audio-seconds processed per second per chip).

BASELINE.json metric: separate a 10 s stereo mixture with 500 EM iterations;
north-star >= 50x real-time per v5e chip. Prints ONE JSON line:
    {"metric": "xRT", "value": N, "unit": "audio-sec/sec/chip", "vs_baseline": N}
vs_baseline is xRT / 50 (the driver-set target; the reference publishes no
numbers -- BASELINE.md).

The timed region is the full device pipeline on real hardware: STFT ->
500-iteration GEM fori_loop -> Wiener separation -> ISTFT. WAV I/O and
compilation are excluded (compile is once-per-shape; the metric is steady-
state throughput).
"""
from __future__ import annotations

import json
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


def make_mixture(fs=FS, dur=DUR, seed=0, return_sources=False):
    rng = np.random.default_rng(seed)
    n = int(fs * dur)
    t = np.arange(n) / fs
    s1 = (0.4 * np.sin(2 * np.pi * (220 * t + 3 * np.sin(2 * np.pi * 0.5 * t)))
          + 0.2 * np.sin(2 * np.pi * 440 * t)
          + 0.1 * np.sin(2 * np.pi * 660 * t))
    env = (np.sin(2 * np.pi * 1.5 * t) > 0).astype(np.float64)
    s2 = 0.3 * rng.standard_normal(n) * env
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
    """Full device pipeline; jitted as one program.

    The scalar `probe` depends on both outputs, so ONE tiny host fetch
    proves the whole executable ran (the axon tunnel's block_until_ready
    is a no-op and every fetch is a full round-trip -- fetching loglik and
    a ys sample separately costs two RTTs inside the timed region)."""
    X = _stft_core(mix, window, WLEN, HOP, "fft")        # (F, N, 2)
    params, logliks = run_gem(params, X, cfg)
    _, sigma1 = annealing_endpoints(X, cfg)
    Y = separate_sources(params, X, sigma1)               # (J, F, N, 2)
    ys = [_istft_core(Y[j], window, WLEN, HOP, nsamples) for j in range(J)]
    ys = jnp.stack(ys)
    probe = logliks[-1] + 1e-12 * ys[0, 0, 0]
    return ys, logliks, probe


def _run_config(mix_d, params, cfg, window, nsamples):
    import functools
    import sys
    run = jax.jit(functools.partial(pipeline, cfg=cfg, window=window,
                                    nsamples=nsamples))
    # warm-up / compile; the probe fetch forces real completion (the axon
    # tunnel's block_until_ready does not synchronize)
    ys, logliks, probe = run(mix_d, params)
    _ = np.asarray(probe)

    # Steady-state throughput: R back-to-back dispatches, ONE probe fetch.
    # Device executions serialize in dispatch order, so the last probe
    # proves all R ran; the fetch itself costs a full tunnel round-trip
    # (~30 ms through the axon dev tunnel -- NOT device time; a local host
    # reads a scalar in ~10 us), so it is amortized over R runs rather
    # than paid per run. Per-call latency is printed to stderr alongside.
    R = 5
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(R):
            ys, logliks, probe = run(mix_d, params)
        _ = np.asarray(probe)
        times.append((time.perf_counter() - t0) / R)
    t0 = time.perf_counter()
    ys, logliks, probe = run(mix_d, params)
    _ = np.asarray(probe)
    latency = time.perf_counter() - t0
    import sys
    print(f"bench: per-call latency (incl. tunnel round-trip) "
          f"{latency:.3f}s", file=sys.stderr)
    ll = float(np.asarray(logliks[-1], np.float64))
    if not np.isfinite(ll):
        raise FloatingPointError("non-finite loglik")
    return min(times), ys


def main():
    import dataclasses
    import sys
    mix = make_mixture()
    nsamples = mix.shape[0]
    window = jnp.asarray(sine_window(WLEN), jnp.float32)
    mix_d = jax.device_put(jnp.asarray(mix))

    # shape probe for param construction
    X0 = _stft_core(mix_d, window, WLEN, HOP, "fft")
    F, N = int(X0.shape[0]), int(X0.shape[1])
    cfg = GEMConfig(niter=NITER)
    params = build_params(F, N)

    try:
        elapsed, ys = _run_config(mix_d, params, cfg, window, nsamples)
        path = "pallas" if cfg.use_pallas else "xla"
    except Exception as e:  # Pallas lowering may be unavailable on some
        print(f"bench: pallas path failed ({type(e).__name__}: {e}); "
              "falling back to XLA", file=sys.stderr)
        cfg = dataclasses.replace(cfg, use_pallas=False)
        elapsed, ys = _run_config(mix_d, params, cfg, window, nsamples)
        path = "xla-fallback"

    # quality gate: the separated images must actually separate the two
    # ground-truth sources (permutation-best SDR, printed to stderr; the
    # metric line on stdout stays throughput-only per the driver contract)
    ys = np.asarray(ys)
    _, y1, y2 = make_mixture(return_sources=True)

    def sdr(e, r):
        return 10 * np.log10(np.sum(r ** 2)
                             / max(np.sum((e - r) ** 2), 1e-12))

    best = max(min(sdr(ys[p[0]], y1), sdr(ys[p[1]], y2))
               for p in [(0, 1), (1, 0)])
    print(f"bench: separation SDR {best:.2f} dB", file=sys.stderr)
    assert best > 10.0, f"benchmark separation quality collapsed: {best:.2f} dB"

    xrt = DUR / elapsed
    print(f"bench: path={path} elapsed={elapsed:.3f}s", file=sys.stderr)
    print(json.dumps({
        "metric": "xRT",
        "value": round(float(xrt), 3),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(float(xrt / TARGET_XRT), 4),
    }))


if __name__ == "__main__":
    main()
