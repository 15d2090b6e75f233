"""Profile the batched GEM path vs the single-clip path on real hardware.

VERDICT round-1 item #3: configs[4] reported an aggregate batched xRT ~3x
WORSE than running clips sequentially. This tool isolates where the loss is:

  a) single-clip run_gem (the bench flagship path)
  b) 8 sequential single-clip runs (the "for loop" strawman)
  c) vmapped batch (batched_run_gem's core) on the Pallas E-step
  d) vmapped batch on the XLA E-step (use_pallas=False)

All runs use identical shapes/iteration counts; timing fetches a small
result to host (axon's block_until_ready is a no-op). Prints one line per
variant to stderr and a JSON summary to stdout.
"""
from __future__ import annotations

import dataclasses
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import build_params  # noqa: E402
from pyfasst_tpu.ops.gem import run_gem  # noqa: E402
from pyfasst_tpu.parallel.sharding import batch_params  # noqa: E402
from pyfasst_tpu.utils.config import GEMConfig  # noqa: E402

F, N = 513, 862          # bench flagship shapes (10 s @ 44.1 kHz, wlen 1024)
B = 8
NITER = 100


def make_X(key, shape):
    """Complex mixture synthesized ON DEVICE (complex host->device uploads
    abort on the axon backend -- CLAUDE.md)."""
    kr, ki = jax.random.split(key)
    return jax.lax.complex(jax.random.normal(kr, shape, jnp.float32),
                           jax.random.normal(ki, shape, jnp.float32))


def timeit(fn, fetch, n=3):
    fetch(fn())                                   # warm-up / compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fetch(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    cfg = GEMConfig(niter=NITER)
    cfg_xla = dataclasses.replace(cfg, use_pallas=False)
    key = jax.random.PRNGKey(0)
    X1 = make_X(key, (F, N, 2))
    Xb = make_X(key, (B, F, N, 2))
    params1 = build_params(F, N)
    params_b = batch_params([build_params(F, N, seed=b) for b in range(B)])

    def fetch1(out):
        _, ll = out
        return np.asarray(ll[-1])

    def fetchb(out):
        _, ll = out
        return np.asarray(ll[-1, -1])

    results = {}

    t = timeit(lambda: run_gem(params1, X1, cfg), fetch1)
    results["single_pallas"] = t
    print(f"single pallas:        {t:.3f}s  ({t / NITER * 1e6:.0f} us/iter)",
          file=sys.stderr)

    t = timeit(lambda: run_gem(params1, X1, cfg_xla), fetch1)
    results["single_xla"] = t
    print(f"single xla:           {t:.3f}s  ({t / NITER * 1e6:.0f} us/iter)",
          file=sys.stderr)

    def seq8():
        out = None
        for b in range(B):
            out = run_gem(jax.tree.map(lambda a: a[b], params_b),
                          Xb[b], cfg)
        return out

    t = timeit(seq8, fetch1)
    results["seq8_pallas"] = t
    print(f"8 sequential pallas:  {t:.3f}s  ({t / B:.3f}s/clip)",
          file=sys.stderr)

    vb = jax.jit(lambda p, X: jax.vmap(
        functools.partial(run_gem, cfg=cfg))(p, X))
    t = timeit(lambda: vb(params_b, Xb), fetchb)
    results["batch8_pallas"] = t
    print(f"batch-8 vmap pallas:  {t:.3f}s  ({t / B:.3f}s/clip)",
          file=sys.stderr)

    vx = jax.jit(lambda p, X: jax.vmap(
        functools.partial(run_gem, cfg=cfg_xla))(p, X))
    t = timeit(lambda: vx(params_b, Xb), fetchb)
    results["batch8_xla"] = t
    print(f"batch-8 vmap xla:     {t:.3f}s  ({t / B:.3f}s/clip)",
          file=sys.stderr)

    results["batch_vs_seq"] = results["batch8_pallas"] / results["seq8_pallas"]
    print(json.dumps({k: round(v, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
