"""Fused spectral M-step statistics (plain two-factor IS-NMF chains).

Honest steady-state profiling (docs/design.md §4, round 2) showed the XLA
spectral M-step at ~53 us of the ~119 us flagship GEM iteration -- almost
entirely HBM traffic on (F, N) planes: xi and v reads, the P/V^2 and 1/V
elementwise materializations, and the V = FB @ TW rebuild between the
sequential factor updates. The FLOPs are negligible (tens of MFLOP).

These kernels compute the SAME sequential multiplicative updates as
mstep._nmf_factor_updates for the common case (one component per source,
FB and TW free, FW/TB/FB2 absent, NMF constraint -- the flagship, inst,
and conv default models), reading xi from HBM exactly twice and never
materializing an (F, N) intermediate:

- kernel FB-stats: per tile, rebuild V = FB @ TW on the MXU, form
  num = xi / max(V, floor)^2 and den = 1 / max(V, floor) in registers,
  and accumulate num @ TW^T and den @ TW^T into (F, K) outputs
  (frame-grid accumulation, same revisit pattern as the E-step kernel).
- host XLA: the (F, K) multiplicative FB update with its clamps (tiny).
- kernel TW-stats: identical tile math with the UPDATED FB (the
  sequential semantics: the TW update sees V refreshed after the FB
  update -- for a single two-factor component V_2 = FB_new @ TW exactly,
  since V - vk + vk_new with V == vk is IEEE-exact), contracting over
  frequency into per-f-block PARTIALS (each grid block written once; a
  direct (K, N) accumulator would be revisited non-contiguously, which
  the sequential TPU grid does not allow). XLA sums the ~1 MB of
  partials and applies the TW update.

Ragged-edge rule (same as pallas_estep): out-of-bounds lanes of a block
read UNSPECIFIED bits including NaNs, and 0 * NaN == NaN, so every tile
that feeds a CONTRACTION over a possibly-ragged axis is masked with a
select. FB-stats contracts over frames: mask xi/num/den columns and the
TW tile. TW-stats contracts over frequency: mask num/den rows. Garbage
that stays in its own row/column is dropped at the block write instead.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


_DOT = dict(preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)


def _make_fb_kernel(J: int, K: int, TF: int, TN: int, N_valid: int):
    def kernel(xi_ref, fb_ref, tw_ref, vf_ref, num_ref, den_ref):
        jn = pl.program_id(1)
        first = jn == 0
        col = jax.lax.broadcasted_iota(jnp.int32, (TF, TN), 1) + jn * TN
        cvalid = col < N_valid
        kcol = jax.lax.broadcasted_iota(jnp.int32, (K, TN), 1) + jn * TN
        zero = jnp.zeros((TF, TN), jnp.float32)

        for j in range(J):
            tw = jnp.where(kcol < N_valid, tw_ref[j], 0.0)       # (K, TN)
            V = jax.lax.dot_general(fb_ref[j], tw,
                                    (((1,), (0,)), ((), ())), **_DOT)
            Vc = jnp.maximum(V, vf_ref[j])
            den = jnp.where(cvalid, 1.0 / Vc, zero)
            num = jnp.where(cvalid, xi_ref[j] / (Vc * Vc), zero)
            # num @ TW^T, den @ TW^T -> (TF, K), accumulated over frames
            nt = jax.lax.dot_general(num, tw, (((1,), (1,)), ((), ())),
                                     **_DOT)
            dt = jax.lax.dot_general(den, tw, (((1,), (1,)), ((), ())),
                                     **_DOT)

            @pl.when(first)
            def _():
                num_ref[j] = nt
                den_ref[j] = dt

            @pl.when(jnp.logical_not(first))
            def _():
                num_ref[j] += nt
                den_ref[j] += dt

    return kernel


def _make_tw_kernel(J: int, K: int, TF: int, TN: int, F_valid: int):
    def kernel(xi_ref, fb_ref, tw_ref, vf_ref, num_ref, den_ref):
        fi = pl.program_id(0)
        row = jax.lax.broadcasted_iota(jnp.int32, (TF, TN), 0) + fi * TF
        rvalid = row < F_valid
        zero = jnp.zeros((TF, TN), jnp.float32)

        krow = jax.lax.broadcasted_iota(jnp.int32, (TF, K), 0) + fi * TF
        for j in range(J):
            # FB rows past F are unspecified bits (possibly NaN) and feed
            # the frequency contraction: select-mask them to zero
            fb = jnp.where(krow < F_valid, fb_ref[j], 0.0)
            V = jax.lax.dot_general(fb, tw_ref[j],
                                    (((1,), (0,)), ((), ())), **_DOT)
            Vc = jnp.maximum(V, vf_ref[j])
            den = jnp.where(rvalid, 1.0 / Vc, zero)
            num = jnp.where(rvalid, xi_ref[j] / (Vc * Vc), zero)
            # FB^T @ num, FB^T @ den -> (K, TN) partial for this f-block
            num_ref[j, 0] = jax.lax.dot_general(
                fb, num, (((0,), (0,)), ((), ())), **_DOT)
            den_ref[j, 0] = jax.lax.dot_general(
                fb, den, (((0,), (0,)), ((), ())), **_DOT)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "tf"))
def fb_stats(xi, FB, TW, vfloor, interpret: bool = False, tf: int = 32):
    """(num, den) (J, F, K) for the FB update: (P/Vc^2) @ TW^T, (1/Vc) @ TW^T
    with V = FB @ TW rebuilt in-tile. xi (J, F, N); FB (J, F, K);
    TW (J, K, N); vfloor (J, 1) -- broadcast to a (J, F, 1) VMEM plane
    in-wrapper (an SMEM scalar input HANGS the axon backend; per-row
    VMEM tiles are the proven kernel-A pattern for scalars)."""
    J, F, N = xi.shape
    K = FB.shape[-1]
    TF, TN = tf, min(_cdiv(N, 128) * 128, 2048)
    grid = (_cdiv(F, TF), _cdiv(N, TN))
    vfloor = jnp.broadcast_to(vfloor[:, None], (J, F, 1))
    kernel = _make_fb_kernel(J, K, TF, TN, N)
    num, den = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((J, TF, TN), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, TF, K), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, K, TN), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, TF, 1), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((J, TF, K), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, TF, K), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((J, F, K), jnp.float32)] * 2,
        interpret=interpret,
    )(xi, FB, TW, vfloor)
    return num, den


@functools.partial(jax.jit, static_argnames=("interpret", "tf"))
def tw_stats(xi, FB, TW, vfloor, interpret: bool = False, tf: int = 32):
    """(num, den) (J, K, N) for the TW update: FB^T @ (P/Vc^2), FB^T @ (1/Vc)
    with V = FB @ TW rebuilt in-tile (FB is the UPDATED basis). Emitted as
    per-f-block partials and summed here (~1 MB, vs the (F, N) planes the
    XLA path reads)."""
    J, F, N = xi.shape
    K = FB.shape[-1]
    TF, TN = tf, min(_cdiv(N, 128) * 128, 2048)
    Fb = _cdiv(F, TF)
    grid = (Fb, _cdiv(N, TN))
    vfloor = jnp.broadcast_to(vfloor[:, None], (J, F, 1))
    kernel = _make_tw_kernel(J, K, TF, TN, F)
    num_p, den_p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((J, TF, TN), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, TF, K), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, K, TN), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, TF, 1), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((J, 1, K, TN), lambda i, j: (0, i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, 1, K, TN), lambda i, j: (0, i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((J, Fb, K, N), jnp.float32)] * 2,
        interpret=interpret,
    )(xi, FB, TW, vfloor)
    return num_p.sum(axis=1), den_p.sum(axis=1)


def eligible(params) -> bool:
    """Static check: every spectral component is a plain two-factor free
    IS-NMF chain (FB free, TW free, no FW/TB/FB2, NMF constraint), one
    per spatial source, equal rank -- the shapes the kernels stack."""
    from pyfasst_tpu.models.components import NMF

    if len(params.spec) != params.n_spat:
        return False
    K = None
    for i, c in enumerate(params.spec):
        if (c.spat_ind != i or c.FW is not None or c.TB is not None
                or c.FB2 is not None or c.constraint != NMF
                or c.free != (True, False, True, False)):
            return False
        if c.FB.dtype != jnp.float32:
            return False
        if K is None:
            K = c.FB.shape[-1]
        elif c.FB.shape[-1] != K:
            return False
    return True


def fused_spectral_update(params, stats, eps: float = 1e-30,
                          interpret: bool = False):
    """Drop-in replacement for mstep.update_spectral on `eligible` params.

    Same math, same order (FB with its clamps, THEN TW against the
    refreshed V), same float32 safeguards; parity-tested element-wise
    against the XLA path (test_pallas_spectral.py)."""
    from pyfasst_tpu.ops.mstep import _mul_upd

    J = params.n_spat
    FB = jnp.stack([c.FB for c in params.spec])       # (J, F, K)
    TW = jnp.stack([c.TW for c in params.spec])       # (J, K, N)
    xi = stats.xi
    vfloor = (1e-12 * jnp.mean(xi, axis=(1, 2)) + eps)[:, None]
    fn, fd = fb_stats(xi, FB, TW, vfloor, interpret=interpret)
    FB2 = _mul_upd(FB, fn, fd, eps)
    tn, td = tw_stats(xi, FB2, TW, vfloor, interpret=interpret)
    TW2 = _mul_upd(TW, tn, td, eps)
    spec = tuple(c.replace(FB=FB2[i], TW=TW2[i])
                 for i, c in enumerate(params.spec))
    return params.replace(spec=spec)
