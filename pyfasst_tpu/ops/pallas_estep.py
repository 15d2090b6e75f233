"""Fused Pallas E-step kernel (rank-1 sources, I = 2 channels).

BASELINE.json:north_star calls for the hot loops to become fused TPU
kernels. This kernel performs the ENTIRE E-step of estep.compute_suff_stats
in one pass over the (f, n) plane -- mixture covariance assembly,
cancellation-free determinant, y = Sigma_x^-1 x, per-source Wiener images
w_j = A_j^H y, posterior PSDs xi_j, and ALL frame-reduced statistics
(Txs/Tss/T4/T7/loglik) accumulated in VMEM -- so each (f, n) input element
is read from HBM exactly once and only xi is written back at (f, n) size.
The XLA version materializes ~10 intermediate (F, N) arrays between fusions.

Numerics are IDENTICAL to estep.py (same subtract-free determinant and
sub-source-coordinate statistics); parity is tested element-wise on CPU via
interpret mode. Rank-2 components and the 'ann_ns_inj' mode fall back to the
XLA path (gem.py dispatches).

Grid: (F/TF, N/TN) with the frame axis fastest; the reduced outputs map to
frequency-only blocks that are revisited across the frame grid dimension
(TPU grid iteration is sequential, so read-modify-write accumulation is
safe). Frame padding is masked out of the log-likelihood; padded v/x are
zero so every other statistic is unaffected by construction.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _make_kernel(J: int, TF: int, TN: int, N_valid: int):
    def kernel(x4_ref, v_ref, R_ref, A_ref, sig_ref, trR_ref, Xc_ref,
               xi_ref, txs_ref, tss_ref, t4_ref, t7_ref, ll_ref):
        jn = pl.program_id(1)

        x0r = x4_ref[0]
        x0i = x4_ref[1]
        x1r = x4_ref[2]
        x1i = x4_ref[3]
        sig = sig_ref[:]                     # (TF, 1)
        v = [v_ref[j] for j in range(J)]     # (TF, TN) each

        # Sigma_x entries and the nonnegative-monomial determinant.
        Ra = [R_ref[j, :, 0:1] for j in range(J)]
        Rd = [R_ref[j, :, 1:2] for j in range(J)]
        Rbr = [R_ref[j, :, 2:3] for j in range(J)]
        Rbi = [R_ref[j, :, 3:4] for j in range(J)]
        trR = [trR_ref[j] for j in range(J)]  # (TF, 1)

        a = sig + sum(v[j] * Ra[j] for j in range(J))
        d = sig + sum(v[j] * Rd[j] for j in range(J))
        br = sum(v[j] * Rbr[j] for j in range(J))
        bi = sum(v[j] * Rbi[j] for j in range(J))
        lin = sum(v[j] * trR[j] for j in range(J))
        quad = 0.5 * sum(v[j] * v[k] * Xc_ref[j, k]
                         for j in range(J) for k in range(J))
        det = sig * sig + sig * lin + quad
        rinv = 1.0 / det

        # y = Sigma_x^-1 x  via the adjugate [d, -b; -conj(b), a] / det
        y0r = (d * x0r - br * x1r + bi * x1i) * rinv
        y0i = (d * x0i - br * x1i - bi * x1r) * rinv
        y1r = (a * x1r - br * x0r - bi * x0i) * rinv
        y1i = (a * x1i - br * x0i + bi * x0r) * rinv

        tr_sxi_rxx = jnp.maximum(
            x0r * y0r + x0i * y0i + x1r * y1r + x1i * y1i, 0.0)

        # loglik contribution (mask padded frames)
        col = jax.lax.broadcasted_iota(jnp.int32, (TF, TN), 1) + jn * TN
        valid = (col < N_valid).astype(x0r.dtype)
        ll_tile = jnp.sum((jnp.log(det) + tr_sxi_rxx) * valid, axis=1,
                          keepdims=True)

        # per-source w_j = A_j^H y, leave-one-out dets, xi and accumulators
        A0r = [A_ref[j, :, 0:1] for j in range(J)]
        A0i = [A_ref[j, :, 1:2] for j in range(J)]
        A1r = [A_ref[j, :, 2:3] for j in range(J)]
        A1i = [A_ref[j, :, 3:4] for j in range(J)]

        wr, wi = [], []
        for j in range(J):
            wr.append(A0r[j] * y0r + A0i[j] * y0i
                      + A1r[j] * y1r + A1i[j] * y1i)
            wi.append(A0r[j] * y0i - A0i[j] * y0r
                      + A1r[j] * y1i - A1i[j] * y1r)

        first = jn == 0
        for j in range(J):
            trCR = wr[j] * wr[j] + wi[j] * wi[j]
            # leave-one-out S_j (direct sums over k != j)
            aS = sig + sum(v[k] * Ra[k] for k in range(J) if k != j)
            dS = sig + sum(v[k] * Rd[k] for k in range(J) if k != j)
            brS = sum(v[k] * Rbr[k] for k in range(J) if k != j)
            biS = sum(v[k] * Rbi[k] for k in range(J) if k != j)
            linS = sum(v[k] * trR[k] for k in range(J) if k != j)
            quadS = 0.5 * sum(v[k] * v[l] * Xc_ref[k, l]
                              for k in range(J) for l in range(J)
                              if k != j and l != j)
            detS = sig * sig + sig * linS + quadS
            t = (dS * Ra[j] + aS * Rd[j]
                 - 2.0 * (brS * Rbr[j] + biS * Rbi[j])) / detS
            den = 1.0 + v[j] * t
            xi_ref[j] = v[j] * v[j] * trCR + v[j] / den

            t4_tile = jnp.sum(v[j] / den, axis=1, keepdims=True)
            # Txs_j = sum_n v_j x conj(w_j): [x0 w*, x1 w*] -> 4 reals
            vj = v[j]
            txs_tile = jnp.stack([
                jnp.sum(vj * (x0r * wr[j] + x0i * wi[j]), axis=1),
                jnp.sum(vj * (x0i * wr[j] - x0r * wi[j]), axis=1),
                jnp.sum(vj * (x1r * wr[j] + x1i * wi[j]), axis=1),
                jnp.sum(vj * (x1i * wr[j] - x1r * wi[j]), axis=1),
            ], axis=-1)                                   # (TF, 4)

            @pl.when(first)
            def _():
                t4_ref[j] = t4_tile
                txs_ref[j] = txs_tile

            @pl.when(jnp.logical_not(first))
            def _():
                t4_ref[j] += t4_tile
                txs_ref[j] += txs_tile

        for j in range(J):
            for k in range(J):
                vv = v[j] * v[k]
                # Tss_jk = sum_n v_j v_k w_j conj(w_k)
                ss_r = jnp.sum(vv * (wr[j] * wr[k] + wi[j] * wi[k]),
                               axis=1)
                ss_i = jnp.sum(vv * (wi[j] * wr[k] - wr[j] * wi[k]),
                               axis=1)
                tss_tile = jnp.stack([ss_r, ss_i], axis=-1)

                # T7_jk = sum_n v_j v_k A_j^H Sigma_x^-1 A_k  (j != k);
                # Sigma_x^-1 = [d, -b; -conj(b), a]/det with b = br + i bi.
                if j != k:
                    # u = Sigma_x^-1 A_k  (complex 2-vector)
                    u0r = (d * A0r[k] - br * A1r[k] + bi * A1i[k]) * rinv
                    u0i = (d * A0i[k] - br * A1i[k] - bi * A1r[k]) * rinv
                    u1r = (a * A1r[k] - br * A0r[k] - bi * A0i[k]) * rinv
                    u1i = (a * A1i[k] - br * A0i[k] + bi * A0r[k]) * rinv
                    m_r = (A0r[j] * u0r + A0i[j] * u0i
                           + A1r[j] * u1r + A1i[j] * u1i)
                    m_i = (A0r[j] * u0i - A0i[j] * u0r
                           + A1r[j] * u1i - A1i[j] * u1r)
                    t7_tile = jnp.stack([jnp.sum(vv * m_r, axis=1),
                                         jnp.sum(vv * m_i, axis=1)], axis=-1)
                else:
                    t7_tile = jnp.zeros((TF, 2), tss_tile.dtype)

                @pl.when(first)
                def _():
                    tss_ref[j, k] = tss_tile
                    t7_ref[j, k] = t7_tile

                @pl.when(jnp.logical_not(first))
                def _():
                    tss_ref[j, k] += tss_tile
                    t7_ref[j, k] += t7_tile

        @pl.when(first)
        def _():
            ll_ref[:] = ll_tile

        @pl.when(jnp.logical_not(first))
        def _():
            ll_ref[:] += ll_tile

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_estep_rank1(X: jnp.ndarray, v: jnp.ndarray, Rj: jnp.ndarray,
                       A4: jnp.ndarray, sigma: jnp.ndarray,
                       trR: jnp.ndarray, Xc: jnp.ndarray,
                       interpret: bool = False):
    """Run the fused kernel.

    X (F, N, 2) complex; v (J, F, N); Rj (J, F, 4); A4 (J, F, 4) real
    [Re A0, Im A0, Re A1, Im A1]; sigma (F,); trR (J, F); Xc (J, J, F).
    Returns (xi, txs, tss, t4, t7, loglik) with reduced stats in packed real
    form (see ops.gem wrapper for the complex views).
    """
    J, F, N = v.shape
    # Large tiles: VMEM comfortably holds (TF, TN) f32 working sets for the
    # ~12 live arrays, and a single frame-tile avoids the accumulation
    # revisits entirely for typical clip lengths.
    TF = 32
    TN = min(_cdiv(N, 128) * 128, 2048)
    Fp, Np = _cdiv(F, TF) * TF, _cdiv(N, TN) * TN
    x4 = jnp.stack([jnp.real(X[..., 0]), jnp.imag(X[..., 0]),
                    jnp.real(X[..., 1]), jnp.imag(X[..., 1])])
    x4 = jnp.pad(x4, ((0, 0), (0, Fp - F), (0, Np - N)))
    vp = jnp.pad(v, ((0, 0), (0, Fp - F), (0, Np - N)))
    Rp = jnp.pad(Rj, ((0, 0), (0, Fp - F), (0, 0)))
    Ap = jnp.pad(A4, ((0, 0), (0, Fp - F), (0, 0)))
    sp = jnp.pad(sigma, (0, Fp - F), constant_values=1.0)[:, None]
    trRp = jnp.pad(trR, ((0, 0), (0, Fp - F)))[..., None]
    Xcp = jnp.pad(Xc, ((0, 0), (0, 0), (0, Fp - F)))[..., None]

    nF, nN = Fp // TF, Np // TN
    grid = (nF, nN)

    def fmap(i, j):
        return (0, i, 0)

    in_specs = [
        pl.BlockSpec((4, TF, TN), lambda i, j: (0, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((J, TF, TN), lambda i, j: (0, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((J, TF, 4), fmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((J, TF, 4), fmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((TF, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((J, TF, 1), fmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((J, J, TF, 1), lambda i, j: (0, 0, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((J, TF, TN), lambda i, j: (0, i, j),
                     memory_space=pltpu.VMEM),                    # xi
        pl.BlockSpec((J, TF, 4), fmap, memory_space=pltpu.VMEM),  # txs
        pl.BlockSpec((J, J, TF, 2), lambda i, j: (0, 0, i, 0),
                     memory_space=pltpu.VMEM),                    # tss
        pl.BlockSpec((J, TF, 1), fmap, memory_space=pltpu.VMEM),  # t4
        pl.BlockSpec((J, J, TF, 2), lambda i, j: (0, 0, i, 0),
                     memory_space=pltpu.VMEM),                    # t7
        pl.BlockSpec((TF, 1), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),                    # ll
    ]
    out_shape = [
        jax.ShapeDtypeStruct((J, Fp, Np), jnp.float32),
        jax.ShapeDtypeStruct((J, Fp, 4), jnp.float32),
        jax.ShapeDtypeStruct((J, J, Fp, 2), jnp.float32),
        jax.ShapeDtypeStruct((J, Fp, 1), jnp.float32),
        jax.ShapeDtypeStruct((J, J, Fp, 2), jnp.float32),
        jax.ShapeDtypeStruct((Fp, 1), jnp.float32),
    ]
    kernel = _make_kernel(J, TF, TN, N)
    xi, txs, tss, t4, t7, llf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x4, vp, Rp, Ap, sp, trRp, Xcp)

    xi = xi[:, :F, :N]
    loglik = -jnp.sum(llf[:F, 0])
    return xi, txs[:, :F], tss[:, :, :F], t4[:, :F, 0], t7[:, :, :F], loglik


def pallas_available() -> bool:
    """The compiled kernel needs a TPU lowering (axon lowers via tpu);
    other accelerators (GPU) must take the XLA path."""
    return jax.default_backend() in ("tpu", "axon")


def pallas_suff_stats(X, v, Rj, sigma, ranks, A_conv, eps: float = 1e-30,
                      interpret: bool = False):
    """Drop-in replacement for estep.compute_suff_stats (rank-1, no
    noise injection). Returns an estep.SuffStats."""
    from pyfasst_tpu.ops.estep import SuffStats, cross_terms

    assert all(r == 1 for r in ranks)
    J = v.shape[0]
    trR, Xc = cross_terms(Rj, A_conv)
    A4 = jnp.stack([
        jnp.stack([jnp.real(A_conv[j][:, 0, 0]), jnp.imag(A_conv[j][:, 0, 0]),
                   jnp.real(A_conv[j][:, 1, 0]), jnp.imag(A_conv[j][:, 1, 0])],
                  axis=-1)
        for j in range(J)])                                   # (J, F, 4)
    xi, txs, tss, t4, t7, loglik = pallas_estep_rank1(
        X, v, Rj, A4, sigma, trR, Xc, interpret=interpret)
    xi = jnp.maximum(xi, eps)
    Txs = tuple((txs[j, :, 0::2] + 1j * txs[j, :, 1::2])[..., None]
                for j in range(J))                            # (F, 2, 1) each
    Tss = tuple(tuple((tss[j, k, :, 0] + 1j * tss[j, k, :, 1])[:, None, None]
                      for k in range(J)) for j in range(J))
    T4 = tuple(t4[j] for j in range(J))
    T7 = tuple(tuple(None if j == k else
                     (t7[j, k, :, 0] + 1j * t7[j, k, :, 1])[:, None, None]
                     for k in range(J)) for j in range(J))
    return SuffStats(xi=xi, Txs=Txs, Tss=Tss, T4=T4, T7=T7, loglik=loglik)
