"""GEM E-step: exact Gaussian sufficient statistics.

Reference parity: pyfasst/audioModel.py::comp_suff_stat (UNVERIFIED; mount
empty, see SURVEY.md §3.2). The reference loops over frequency bins in Python;
here the E-step is reformulated so that **no mixing matrix appears in the
(f, n) plane at all** -- everything is expressed through the packed spatial
covariances R_j(f) = A_j A_j^H and four reduced statistics:

    Sigma_x(f,n)  = sum_j v_j R_j + sigma_b I
    C(f,n)        = Sigma_x^-1 Rxx Sigma_x^-1                  (shared over j)
    xi_j(f,n)     = [v^2 tr(C R_j) + v (rank_j - v tr(Sigma_x^-1 R_j))]/rank_j
    T1_j(f)       = sum_n v_j Rxx Sigma_x^-1     (general 2x2; -> R^_xs,j = T1_j A_j)
    T2_jk(f)      = sum_n v_j v_k C              (-> A_j^H T2 A_k term of R^_ss blocks)
    T3_jk(f)      = sum_n v_j v_k Sigma_x^-1     (-> A_j^H T3 A_k term)
    sv_j(f)       = sum_n v_j

derived from the classical FASST E-step (SURVEY.md §A) by substituting the
joint sub-source Wiener filter W_j = v_j A_j^H Sigma_x^-1 into
R^_xs = <x s^H>, R^_ss = <s s^H> + posterior covariance, where s stacks ALL
sources' sub-sources -- the M-step for the mixing matrices is a joint solve,
so the cross-source (j, k) second-moment blocks are required:

    R^_ss[j,k](f) = A_j^H (T2_jk - T3_jk) A_k + delta_jk sv_j I_Rj.

The per-(f,n) work is pure VPU elementwise math; the n-reductions are batched
matmuls (einsum over frames). Wall-clock therefore scales with HBM bandwidth,
not per-bin Python overhead.
"""
from __future__ import annotations

from typing import Tuple

import flax.struct
import jax.numpy as jnp

from pyfasst_tpu.ops import herm


@flax.struct.dataclass
class SuffStats:
    """Per-source reduced statistics of one E-step."""

    xi: jnp.ndarray    # (J, F, N)     posterior sub-source PSDs
    T1: jnp.ndarray    # (J, F, 8)     sum_n v_j * (Rxx Sigma_x^-1), packed general
    T2: jnp.ndarray    # (J, J, F, 4)  sum_n v_j v_k * C, packed Hermitian
    T3: jnp.ndarray    # (J, J, F, 4)  sum_n v_j v_k * Sigma_x^-1, packed Hermitian
    T4: tuple          # per j: sum_n v_j (I_R + v_j A^H S_j^-1 A)^-1 -- the
    #                    subtract-free posterior-covariance term of the R^_ss
    #                    diagonal block. Shape (F,) for rank-1, packed (F, 4)
    #                    Hermitian for rank-2 (full-rank).
    sv: jnp.ndarray    # (J, F)        sum_n v_j
    loglik: jnp.ndarray  # scalar: sum_{f,n} -(logdet Sigma_x + tr(Sigma_x^-1 Rxx))


def mixture_cov(v: jnp.ndarray, Rj: jnp.ndarray, sigma: jnp.ndarray):
    """Packed Sigma_x(f,n) = sum_j v_j(f,n) R_j(f) + sigma(f) I, (F, N, 4)."""
    Sx = jnp.einsum("jfn,jfk->fnk", v, Rj)
    return herm.add_noise_diag(Sx, sigma[:, None])


def cross_terms(Rj: jnp.ndarray, A_conv, ranks) -> Tuple[jnp.ndarray,
                                                         jnp.ndarray]:
    """Per-frequency spatial invariants for the cancellation-free determinant.

    Returns trR (J, F) and X (J, J, F) with
        X[j, k] = tr(R_j) tr(R_k) - tr(R_j R_k)   (>= 0 by Cauchy-Schwarz),
        X[j, j] = 2 det(R_j)  (exactly 0 for rank-1; |det A_j|^2 for rank-2).
    """
    trR = herm.trace(Rj)                                  # (J, F)
    X = trR[:, None] * trR[None] - herm.trace_prod(Rj[:, None], Rj[None])
    X = jnp.maximum(X, 0.0)                               # (J, J, F)
    J = Rj.shape[0]
    diag = []
    for j in range(J):
        if ranks[j] >= 2:
            A = A_conv[j]
            detA = (A[..., 0, 0] * A[..., 1, 1]
                    - A[..., 0, 1] * A[..., 1, 0])        # (F,)
            diag.append(2.0 * (jnp.real(detA) ** 2 + jnp.imag(detA) ** 2))
        else:
            diag.append(jnp.zeros(Rj.shape[1], Rj.dtype))
    eye = jnp.eye(J, dtype=Rj.dtype)[:, :, None]
    return trR, X * (1.0 - eye) + eye * jnp.stack(diag)[:, None, :]


def stable_mixture_det(v, trR, X, sigma):
    """det Sigma_x(f,n) as a sum of NONNEGATIVE monomials (see module doc):

        det = sigma^2 + sigma sum_j v_j tr(R_j) + 1/2 sum_{j,k} v_j v_k X_jk.

    The naive a*d - |b|^2 carries float32 cancellation noise ~eps * v^2 that
    swamps the true det once one source dominates a bin (cond(Sigma_x) over
    ~1e6), which is what collapsed long float32 GEM runs. Every term here is
    >= 0, so the result is exact to f32 rounding and needs no floors.
    """
    s = sigma[:, None]
    lin = jnp.einsum("jfn,jf->fn", v, trR)
    quad = 0.5 * jnp.einsum("jfn,kfn,jkf->fn", v, v, X)
    return s * s + s * lin + quad


def stable_inv(S, det):
    """Packed inverse from adjugate entries and an externally computed det."""
    r = 1.0 / det
    return jnp.stack([S[..., 1] * r, S[..., 0] * r,
                      -S[..., 2] * r, -S[..., 3] * r], axis=-1)


def compute_suff_stats(
    X: jnp.ndarray,            # (F, N, 2) complex mixture STFT
    v: jnp.ndarray,            # (J, F, N) source PSDs
    Rj: jnp.ndarray,           # (J, F, 4) packed spatial covariances
    sigma: jnp.ndarray,        # (F,) annealed noise PSD
    ranks: Tuple[int, ...],    # static spatial ranks R_j
    eps: float = 1e-30,
    det_floor: float = 1e-30,
    noise_inject: bool = False,
    A_conv: Tuple = (),        # per j: complex (F, I, R) mixing (needed for
    #                            the rank-2 T4 sandwich; ignored for rank-1)
) -> SuffStats:
    """One E-step over the full (f, n) plane. All shapes static.

    Float32 numerics (each cure was found by bisecting a collapsing 200-iter
    run against the float64 oracle; all are mirrored there):
      - det(Sigma_x) via the nonnegative-monomial expansion (stable_mixture_det);
      - the empirical covariance Rxx = x x^H is NEVER materialized: with
        y = Sigma_x^-1 x, every statistic is an outer product --
        C = y y^H, Rxx Sigma_x^-1 = x y^H, tr(C R_j) = y^H R_j y >= 0 --
        so quadratic forms are exactly nonnegative and rounding errors enter
        *linearly* through y instead of through catastrophic cancellation in
        Sigma_x^-1 Rxx Sigma_x^-1;
      - the posterior-variance terms go through the leave-one-out
        S_j = sum_{k != j} v_k R_k + sigma I (Sherman-Morrison form), never
        through the subtraction rank - v tr(Sigma_x^-1 R_j).
    """
    trR, Xc = cross_terms(Rj, A_conv, ranks)
    Sx = mixture_cov(v, Rj, sigma)                      # (F, N, 4)
    detSx = stable_mixture_det(v, trR, Xc, sigma)       # (F, N) > 0
    Sxi = stable_inv(Sx, detSx)                          # (F, N, 4)

    x0, x1 = X[..., 0], X[..., 1]
    y0, y1 = herm.herm_apply(Sxi, x0, x1)                # y = Sigma_x^-1 x
    C = herm.herm_from_outer(y0, y1)                     # (F, N, 4) = y y^H
    RxSi = herm.gen_outer(x0, x1, y0, y1)                # (F, N, 8) = x y^H
    trSxiRxx = jnp.maximum(
        jnp.real(jnp.conj(x0) * y0 + jnp.conj(x1) * y1), 0.0)
    if noise_inject:
        # 'ann_ns_inj': observed covariance becomes x x^H + sigma I.
        s = sigma[:, None, None]
        C = C + s * herm.herm_sq(Sxi)
        RxSi = RxSi + s * herm.herm_as_gen(Sxi)
        trSxiRxx = trSxiRxx + sigma[:, None] * herm.trace(Sxi)

    J = v.shape[0]
    xi_list = []
    T4_list = []
    for j in range(J):
        # Wiener part of the posterior PSD: y^H R_j y -- exactly nonnegative.
        trCR_j = herm.quadform(Rj[j][:, None], y0, y1)
        if noise_inject:
            trCR_j = trCR_j + sigma[:, None] * herm.trace_prod(
                herm.herm_sq(Sxi), Rj[j][:, None])
        if J == 1:
            Sj = jnp.zeros_like(Sx)
        else:
            Sj = sum(v[k][..., None] * Rj[k][:, None, :]
                     for k in range(J) if k != j)
        Sj = herm.add_noise_diag(Sj, sigma[:, None])     # (F, N, 4)
        vmask = v.at[j].set(0.0)                          # leave-one-out det
        Sji = stable_inv(Sj, stable_mixture_det(vmask, trR, Xc, sigma))
        t = herm.trace_prod(Sji, Rj[j][:, None, :])      # (F, N) >= 0
        vt = v[j] * t
        if ranks[j] >= 2:
            # full-rank: G = I_2 + v A^H S^-1 A is Hermitian PD with
            # det >= 1 -- its inverse needs no loading and no subtraction.
            M = herm.sandwich22(A_conv[j][:, None], Sji)  # (F, N, 4)
            G = herm.add_noise_diag(v[j][..., None] * M, 1.0)
            dG = jnp.maximum(herm.det(G), 1.0)
            Ginv = jnp.stack([G[..., 1], G[..., 0],
                              -G[..., 2], -G[..., 3]], axis=-1) / dG[..., None]
            T4_list.append(jnp.einsum("fn,fnc->fc", v[j], Ginv))
            coef = jnp.maximum((2.0 + vt) / dG, 0.0)
        else:
            den = 1.0 + vt
            coef = jnp.maximum((2.0 + vt) / den - 1.0, 0.0)
            T4_list.append(jnp.sum(v[j] / den, axis=-1))  # (F,)
        xi_list.append((v[j] * v[j] * trCR_j + v[j] * coef) / ranks[j])
    xi = jnp.maximum(jnp.stack(xi_list), eps)

    # Reduced per-frequency statistics (contract the frame axis).
    T1 = jnp.einsum("jfn,fnk->jfk", v, RxSi)
    vv = v[:, None] * v[None]                            # (J, J, F, N)
    T2 = jnp.einsum("jkfn,fnc->jkfc", vv, C)
    T3 = jnp.einsum("jkfn,fnc->jkfc", vv, Sxi)
    sv = jnp.sum(v, axis=-1)

    loglik = -jnp.sum(jnp.log(detSx) + trSxiRxx)
    return SuffStats(xi=xi, T1=T1, T2=T2, T3=T3, T4=tuple(T4_list), sv=sv,
                     loglik=loglik)
