"""Online / streaming GEM (block-wise with exponential forgetting).

Capability parity with the FASST lineage's online variant (PAPERS.md,
"A general framework for online audio source separation", arXiv:1112.6178;
SURVEY.md §5 long-context row): process the mixture in frame blocks,
maintain exponentially-weighted sufficient statistics, update the
frequency-side parameters (mixing A_j, spectral patterns FB) from the
accumulated statistics while the time activations TW are estimated per
block. Enables long recordings whose full (F, N) plane does not fit in HBM
and latency-bounded streaming separation.

TPU-native shape: one jitted `lax.scan` over blocks (run_gem_online, whole
mixture in memory) OR a host-driven loop over `online_block` fed by
`tf.stft.STFT.stream_blocks` -- the bounded-memory path for recordings
whose (F, N) plane exceeds HBM. Both run the same block body. Rank-1
sources (the streaming use case); any channel count (I == 2 rides the
packed 2x2 fast path, others the square-root general engine).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pyfasst_tpu.ops.estep import compute_suff_stats
from pyfasst_tpu.utils.misc import czeros


class OnlineState(NamedTuple):
    """Carried across blocks: frequency-side params + EW statistics."""
    A: jnp.ndarray          # (J, F, I) complex rank-1 mixing columns
    FB: jnp.ndarray         # (J, F, K) spectral patterns
    txs: jnp.ndarray        # (J, F, I) complex EW sum of v x w^H
    tss: jnp.ndarray        # (J, J, F) complex EW sum of v_j v_k w_j w_k^H
    t4: jnp.ndarray         # (J, F)    EW sum of v/(1 + v t)
    t7: jnp.ndarray         # (J, J, F) complex EW cross posterior cov
    fb_num: jnp.ndarray     # (J, F, K) EW numerator of the FB update
    fb_den: jnp.ndarray     # (J, F, K) EW denominator


def _block_estep(Xb, A, FB, TWb, sigma, eps):
    """Stats of one block under current params. Returns (stats, v, loglik).

    Dispatches on the channel count at trace time like the batch engine:
    I == 2 takes the packed 2x2 fast path, anything else the square-root
    general engine (identical SuffStats structure)."""
    J, F, K = FB.shape
    v = jnp.einsum("jfk,jkn->jfn", FB, TWb)
    A_conv = tuple(A[j][..., None] for j in range(J))    # (F, I, 1)
    if Xb.shape[-1] != 2:
        from pyfasst_tpu.ops.engine_general import suff_stats_general
        return suff_stats_general(Xb, v, A_conv, sigma, (1,) * J), v
    from pyfasst_tpu.ops import herm
    Rj = jnp.stack([herm.herm_from_mixing(A_conv[j]) for j in range(J)])
    stats = compute_suff_stats(Xb, v, Rj, sigma, (1,) * J, eps=eps,
                               A_conv=A_conv)
    return stats, v


def online_init(A0: jnp.ndarray, FB0: jnp.ndarray) -> OnlineState:
    """Fresh streaming state around initial mixing/pattern guesses.

    A0 (J, F, I) complex rank-1 mixing (any channel count; I == 2 takes
    the packed fast path, others the square-root general engine);
    FB0 (J, F, K) spectral patterns.
    """
    J, F, K = FB0.shape
    return OnlineState(
        A=A0, FB=FB0,
        txs=czeros((J, F, A0.shape[-1]), jnp.complex64),
        tss=czeros((J, J, F), jnp.complex64),
        t4=jnp.zeros((J, F), jnp.float32),
        t7=czeros((J, J, F), jnp.complex64),
        fb_num=jnp.zeros((J, F, K), jnp.float32),
        fb_den=jnp.zeros((J, F, K), jnp.float32),
    )


def _make_block_step(TW0, sigma, lam, inner_iters: int, eps: float):
    """The per-block body shared by the scanned and host-driven paths."""
    J = TW0.shape[0]

    def block_step(state: OnlineState, Xb):
        A, FB = state.A, state.FB
        TWb = TW0

        def inner(i, carry):
            TWb, A, FB = carry
            stats, v = _block_estep(Xb, A, FB, TWb, sigma, eps)
            # local TW update (IS-NMF multiplicative, FB fixed)
            Vc = jnp.maximum(v, 1e-12 * jnp.mean(stats.xi) + eps)
            num = stats.xi / (Vc * Vc)
            den = 1.0 / Vc
            upd = jnp.clip(
                jnp.einsum("jfk,jfn->jkn", FB, num)
                / jnp.maximum(jnp.einsum("jfk,jfn->jkn", FB, den), eps),
                1e-5, 1e5)
            TWb = jnp.maximum(TWb * upd, eps)
            return TWb, A, FB

        TWb, _, _ = jax.lax.fori_loop(0, inner_iters, inner, (TWb, A, FB))
        stats, v = _block_estep(Xb, A, FB, TWb, sigma, eps)

        # exponential-forgetting accumulation of the spatial statistics
        txs = lam * state.txs + jnp.stack(
            [stats.Txs[j][:, :, 0] for j in range(J)])
        tss = lam * state.tss + jnp.stack(
            [jnp.stack([stats.Tss[j][k][:, 0, 0] for k in range(J)])
             for j in range(J)])
        t4 = lam * state.t4 + jnp.stack([stats.T4[j] for j in range(J)])
        t7 = lam * state.t7 + jnp.stack(
            [jnp.stack([jnp.zeros_like(tss[0, 0]) if j == k
                        else stats.T7[j][k][:, 0, 0] for k in range(J)])
             for j in range(J)])

        # rank-1 mixing update from EW stats (Gauss-Seidel, per frequency)
        A_new = []
        for j in range(J):
            target = txs[j]                              # (F, 2)
            for k in range(J):
                if k == j:
                    continue
                blk = tss[k, j] - t7[k, j]               # (F,)
                Ak = A_new[k] if k < j else A[k]         # Gauss-Seidel
                target = target - Ak * blk[:, None]
            rss = jnp.real(tss[j, j]) + t4[j]            # (F,)
            ridge = 1e-4 * jnp.mean(rss) + 1e-30
            A_new.append(target / (rss + ridge)[:, None])
        A = jnp.stack(A_new)

        # online FB update: EW-accumulated IS-NMF numerator/denominator
        # (V floored RELATIVE to the observed scale -- an absolute eps floor
        # overflows float32 under V**-2 for dead components, see mstep.py)
        Vc = jnp.maximum(v, 1e-12 * jnp.mean(stats.xi) + eps)
        num = stats.xi / (Vc * Vc)
        den = 1.0 / Vc
        fb_num = lam * state.fb_num + jnp.einsum("jfn,jkn->jfk", num, TWb)
        fb_den = lam * state.fb_den + jnp.einsum("jfn,jkn->jfk", den, TWb)
        FB = jnp.maximum(FB * jnp.clip(fb_num / jnp.maximum(fb_den, eps),
                                       1e-2, 1e2), eps)
        # normalize FB columns, push scale into nothing (TW is per-block)
        s = jnp.maximum(jnp.sum(FB, axis=1, keepdims=True), eps)
        FB = FB / s

        new_state = OnlineState(A=A, FB=FB, txs=txs, tss=tss, t4=t4, t7=t7,
                                fb_num=fb_num, fb_den=fb_den)
        return new_state, (TWb, stats.loglik)

    return block_step


@functools.partial(jax.jit, static_argnames=("inner_iters", "eps"))
@jax.default_matmul_precision("highest")
def online_block(state: OnlineState, Xb: jnp.ndarray, TW0: jnp.ndarray,
                 sigma: jnp.ndarray, forgetting: float = 0.9,
                 inner_iters: int = 4, eps: float = 1e-30):
    """Process ONE mixture block host-side: (state, (TWb, loglik)).

    The bounded-memory streaming entry: feed blocks from
    STFT.stream_blocks (same Nb per call => one compiled executable) and
    carry the returned state. Semantics identical to run_gem_online's
    scanned body (shared implementation).
    """
    return _make_block_step(TW0, sigma, forgetting, inner_iters,
                            eps)(state, Xb)


@functools.partial(jax.jit,
                   static_argnames=("n_blocks", "inner_iters", "eps"))
@jax.default_matmul_precision("highest")
def run_gem_online(A0: jnp.ndarray, FB0: jnp.ndarray, TW0: jnp.ndarray,
                   X: jnp.ndarray, sigma: jnp.ndarray,
                   n_blocks: int, forgetting: float = 0.9,
                   inner_iters: int = 4, eps: float = 1e-30):
    """Stream the mixture through `n_blocks` equal blocks (whole X given).

    A0 (J, F, 2) complex; FB0 (J, F, K); TW0 (J, K, Nb) per-block init;
    X (F, N, 2) with N = n_blocks * Nb; sigma (F,) noise PSD (held fixed --
    streaming has no global annealing schedule; pass a moderately small
    floor). Returns (A, FB, TW_all (J, K, N), logliks (n_blocks,)).
    """
    J, F, K = FB0.shape
    Nb = X.shape[1] // n_blocks

    Xblocks = jnp.moveaxis(
        X[:, :n_blocks * Nb].reshape(F, n_blocks, Nb, X.shape[-1]), 1, 0)
    block_step = _make_block_step(TW0, sigma, forgetting, inner_iters, eps)
    state, (TW_all, logliks) = jax.lax.scan(
        block_step, online_init(A0, FB0), Xblocks)
    # (n_blocks, J, K, Nb) -> (J, K, n_blocks * Nb), blocks in time order
    TW_all = jnp.moveaxis(TW_all, 0, 2).reshape(J, TW0.shape[1], -1)
    return state.A, state.FB, TW_all, logliks
