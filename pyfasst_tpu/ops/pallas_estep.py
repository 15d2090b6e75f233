"""Fused Pallas E-step kernel (rank-1 and rank-2 sources, I = 2 channels).

BASELINE.json:north_star calls for the hot loops to become fused TPU
kernels. This kernel performs the ENTIRE E-step of estep.compute_suff_stats
in one pass over the (f, n) plane -- mixture covariance assembly,
cancellation-free determinant, y = Sigma_x^-1 x, per-source Wiener images
w_j = A_j^H y, posterior PSDs xi_j, and ALL frame-reduced statistics
(Txs/Tss/T4/T7/loglik) accumulated in VMEM -- so each (f, n) input element
is read from HBM exactly once and only xi is written back at (f, n) size.
The XLA version materializes ~10 intermediate (F, N) arrays between fusions.

The kernel is GENERATED per static rank tuple: complex scalars are (re, im)
pairs of (TF, TN) tiles and the per-source loops unroll over sub-source
columns, so rank-1 (instantaneous/anechoic) and rank-2 (full-rank spatial
covariance) sources share one code path, and the 'ann_ns_inj' noise
injection is a static kernel variant. Numerics are IDENTICAL to estep.py
(same subtract-free determinant and sub-source-coordinate statistics);
parity is tested element-wise on CPU via interpret mode.

Grid: (ceil(F/TF), ceil(N/TN)) with the frame axis fastest; the reduced
outputs map to frequency-only blocks that are revisited across the frame
grid dimension (TPU grid iteration is sequential, so read-modify-write
accumulation is safe). Blocks need NOT divide (F, N): the kernel zeroes v
and x on the ragged frame edge (making every statistic self-masking) and
ragged frequency rows drop at the block write, so no operand is ever
padded or sliced on the host -- and the constant mixture plane is packed
once per run (pack_x4), not once per iteration.
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


# -- tiny complex algebra on (re, im) tile pairs --------------------------------
#
# A component may be None, meaning EXACTLY ZERO at trace time: instantaneous
# models have real mixing, so b = sum v_j Re(b_j), the mixing columns, and
# everything derived from them (Sigma_x^-1 A, A^H S^-1 A, ...) carry no
# imaginary part. Propagating the None through the algebra deletes those
# multiplies/adds from the generated kernel (the compiler cannot do it:
# folding x * 0 -> 0 is invalid under IEEE NaN/Inf semantics). The kernel is
# VPU-compute-bound (docs/design.md §4), so fewer ops is the lever that works.

def _m(a, b):
    """a * b with symbolic zero."""
    return None if a is None or b is None else a * b


def _na(a, b):
    """a + b with symbolic zero."""
    if a is None:
        return b
    if b is None:
        return a
    return a + b


def _ns(a, b):
    """a - b with symbolic zero."""
    if b is None:
        return a
    if a is None:
        return -b
    return a - b


def _cmul(x, y):
    return (_ns(_m(x[0], y[0]), _m(x[1], y[1])),
            _na(_m(x[0], y[1]), _m(x[1], y[0])))


def _cconj(x):
    return (x[0], None if x[1] is None else -x[1])


def _cadd(x, y):
    return (_na(x[0], y[0]), _na(x[1], y[1]))


def _csub(x, y):
    return (_ns(x[0], y[0]), _ns(x[1], y[1]))


def _cscale(s, x):
    return (_m(s, x[0]), _m(s, x[1]))


def _cabs2(x):
    return _na(_m(x[0], x[0]), _m(x[1], x[1]))


def _cdot_conj(x, y):
    """conj(x) * y."""
    return (_na(_m(x[0], y[0]), _m(x[1], y[1])),
            _ns(_m(x[0], y[1]), _m(x[1], y[0])))


def _make_kernel(ranks: Tuple[int, ...], TF: int, TN: int, N_valid: int,
                 ns_inj: bool = False, no_ll: bool = False,
                 real_cov: bool = False, fast_recip: bool = False):
    J = len(ranks)
    Rmax = max(ranks)

    def _recip(x):
        """1/x. With fast_recip, the VPU's approximate-reciprocal estimate
        (~2^-8 relative) refined by one Newton step r(2 - xr) (~1.5e-5
        relative -- far inside EM's tolerance and the 0.1 dB SDR budget,
        verified by the bench SDR gate on hardware). The kernel spends
        ~5 true divides per (f, n) bin and is VPU-compute-bound
        (docs/design.md §4), so this is a straight op-count cut."""
        if not fast_recip:
            return 1.0 / x
        r = pl.reciprocal(x, approx=True)
        return r * (2.0 - x * r)

    def kernel(x4_ref, v_ref, A_ref, sig_ref,
               xi_ref, txs_ref, tss_ref, t4_ref, t7_ref, ll_ref):
        jn = pl.program_id(1)
        first = jn == 0

        def accum(ref, idx, tile):
            @pl.when(first)
            def _():
                ref[idx] = tile

            @pl.when(jnp.logical_not(first))
            def _():
                ref[idx] += tile

        # Ragged-edge masking: block shapes need not divide (F, N); the
        # out-of-bounds lanes of the final frame block read UNSPECIFIED
        # values -- on real hardware these are arbitrary bits, INCLUDING
        # NaNs, so the mask must be a select (where), never a multiply
        # (NaN * 0 == NaN poisons the frame reductions; interpret mode
        # zero-fills and hides this). Zeroing v and x makes every reduced
        # statistic (all are v- or x-weighted) and xi's garbage columns
        # self-masking; the log-det term keeps its explicit mask below.
        # Out-of-bounds frequency ROWS never mix into valid rows (no
        # in-kernel reduction over f) and are dropped at the block write.
        col = jax.lax.broadcasted_iota(jnp.int32, (TF, TN), 1) \
            + pl.program_id(1) * TN
        valid_b = col < N_valid
        valid = valid_b.astype(jnp.float32)
        zero = jnp.zeros((TF, TN), jnp.float32)

        def msk(t):
            return jnp.where(valid_b, t, zero)

        def rsum(t):
            """sum over frames -> (TF, 1); None sums to an exact-zero tile."""
            if t is None:
                return jnp.zeros((TF, 1), jnp.float32)
            return jnp.sum(t, axis=1, keepdims=True)

        x0 = (msk(x4_ref[0]), msk(x4_ref[1]))
        x1 = (msk(x4_ref[2]), msk(x4_ref[3]))
        sig = sig_ref[:]                     # (TF, 1)
        v = [msk(v_ref[j]) for j in range(J)]   # (TF, TN) each

        # per-source mixing columns (per-f rows broadcast over frames):
        # A_ref[j] layout (TF, 4*Rmax): columns r -> [a0r, a0i, a1r, a1i].
        Acol = []
        for j in range(J):
            cols = []
            for r in range(ranks[j]):
                o = 4 * r
                cols.append((
                    (A_ref[j, :, o:o + 1],
                     None if real_cov else A_ref[j, :, o + 1:o + 2]),
                    (A_ref[j, :, o + 2:o + 3],
                     None if real_cov else A_ref[j, :, o + 3:o + 4])))
            Acol.append(cols)

        # Spatial invariants derived IN-TILE from the mixing columns (all
        # (TF, 1) math, riding along with the kernel instead of a chain of
        # small per-iteration XLA ops on (F,)-sized arrays): packed
        # R_j = A_j A_j^H entries, tr(R_j), and the Lagrange cross terms
        # X_jk = sum_rs |A_j[0,r] A_k[1,s] - A_j[1,r] A_k[0,s]|^2 of the
        # cancellation-free determinant (estep.cross_terms).
        Ra = [sum(_cabs2(Acol[j][r][0]) for r in range(ranks[j]))
              for j in range(J)]
        Rd = [sum(_cabs2(Acol[j][r][1]) for r in range(ranks[j]))
              for j in range(J)]
        Rb = []
        for j in range(J):
            prods = [_cmul(Acol[j][r][0], _cconj(Acol[j][r][1]))
                     for r in range(ranks[j])]
            Rb.append((sum(pr[0] for pr in prods),
                       None if real_cov else sum(pr[1] for pr in prods)))
        Rbr = [Rb[j][0] for j in range(J)]
        Rbi = [Rb[j][1] for j in range(J)]
        trR = [Ra[j] + Rd[j] for j in range(J)]  # (TF, 1)
        Xc = {}
        for j in range(J):
            for k in range(J):
                acc = None
                for r in range(ranks[j]):
                    for s_ in range(ranks[k]):
                        c = _csub(_cmul(Acol[j][r][0], Acol[k][s_][1]),
                                  _cmul(Acol[j][r][1], Acol[k][s_][0]))
                        acc = _na(acc, _cabs2(c))
                Xc[(j, k)] = acc

        a = sig + sum(v[j] * Ra[j] for j in range(J))
        d = sig + sum(v[j] * Rd[j] for j in range(J))
        b = (sum(v[j] * Rbr[j] for j in range(J)),
             None if real_cov
             else sum(v[j] * Rbi[j] for j in range(J)))
        lin = sum(v[j] * trR[j] for j in range(J))
        quad = 0.5 * sum(v[j] * v[k] * Xc[(j, k)]
                         for j in range(J) for k in range(J))
        det = sig * sig + sig * lin + quad
        rinv = _recip(det)

        def sxi_apply(u0, u1):
            """Sigma_x^-1 @ (u0, u1) via the adjugate [d, -b; -conj(b), a]."""
            y0 = _cscale(rinv, _csub(_cscale(d, u0), _cmul(b, u1)))
            y1 = _cscale(rinv, _csub(_cscale(a, u1), _cmul(_cconj(b), u0)))
            return y0, y1

        y0, y1 = sxi_apply(x0, x1)

        tr_sxi_rxx = jnp.maximum(
            _cdot_conj(x0, y0)[0] + _cdot_conj(x1, y1)[0], 0.0)
        if ns_inj:
            # 'ann_ns_inj': observed covariance becomes x x^H + sigma I
            tr_sxi_rxx = tr_sxi_rxx + sig * (a + d) * rinv

        ll_term = tr_sxi_rxx if no_ll else jnp.log(det) + tr_sxi_rxx
        accum(ll_ref, slice(None),
              jnp.sum(ll_term * valid, axis=1, keepdims=True))

        # w_j,r = A_j[:, r]^H y  and  u_j,r = Sigma_x^-1 A_j[:, r]
        w = [[_cadd(_cmul(_cconj(Acol[j][r][0]), y0),
                    _cmul(_cconj(Acol[j][r][1]), y1))
              for r in range(ranks[j])] for j in range(J)]
        sxiA = [[sxi_apply(Acol[j][r][0], Acol[j][r][1])
                 for r in range(ranks[j])] for j in range(J)]

        for j in range(J):
            trCR = sum(_cabs2(w[j][r]) for r in range(ranks[j]))
            if ns_inj:
                trCR = trCR + sig * sum(
                    _cabs2(sxiA[j][r][0]) + _cabs2(sxiA[j][r][1])
                    for r in range(ranks[j]))

            # leave-one-out S_j entries + cancellation-free determinant
            aS = sig + sum(v[k] * Ra[k] for k in range(J) if k != j)
            dS = sig + sum(v[k] * Rd[k] for k in range(J) if k != j)
            bS = (sum(v[k] * Rbr[k] for k in range(J) if k != j),
                  None if real_cov
                  else sum(v[k] * Rbi[k] for k in range(J) if k != j))
            linS = sum(v[k] * trR[k] for k in range(J) if k != j)
            quadS = 0.5 * sum(v[k] * v[l] * Xc[(k, l)]
                              for k in range(J) for l in range(J)
                              if k != j and l != j)
            detS = sig * sig + sig * linS + quadS
            rinvS = _recip(detS)

            def sji_apply(u0, u1):
                z0 = _cscale(rinvS, _csub(_cscale(dS, u0), _cmul(bS, u1)))
                z1 = _cscale(rinvS, _csub(_cscale(aS, u1),
                                          _cmul(_cconj(bS), u0)))
                return z0, z1

            # M_rs = A_j[:, r]^H S_j^-1 A_j[:, s]  (R x R Hermitian)
            sjA = [sji_apply(Acol[j][s][0], Acol[j][s][1])
                   for s in range(ranks[j])]
            M = [[_cadd(_cmul(_cconj(Acol[j][r][0]), sjA[s][0]),
                        _cmul(_cconj(Acol[j][r][1]), sjA[s][1]))
                  for s in range(ranks[j])] for r in range(ranks[j])]

            if ranks[j] == 1:
                den = 1.0 + v[j] * M[0][0][0]
                coef = _recip(den)
                accum(t4_ref, j, jnp.concatenate(
                    [jnp.sum(v[j] / den, axis=1, keepdims=True),
                     jnp.zeros((TF, 3), det.dtype)], axis=1))
            else:
                # G = I_2 + v M (Hermitian PD, det >= 1): closed-form inverse
                g00 = 1.0 + v[j] * M[0][0][0]
                g11 = 1.0 + v[j] * M[1][1][0]
                g01 = _cscale(v[j], M[0][1])
                dG = jnp.maximum(g00 * g11 - _cabs2(g01), 1.0)
                rG = _recip(dG)
                coef = (g00 + g11) * rG
                t4_tile = jnp.concatenate([
                    rsum(v[j] * g11 * rG),
                    rsum(v[j] * g00 * rG),
                    rsum(_m(_m(-v[j], g01[0]), rG)),
                    rsum(_m(_m(-v[j], g01[1]), rG)),
                ], axis=1)
                accum(t4_ref, j, t4_tile)

            xi_ref[j] = (v[j] * v[j] * trCR + v[j] * coef) / ranks[j]

            # Txs_j = sum_n v_j x w_j^H : per column r -> [x0 w*, x1 w*]
            txs_cols = []
            for r in range(ranks[j]):
                cw = _cconj(w[j][r])
                p0 = _cmul(x0, cw)
                p1 = _cmul(x1, cw)
                if ns_inj:
                    p0 = _cadd(p0, _cscale(sig, sxiA[j][r][0]))
                    p1 = _cadd(p1, _cscale(sig, sxiA[j][r][1]))
                for comp_ in (p0[0], p0[1], p1[0], p1[1]):
                    txs_cols.append(rsum(_m(v[j], comp_)))
            txs_tile = jnp.concatenate(
                txs_cols + [jnp.zeros((TF, 4 * (Rmax - ranks[j])),
                                      det.dtype)] if ranks[j] < Rmax
                else txs_cols, axis=1)
            accum(txs_ref, j, txs_tile)

        for j in range(J):
            for k in range(J):
                vv = v[j] * v[k]
                cols = []
                for r in range(ranks[j]):
                    for s in range(ranks[k]):
                        # Tss: v_j v_k w_j,r conj(w_k,s)
                        pr = _cmul(w[j][r], _cconj(w[k][s]))
                        if ns_inj:
                            # + sigma v_j v_k z_j,r^H z_k,s
                            zc = _cadd(
                                _cdot_conj(sxiA[j][r][0], sxiA[k][s][0]),
                                _cdot_conj(sxiA[j][r][1], sxiA[k][s][1]))
                            pr = _cadd(pr, _cscale(sig, zc))
                        cols.append(rsum(_m(vv, pr[0])))
                        cols.append(rsum(_m(vv, pr[1])))
                pad = 2 * (Rmax * Rmax - ranks[j] * ranks[k])
                if pad:
                    cols.append(jnp.zeros((TF, pad), det.dtype))
                accum(tss_ref, (j, k), jnp.concatenate(cols, axis=1))

                if j != k:
                    cols7 = []
                    for r in range(ranks[j]):
                        for s in range(ranks[k]):
                            # T7: v_j v_k A_j,r^H Sigma_x^-1 A_k,s
                            m = _cadd(
                                _cmul(_cconj(Acol[j][r][0]), sxiA[k][s][0]),
                                _cmul(_cconj(Acol[j][r][1]), sxiA[k][s][1]))
                            cols7.append(rsum(_m(vv, m[0])))
                            cols7.append(rsum(_m(vv, m[1])))
                    if pad:
                        cols7.append(jnp.zeros((TF, pad), det.dtype))
                    accum(t7_ref, (j, k), jnp.concatenate(cols7, axis=1))
                else:
                    accum(t7_ref, (j, k),
                          jnp.zeros((TF, 2 * Rmax * Rmax), det.dtype))

    return kernel


def pack_x4(X: jnp.ndarray) -> jnp.ndarray:
    """(F, N, 2) complex STFT -> the kernel's (4, F, N) real plane layout.

    X is constant across GEM iterations: callers running a loop should pack
    ONCE outside it (run_gem does) -- repacking per iteration costs ~10 MB
    of HBM traffic per iteration at bench shapes.
    """
    return jnp.stack([jnp.real(X[..., 0]), jnp.imag(X[..., 0]),
                      jnp.real(X[..., 1]), jnp.imag(X[..., 1])])


@functools.partial(jax.jit,
                   static_argnames=("ranks", "ns_inj", "interpret", "tf",
                                    "no_ll", "real_cov", "fast_recip"))
def pallas_estep(x4: jnp.ndarray, v: jnp.ndarray,
                 A4: jnp.ndarray, sigma: jnp.ndarray,
                 ranks: Tuple[int, ...], ns_inj: bool = False,
                 interpret: bool = False, tf: int = 32,
                 no_ll: bool = False, real_cov: bool = False,
                 fast_recip: bool = False):
    """Run the fused kernel.

    x4 (4, F, N) packed mixture (pack_x4); v (J, F, N); A4 (J, F, 4*Rmax)
    real mixing columns [Re A0r, Im A0r, Re A1r, Im A1r] per sub-source r;
    sigma (F,). The spatial covariance entries, traces, and Lagrange cross
    terms are derived from A4 inside the kernel ((TF, 1) tile math), so no
    per-iteration chain of small (F,)-sized XLA ops feeds it. Returns
    packed-real (xi, txs, tss, t4, t7, loglik); see pallas_suff_stats for
    complex views.

    No host-visible padding: block shapes need not divide (F, N) -- the
    kernel masks the ragged frame edge itself and out-of-range frequency
    rows are dropped at the block write, so the (J, F, N)-sized operands
    avoid a pad copy in and a slice copy out every iteration (~14 MB/iter
    of HBM traffic at bench shapes).
    """
    J, F, N = v.shape
    Rmax = max(ranks)
    # Large tiles: VMEM comfortably holds (TF, TN) f32 working sets for the
    # ~12 live arrays, and a single frame-tile avoids the accumulation
    # revisits entirely for typical clip lengths.
    TF = tf
    TN = min(_cdiv(N, 128) * 128, 2048)
    sp = sigma[:, None]

    grid = (_cdiv(F, TF), _cdiv(N, TN))

    def fmap(i, j):
        return (0, i, 0)

    in_specs = [
        pl.BlockSpec((4, TF, TN), lambda i, j: (0, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((J, TF, TN), lambda i, j: (0, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((J, TF, 4 * Rmax), fmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((TF, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((J, TF, TN), lambda i, j: (0, i, j),
                     memory_space=pltpu.VMEM),                    # xi
        pl.BlockSpec((J, TF, 4 * Rmax), fmap,
                     memory_space=pltpu.VMEM),                    # txs
        pl.BlockSpec((J, J, TF, 2 * Rmax * Rmax),
                     lambda i, j: (0, 0, i, 0),
                     memory_space=pltpu.VMEM),                    # tss
        pl.BlockSpec((J, TF, 4), fmap, memory_space=pltpu.VMEM),  # t4
        pl.BlockSpec((J, J, TF, 2 * Rmax * Rmax),
                     lambda i, j: (0, 0, i, 0),
                     memory_space=pltpu.VMEM),                    # t7
        pl.BlockSpec((TF, 1), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),                    # ll
    ]
    out_shape = [
        jax.ShapeDtypeStruct((J, F, N), jnp.float32),
        jax.ShapeDtypeStruct((J, F, 4 * Rmax), jnp.float32),
        jax.ShapeDtypeStruct((J, J, F, 2 * Rmax * Rmax), jnp.float32),
        jax.ShapeDtypeStruct((J, F, 4), jnp.float32),
        jax.ShapeDtypeStruct((J, J, F, 2 * Rmax * Rmax), jnp.float32),
        jax.ShapeDtypeStruct((F, 1), jnp.float32),
    ]
    kernel = _make_kernel(ranks, TF, TN, N, ns_inj=ns_inj, no_ll=no_ll,
                          real_cov=real_cov,
                          fast_recip=fast_recip and not interpret)
    xi, txs, tss, t4, t7, llf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x4, v, A4, sp)

    loglik = -jnp.sum(llf[:, 0])
    return xi, txs, tss, t4, t7, loglik


def pallas_available() -> bool:
    """The compiled kernel needs a TPU lowering (axon lowers via tpu);
    other accelerators (GPU) must take the XLA path."""
    return jax.default_backend() in ("tpu", "axon")


def pallas_geometry_ok(F: int) -> bool:
    """Trace-time geometry gate for the fused kernel.

    The kernel is tuned for STFT-like planes (F >= 257). On WARPED
    planes with few bands and very long frame axes (uniform-hop ERBlet:
    F = 48, N = 16384 at the flagship clip) the Mosaic/XLA allocator
    places the custom call's full result tuple in scoped VMEM (S(1)) --
    the per-band outputs look small enough -- and the 18 MB tuple blows
    the 16 MB scoped-vmem stack limit AT COMPILE TIME (measured round 5,
    scenario_erblet: 'Ran out of memory in memory space vmem ...
    allocating on stack for %pallas_estep'). Small-F planes gain little
    from the kernel anyway (the F axis is the tile axis), so they take
    the XLA path."""
    return F >= 128


def pallas_suff_stats(X, v, Rj, sigma, ranks, A_conv, eps: float = 1e-30,
                      noise_inject: bool = False, interpret: bool = False,
                      x4=None, real_cov: bool = False,
                      fast_recip: bool = False):
    """Drop-in replacement for estep.compute_suff_stats (ranks in {1, 2}).
    Returns an estep.SuffStats. Pass x4=pack_x4(X) (precomputed once) when
    calling inside a loop; X is then ignored. real_cov=True asserts every
    mixing column is REAL (instantaneous models): the kernel then drops all
    arithmetic on the identically-zero imaginary parts (~25-30%% of the VPU
    work; the E-step is compute-bound)."""
    from pyfasst_tpu.ops.estep import SuffStats

    assert all(r in (1, 2) for r in ranks)
    if x4 is None:
        x4 = pack_x4(X)
    J = v.shape[0]
    Rmax = max(ranks)
    A4 = jnp.stack([
        jnp.concatenate(
            [jnp.stack([jnp.real(A_conv[j][:, 0, r]),
                        jnp.imag(A_conv[j][:, 0, r]),
                        jnp.real(A_conv[j][:, 1, r]),
                        jnp.imag(A_conv[j][:, 1, r])], axis=-1)
             for r in range(ranks[j])]
            + ([jnp.zeros((v.shape[1], 4 * (Rmax - ranks[j])), jnp.float32)]
               if ranks[j] < Rmax else []), axis=-1)
        for j in range(J)])                                   # (J, F, 4*Rmax)
    xi, txs, tss, t4, t7, loglik = pallas_estep(
        x4, v, A4, sigma, ranks=tuple(ranks),
        ns_inj=noise_inject, interpret=interpret, real_cov=real_cov,
        fast_recip=fast_recip)
    xi = jnp.maximum(xi, eps)

    def c_(re, im):
        return re + 1j * im

    Txs = []
    for j in range(J):
        R = ranks[j]
        cols = txs[j].reshape(-1, Rmax, 4)[:, :R]              # (F, R, 4)
        Txs.append(jnp.stack([c_(cols[..., 0], cols[..., 1]),
                              c_(cols[..., 2], cols[..., 3])], axis=1))
    Tss, T7 = [], []
    for j in range(J):
        row_ss, row_7 = [], []
        for k in range(J):
            Rj_, Rk_ = ranks[j], ranks[k]
            blk = tss[j, k][:, :2 * Rj_ * Rk_].reshape(-1, Rj_, Rk_, 2)
            row_ss.append(c_(blk[..., 0], blk[..., 1]))
            if j == k:
                row_7.append(None)
            else:
                blk7 = t7[j, k][:, :2 * Rj_ * Rk_].reshape(-1, Rj_, Rk_, 2)
                row_7.append(c_(blk7[..., 0], blk7[..., 1]))
        Tss.append(tuple(row_ss))
        T7.append(tuple(row_7))
    T4 = tuple(t4[j][:, 0] if ranks[j] == 1 else t4[j]
               for j in range(J))
    return SuffStats(xi=xi, Txs=tuple(Txs), Tss=Tss and tuple(Tss),
                     T4=T4, T7=tuple(T7), loglik=loglik)
