"""Fused Pallas E-step kernel vs the XLA path (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from pyfasst_tpu.models.components import FasstParams, SpatialComp, SpectralComp
from pyfasst_tpu.ops.estep import compute_suff_stats
from pyfasst_tpu.ops.gem import spatial_covs
from pyfasst_tpu.ops.mstep import _as_conv_A
from pyfasst_tpu.ops.pallas_estep import pallas_suff_stats


def _problem(rng, F=33, N=70, J=2, K=3):
    X = jnp.asarray(rng.standard_normal((F, N, 2))
                    + 1j * rng.standard_normal((F, N, 2)), jnp.complex64)
    spat = tuple(SpatialComp(A=jnp.asarray(
        np.abs(rng.standard_normal((2, 1))) + 0.3, jnp.float32))
        for _ in range(J))
    spec = tuple(SpectralComp(
        FB=jnp.asarray(0.5 + rng.random((F, K)), jnp.float32),
        TW=jnp.asarray(0.5 + rng.random((K, N)), jnp.float32),
        spat_ind=j) for j in range(J))
    params = FasstParams(spat=spat, spec=spec)
    v = params.all_source_powers()
    Rj = spatial_covs(params, F)
    A_conv = tuple(_as_conv_A(c, F) for c in params.spat)
    sigma = jnp.asarray(0.01 + 0.005 * rng.random(F), jnp.float32)
    return X, v, Rj, A_conv, sigma, (1,) * J


def test_pallas_estep_matches_xla(rng):
    X, v, Rj, A_conv, sigma, ranks = _problem(rng)
    want = compute_suff_stats(X, v, Rj, sigma, ranks, A_conv=A_conv)
    got = pallas_suff_stats(X, v, Rj, sigma, ranks, A_conv, interpret=True)

    np.testing.assert_allclose(np.asarray(got.xi), np.asarray(want.xi),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(got.loglik), float(want.loglik),
                               rtol=1e-4)
    J = v.shape[0]
    for j in range(J):
        np.testing.assert_allclose(np.asarray(got.Txs[j]),
                                   np.asarray(want.Txs[j]),
                                   rtol=2e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got.T4[j]),
                                   np.asarray(want.T4[j]),
                                   rtol=2e-4, atol=1e-5)
        for k in range(J):
            np.testing.assert_allclose(np.asarray(got.Tss[j][k]),
                                       np.asarray(want.Tss[j][k]),
                                       rtol=2e-4, atol=1e-4)
            if j != k:
                np.testing.assert_allclose(np.asarray(got.T7[j][k]),
                                           np.asarray(want.T7[j][k]),
                                           rtol=2e-4, atol=1e-4)


def test_pallas_estep_three_sources(rng):
    X, v, Rj, A_conv, sigma, ranks = _problem(rng, F=17, N=40, J=3)
    want = compute_suff_stats(X, v, Rj, sigma, ranks, A_conv=A_conv)
    got = pallas_suff_stats(X, v, Rj, sigma, ranks, A_conv, interpret=True)
    np.testing.assert_allclose(np.asarray(got.xi), np.asarray(want.xi),
                               rtol=3e-4, atol=1e-6)
    np.testing.assert_allclose(float(got.loglik), float(want.loglik),
                               rtol=1e-4)


def test_pallas_estep_multitile_accumulation(rng):
    """N > the frame-tile size exercises the cross-tile accumulation of the
    reduced statistics (revisited output blocks)."""
    X, v, Rj, A_conv, sigma, ranks = _problem(rng, F=9, N=2500, J=2)
    want = compute_suff_stats(X, v, Rj, sigma, ranks, A_conv=A_conv)
    got = pallas_suff_stats(X, v, Rj, sigma, ranks, A_conv, interpret=True)
    np.testing.assert_allclose(float(got.loglik), float(want.loglik),
                               rtol=2e-4)
    for j in range(2):
        np.testing.assert_allclose(np.asarray(got.Txs[j]),
                                   np.asarray(want.Txs[j]),
                                   rtol=5e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(got.T4[j]),
                                   np.asarray(want.T4[j]),
                                   rtol=5e-4, atol=1e-4)
        for k in range(2):
            np.testing.assert_allclose(np.asarray(got.Tss[j][k]),
                                       np.asarray(want.Tss[j][k]),
                                       rtol=5e-4, atol=1e-3)


def _rank2_problem(rng, F=21, N=50, J=2):
    X = jnp.asarray(rng.standard_normal((F, N, 2))
                    + 1j * rng.standard_normal((F, N, 2)), jnp.complex64)
    spat = []
    for j in range(J):
        A = (rng.standard_normal((F, 2, 2))
             + 1j * rng.standard_normal((F, 2, 2))) * 0.5
        spat.append(SpatialComp(A=jnp.asarray(A, jnp.complex64),
                                mix_type="conv"))
    spec = tuple(SpectralComp(
        FB=jnp.asarray(0.5 + rng.random((F, 3)), jnp.float32),
        TW=jnp.asarray(0.5 + rng.random((3, N)), jnp.float32),
        spat_ind=j) for j in range(J))
    params = FasstParams(spat=tuple(spat), spec=spec)
    v = params.all_source_powers()
    Rj = spatial_covs(params, F)
    A_conv = tuple(_as_conv_A(c, F) for c in params.spat)
    sigma = jnp.asarray(0.01 + 0.005 * rng.random(F), jnp.float32)
    return X, v, Rj, A_conv, sigma, (2,) * J


def test_pallas_estep_rank2(rng):
    """Full-rank (rank-2) sources through the generated kernel."""
    X, v, Rj, A_conv, sigma, ranks = _rank2_problem(rng)
    want = compute_suff_stats(X, v, Rj, sigma, ranks, A_conv=A_conv)
    got = pallas_suff_stats(X, v, Rj, sigma, ranks, A_conv, interpret=True)
    np.testing.assert_allclose(np.asarray(got.xi), np.asarray(want.xi),
                               rtol=3e-4, atol=1e-5)
    np.testing.assert_allclose(float(got.loglik), float(want.loglik),
                               rtol=1e-4)
    for j in range(2):
        np.testing.assert_allclose(np.asarray(got.Txs[j]),
                                   np.asarray(want.Txs[j]),
                                   rtol=5e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(got.T4[j]),
                                   np.asarray(want.T4[j]),
                                   rtol=5e-4, atol=1e-4)
        for k in range(2):
            np.testing.assert_allclose(np.asarray(got.Tss[j][k]),
                                       np.asarray(want.Tss[j][k]),
                                       rtol=5e-4, atol=1e-3)
            if j != k:
                np.testing.assert_allclose(np.asarray(got.T7[j][k]),
                                           np.asarray(want.T7[j][k]),
                                           rtol=5e-4, atol=1e-3)


def test_pallas_estep_mixed_ranks(rng):
    """One rank-1 + one rank-2 source (padded mixing columns)."""
    F, N = 17, 40
    X = jnp.asarray(rng.standard_normal((F, N, 2))
                    + 1j * rng.standard_normal((F, N, 2)), jnp.complex64)
    A2 = (rng.standard_normal((F, 2, 2))
          + 1j * rng.standard_normal((F, 2, 2))) * 0.5
    spat = (SpatialComp(A=jnp.asarray(np.abs(rng.standard_normal((2, 1)))
                                      + 0.3, jnp.float32)),
            SpatialComp(A=jnp.asarray(A2, jnp.complex64), mix_type="conv"))
    spec = tuple(SpectralComp(
        FB=jnp.asarray(0.5 + rng.random((F, 3)), jnp.float32),
        TW=jnp.asarray(0.5 + rng.random((3, N)), jnp.float32),
        spat_ind=j) for j in range(2))
    params = FasstParams(spat=spat, spec=spec)
    v = params.all_source_powers()
    Rj = spatial_covs(params, F)
    A_conv = tuple(_as_conv_A(c, F) for c in params.spat)
    sigma = jnp.asarray(0.02 + 0.005 * rng.random(F), jnp.float32)
    ranks = (1, 2)
    want = compute_suff_stats(X, v, Rj, sigma, ranks, A_conv=A_conv)
    got = pallas_suff_stats(X, v, Rj, sigma, ranks, A_conv, interpret=True)
    np.testing.assert_allclose(np.asarray(got.xi), np.asarray(want.xi),
                               rtol=3e-4, atol=1e-5)
    np.testing.assert_allclose(float(got.loglik), float(want.loglik),
                               rtol=1e-4)
    for j in range(2):
        np.testing.assert_allclose(np.asarray(got.Txs[j]),
                                   np.asarray(want.Txs[j]),
                                   rtol=5e-4, atol=1e-3)


def test_pallas_estep_noise_inject(rng):
    """'ann_ns_inj' corrections through the kernel (vs XLA path)."""
    X, v, Rj, A_conv, sigma, ranks = _problem(rng, F=17, N=40, J=2)
    want = compute_suff_stats(X, v, Rj, sigma, ranks, A_conv=A_conv,
                              noise_inject=True)
    got = pallas_suff_stats(X, v, Rj, sigma, ranks, A_conv,
                            noise_inject=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got.xi), np.asarray(want.xi),
                               rtol=3e-4, atol=1e-6)
    np.testing.assert_allclose(float(got.loglik), float(want.loglik),
                               rtol=1e-4)
    for j in range(2):
        np.testing.assert_allclose(np.asarray(got.Txs[j]),
                                   np.asarray(want.Txs[j]),
                                   rtol=5e-4, atol=1e-4)
        for k in range(2):
            np.testing.assert_allclose(np.asarray(got.Tss[j][k]),
                                       np.asarray(want.Tss[j][k]),
                                       rtol=5e-4, atol=1e-4)


def test_pallas_estep_real_cov_specialization(rng):
    """real_cov=True (instantaneous/real mixing) must match the generic
    kernel and the XLA path exactly: it only deletes arithmetic on
    identically-zero imaginary parts."""
    X, v, Rj, A_conv, sigma, ranks = _problem(rng)
    want = compute_suff_stats(X, v, Rj, sigma, ranks, A_conv=A_conv)
    got = pallas_suff_stats(X, v, Rj, sigma, ranks, A_conv, interpret=True,
                            real_cov=True)
    np.testing.assert_allclose(np.asarray(got.xi), np.asarray(want.xi),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(got.loglik), float(want.loglik),
                               rtol=1e-4)
    J = v.shape[0]
    for j in range(J):
        np.testing.assert_allclose(np.asarray(got.Txs[j]),
                                   np.asarray(want.Txs[j]),
                                   rtol=2e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got.T4[j]),
                                   np.asarray(want.T4[j]),
                                   rtol=2e-4, atol=1e-5)
        for k in range(J):
            np.testing.assert_allclose(np.asarray(got.Tss[j][k]),
                                       np.asarray(want.Tss[j][k]),
                                       rtol=2e-4, atol=1e-4)
            if j != k:
                # real mixing + real Sigma_x^-1 A columns: T7 is real
                assert float(np.abs(np.imag(np.asarray(
                    got.T7[j][k]))).max()) == 0.0
                np.testing.assert_allclose(np.asarray(got.T7[j][k]),
                                           np.asarray(want.T7[j][k]),
                                           rtol=2e-4, atol=1e-4)


def test_pallas_estep_real_cov_rank2_ns_inj(rng):
    """The specialization composes with rank-2 sources and noise injection."""
    X, v, Rj, A_conv, sigma, _ = _problem(rng, F=17, N=40)
    # promote source 0 to a rank-2 REAL mixing
    A0 = jnp.asarray(np.abs(rng.standard_normal((17, 2, 2))) + 0.3,
                     jnp.float32).astype(jnp.complex64)
    A_conv = (A0,) + A_conv[1:]
    from pyfasst_tpu.ops import herm
    Rj = jnp.stack([herm.herm_from_mixing(A_conv[0]),
                    herm.herm_from_mixing(A_conv[1])])
    ranks = (2, 1)
    want = compute_suff_stats(X, v, Rj, sigma, ranks, A_conv=A_conv,
                              noise_inject=True)
    got = pallas_suff_stats(X, v, Rj, sigma, ranks, A_conv, interpret=True,
                            real_cov=True, noise_inject=True)
    np.testing.assert_allclose(np.asarray(got.xi), np.asarray(want.xi),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(got.loglik), float(want.loglik),
                               rtol=1e-4)
    for j in range(2):
        np.testing.assert_allclose(np.asarray(got.T4[j]),
                                   np.asarray(want.T4[j]),
                                   rtol=2e-4, atol=1e-5)
        for k in range(2):
            np.testing.assert_allclose(np.asarray(got.Tss[j][k]),
                                       np.asarray(want.Tss[j][k]),
                                       rtol=2e-4, atol=1e-4)
