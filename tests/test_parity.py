"""GEM engine parity vs the float64 NumPy oracle (SURVEY.md §4).

The oracle (tests/oracle) stands in for the reference while /root/reference
is empty. In x64 mode the JAX engine and the oracle implement identical
arithmetic (same eps, floors, schedule, update order), so agreement to ~1e-6
relative after 10 full GEM iterations is the pass bar ("bit-level parity on
the CPU path" in BASELINE.json -- up to associativity-of-summation noise).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import enable_x64

from pyfasst_tpu.models.components import (
    FasstParams, SpatialComp, SpectralComp,
)
from pyfasst_tpu.ops.gem import run_gem
from pyfasst_tpu.utils.config import GEMConfig
from tests.oracle import oracle_gem_run, oracle_separate, params_from_pytree
from tests.oracle.fasst_oracle import (
    annealing_endpoints as np_annealing_endpoints,
)


def _tiny_problem(rng, F=33, N=40, J=2, K=3, dtype=np.float64,
                  mix_type="inst"):
    X = (rng.standard_normal((F, N, 2)) + 1j * rng.standard_normal((F, N, 2))
         ).astype(np.complex128)
    # spectrally color the two channels so sources are identifiable
    X[:, :, 0] *= np.linspace(0.5, 2.0, F)[:, None]
    spat, spec = [], []
    for j in range(J):
        if mix_type == "inst":
            A = np.abs(rng.standard_normal((2, 1))) + 0.3
        else:
            A = (rng.standard_normal((F, 2, 1))
                 + 1j * rng.standard_normal((F, 2, 1))) * 0.5
        spat.append(SpatialComp(A=jnp.asarray(A), mix_type=mix_type,
                                free=True))
        spec.append(SpectralComp(
            FB=jnp.asarray(0.5 + rng.random((F, K))),
            TW=jnp.asarray(0.5 + rng.random((K, N))),
            spat_ind=j, free=(True, False, True, False)))
    return X, FasstParams(spat=tuple(spat), spec=tuple(spec))


@pytest.mark.parametrize("annealing", ["ann", "no_ann", "ann_ns_inj"])
def test_gem_parity_x64(rng, annealing):
    with enable_x64():
        X, params = _tiny_problem(rng)
        niter = 10
        cfg = GEMConfig(niter=niter, annealing=annealing)
        oparams = params_from_pytree(params)

        Xj = jnp.asarray(X)
        got_params, got_ll = jax.block_until_ready(run_gem(params, Xj, cfg))

        oparams, want_ll = oracle_gem_run(oparams, X, niter,
                                          annealing=annealing)

        np.testing.assert_allclose(np.asarray(got_ll), want_ll, rtol=1e-6)
        for j in range(2):
            np.testing.assert_allclose(np.asarray(got_params.spat[j].A),
                                       oparams.spat[j].A, rtol=1e-5, atol=1e-9)
            np.testing.assert_allclose(np.asarray(got_params.spec[j].FB),
                                       oparams.spec[j].FB, rtol=1e-5, atol=1e-12)
            np.testing.assert_allclose(np.asarray(got_params.spec[j].TW),
                                       oparams.spec[j].TW, rtol=1e-5, atol=1e-12)


def test_gem_parity_conv_x64(rng):
    with enable_x64():
        X, params = _tiny_problem(rng, mix_type="conv")
        cfg = GEMConfig(niter=8)
        oparams = params_from_pytree(params)
        Xj = jnp.asarray(X)
        got_params, got_ll = jax.block_until_ready(run_gem(params, Xj, cfg))
        oparams, want_ll = oracle_gem_run(oparams, X, 8)
        np.testing.assert_allclose(np.asarray(got_ll), want_ll, rtol=1e-6)
        for j in range(2):
            np.testing.assert_allclose(np.asarray(got_params.spat[j].A),
                                       oparams.spat[j].A, rtol=1e-4, atol=1e-8)


def test_separation_parity_x64(rng):
    with enable_x64():
        X, params = _tiny_problem(rng)
        cfg = GEMConfig(niter=5)
        Xj = jnp.asarray(X)
        params2, _ = run_gem(params, Xj, cfg)

        from pyfasst_tpu.ops.gem import annealing_endpoints
        from pyfasst_tpu.ops.wiener import separate_sources
        _, sigma1 = annealing_endpoints(Xj, cfg)
        got = np.asarray(separate_sources(params2, jnp.asarray(X), sigma1))

        oparams, _ = oracle_gem_run(params_from_pytree(params), X, 5)
        _, osig = np_annealing_endpoints(X, 1e-2, 3e-6)
        want = oracle_separate(oparams, X, osig)
        np.testing.assert_allclose(got, want, rtol=5e-5, atol=1e-6)


def test_f32_tracks_oracle_loosely(rng):
    """The default f32 TPU path should track the f64 oracle to ~1% loglik."""
    X, params = _tiny_problem(rng)
    params = jax.tree.map(
        lambda a: a.astype(jnp.complex64) if jnp.iscomplexobj(a)
        else a.astype(jnp.float32), params)
    cfg = GEMConfig(niter=10)
    Xj = jnp.asarray(X, jnp.complex64)
    _, got_ll = jax.block_until_ready(run_gem(params, Xj, cfg))
    _, want_ll = oracle_gem_run(params_from_pytree(params), X, 10)
    np.testing.assert_allclose(np.asarray(got_ll), want_ll, rtol=1e-2)


@pytest.mark.parametrize("constraint", ["GMM", "HMM"])
def test_gem_parity_state_models_x64(rng, constraint):
    """x64 engine vs oracle for the GSMM/HMM spectral E-step (configs[3])."""
    with enable_x64():
        F, N, Q = 21, 18, 3
        X = (rng.standard_normal((F, N, 2))
             + 1j * rng.standard_normal((F, N, 2)))
        trans = (np.full(Q, 1.0 / Q) if constraint == "GMM"
                 else 0.8 * np.eye(Q) + 0.1 * (1 - np.eye(Q)))
        spat = (SpatialComp(A=jnp.asarray([[0.9], [0.4]])),
                SpatialComp(A=jnp.asarray([[0.4], [0.9]])))
        spec = (SpectralComp(FB=jnp.asarray(0.5 + rng.random((F, Q))),
                             TW=jnp.asarray(0.5 + rng.random((Q, N))),
                             trans=jnp.asarray(trans), spat_ind=0,
                             free=(True, False, True, False),
                             constraint=constraint),
                SpectralComp(FB=jnp.asarray(0.5 + rng.random((F, 2))),
                             TW=jnp.asarray(0.5 + rng.random((2, N))),
                             spat_ind=1))
        params = FasstParams(spat=spat, spec=spec)
        cfg = GEMConfig(niter=8)
        oparams = params_from_pytree(params)
        got_params, got_ll = jax.block_until_ready(
            run_gem(params, jnp.asarray(X), cfg))
        oparams, want_ll = oracle_gem_run(oparams, X, 8)
        np.testing.assert_allclose(np.asarray(got_ll), want_ll, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got_params.spec[0].TW),
                                   oparams.spec[0].TW, rtol=1e-4, atol=1e-10)
        np.testing.assert_allclose(np.asarray(got_params.spec[0].FB),
                                   oparams.spec[0].FB, rtol=1e-4, atol=1e-10)
