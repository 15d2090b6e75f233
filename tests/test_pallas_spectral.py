"""Fused spectral M-step kernels vs the XLA path (interpret mode, CPU).

The fused path must reproduce mstep.update_spectral exactly (same
sequential FB-then-TW updates, same clamps and floors) on eligible
params; tolerances cover matmul reduction-order differences only.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pyfasst_tpu.models.components import (
    FasstParams, SpatialComp, SpectralComp, init_inst_mixing,
)
from pyfasst_tpu.ops.estep import compute_suff_stats
from pyfasst_tpu.ops.gem import spatial_covs
from pyfasst_tpu.ops.mstep import _as_conv_A, update_spectral
from pyfasst_tpu.ops import pallas_spectral


def _setup(F, N, J=2, K=5, seed=0):
    rng = np.random.default_rng(seed)
    spat = tuple(SpatialComp(A=a)
                 for a in init_inst_mixing(None, 2, 1, J))
    spec = tuple(SpectralComp(
        FB=jnp.asarray(0.5 + rng.random((F, K)), jnp.float32),
        TW=jnp.asarray(0.5 + rng.random((K, N)), jnp.float32),
        spat_ind=j) for j in range(J))
    params = FasstParams(spat=spat, spec=spec)
    X = jnp.asarray(rng.standard_normal((F, N, 2))
                    + 1j * rng.standard_normal((F, N, 2)), jnp.complex64)
    v = params.all_source_powers()
    Rj = spatial_covs(params, F)
    A_conv = tuple(_as_conv_A(c, F) for c in params.spat)
    sigma = jnp.asarray(0.05 + 0.01 * rng.random(F), jnp.float32)
    ranks = tuple(c.rank for c in params.spat)
    stats = compute_suff_stats(X, v, Rj, sigma, ranks, A_conv=A_conv)
    return params, stats, v


@pytest.mark.parametrize("F,N", [(64, 128), (37, 95), (130, 300)])
def test_fused_matches_xla(F, N):
    params, stats, v = _setup(F, N)
    ref = update_spectral(params, stats, v=v)
    got = pallas_spectral.fused_spectral_update(params, stats,
                                               interpret=True)
    for c_ref, c_got in zip(ref.spec, got.spec):
        np.testing.assert_allclose(np.asarray(c_got.FB),
                                   np.asarray(c_ref.FB),
                                   rtol=2e-5, atol=1e-30)
        np.testing.assert_allclose(np.asarray(c_got.TW),
                                   np.asarray(c_ref.TW),
                                   rtol=2e-5, atol=1e-30)


def test_fused_matches_xla_three_sources():
    params, stats, v = _setup(70, 211, J=3, K=4, seed=3)
    ref = update_spectral(params, stats, v=v)
    got = pallas_spectral.fused_spectral_update(params, stats,
                                               interpret=True)
    for c_ref, c_got in zip(ref.spec, got.spec):
        np.testing.assert_allclose(np.asarray(c_got.FB),
                                   np.asarray(c_ref.FB), rtol=2e-5)
        np.testing.assert_allclose(np.asarray(c_got.TW),
                                   np.asarray(c_ref.TW), rtol=2e-5)


def test_eligibility_gates():
    params, _, _ = _setup(32, 64)
    assert pallas_spectral.eligible(params)
    # ERB-style fixed-FB chain is not eligible
    spec0 = params.spec[0]
    bad = params.replace(spec=(
        spec0.replace(free=(False, True, True, False)),) + params.spec[1:])
    assert not pallas_spectral.eligible(bad)
    # SIMM chain is not eligible
    bad2 = params.replace(spec=(
        spec0.replace(FB2=spec0.FB, TW2=spec0.TW),) + params.spec[1:])
    assert not pallas_spectral.eligible(bad2)
    # mismatched NMF ranks are not eligible
    rng = np.random.default_rng(0)
    bad3 = params.replace(spec=(
        spec0.replace(FB=jnp.asarray(rng.random((32, 7)), jnp.float32),
                      TW=jnp.asarray(rng.random((7, 64)), jnp.float32)),
    ) + params.spec[1:])
    assert not pallas_spectral.eligible(bad3)


def test_fused_in_gem_loop_cpu_interpret():
    """A short GEM run where each iteration's spectral step goes through
    the fused path (interpret) must track the XLA run closely."""
    from pyfasst_tpu.ops.gem import noise_psd, annealing_endpoints, gem_step
    from pyfasst_tpu.utils.config import GEMConfig

    params, stats, v = _setup(48, 100)
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.standard_normal((48, 100, 2))
                    + 1j * rng.standard_normal((48, 100, 2)), jnp.complex64)
    cfg = GEMConfig(niter=6, use_pallas=False)
    sigma0, sigma1 = annealing_endpoints(X, cfg)

    pa = pb = params
    for it in range(6):
        sigma = noise_psd(it, 6, sigma0, sigma1, cfg.annealing)
        pa, lla = gem_step(pa, X, sigma, cfg)
        # manual fused step: same E-step/spatial, fused spectral
        from pyfasst_tpu.ops.mstep import update_spatial
        from pyfasst_tpu.ops.mstep import renormalize
        vb = pb.all_source_powers()
        Rj = spatial_covs(pb, 48)
        A_conv = tuple(_as_conv_A(c, 48) for c in pb.spat)
        stats = compute_suff_stats(X, vb, Rj, sigma,
                                   tuple(c.rank for c in pb.spat),
                                   A_conv=A_conv)
        pb = update_spatial(pb, stats, sigma)
        pb = pallas_spectral.fused_spectral_update(pb, stats,
                                                  interpret=True)
        pb = renormalize(pb)
        llb = stats.loglik
    np.testing.assert_allclose(float(llb), float(lla), rtol=1e-4)
    for ca, cb in zip(pa.spec, pb.spec):
        np.testing.assert_allclose(np.asarray(cb.FB), np.asarray(ca.FB),
                                   rtol=5e-3)
