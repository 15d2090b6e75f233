"""Online / streaming GEM tests (PAPERS.md arXiv:1112.6178 capability)."""
import numpy as np
import jax
import jax.numpy as jnp

from pyfasst_tpu.ops.online import run_gem_online


def _panned_problem(rng, F=49, N=160, J=2):
    bands = [(3, 16), (26, 42)]
    dirs = [np.array([0.95, 0.31]), np.array([0.31, 0.95])]
    Y_true, X = [], 0.0
    for j in range(J):
        lo, hi = bands[j]
        s = np.zeros((F, N), complex)
        s[lo:hi] = (rng.standard_normal((hi - lo, N))
                    + 1j * rng.standard_normal((hi - lo, N)))
        img = dirs[j][None, None, :] * s[..., None]
        Y_true.append(img)
        X = X + img
    return jnp.asarray(X, jnp.complex64), np.stack(Y_true), dirs


def test_online_gem_runs_and_learns_directions(rng):
    X, Y_true, dirs = _panned_problem(rng)
    F, N = X.shape[:2]
    J, K = 2, 3
    n_blocks, Nb = 8, N // 8
    A0 = jnp.asarray(np.stack([
        np.array([[0.87], [0.49]]) @ np.ones((1, 1)),
        np.array([[0.52], [0.91]]) @ np.ones((1, 1))])[..., 0],
        jnp.complex64)                                    # (J, F?) fix below
    A0 = jnp.broadcast_to(A0[:, None, :], (J, F, 2)).astype(jnp.complex64)
    FB0 = jnp.asarray(0.5 + rng.random((J, F, K)), jnp.float32)
    TW0 = jnp.asarray(0.5 + rng.random((J, K, Nb)), jnp.float32)
    sigma = jnp.full((F,), 1e-3, jnp.float32)

    A, FB, TW_all, logliks = jax.block_until_ready(run_gem_online(
        A0, FB0, TW0, X, sigma, n_blocks=n_blocks, forgetting=0.9,
        inner_iters=6))
    logliks = np.asarray(logliks)
    assert np.all(np.isfinite(logliks))
    assert TW_all.shape == (J, K, N)
    # later blocks should fit better than the first (params adapt)
    assert logliks[-1] > logliks[0]

    # learned directions align with the true panning (up to scale/phase)
    A = np.asarray(A)
    for j in range(2):
        a = A[j].mean(axis=0)
        a = np.abs(a) / np.linalg.norm(a)
        cors = [abs(a @ (d / np.linalg.norm(d))) for d in dirs]
        assert max(cors) > 0.95, (j, a, cors)


def test_online_spectral_patterns_localize(rng):
    X, Y_true, dirs = _panned_problem(rng)
    F, N = X.shape[:2]
    J, K = 2, 3
    n_blocks, Nb = 8, N // 8
    A0 = jnp.broadcast_to(jnp.asarray(
        np.stack([[0.87, 0.49], [0.52, 0.91]]), jnp.complex64)[:, None, :],
        (J, F, 2))
    FB0 = jnp.asarray(0.5 + rng.random((J, F, K)), jnp.float32)
    TW0 = jnp.asarray(0.5 + rng.random((J, K, Nb)), jnp.float32)
    sigma = jnp.full((F,), 1e-3, jnp.float32)
    A, FB, TW_all, ll = jax.block_until_ready(run_gem_online(
        A0, FB0, TW0, X, sigma, n_blocks=n_blocks, inner_iters=6))
    FB = np.asarray(FB)
    # each source's learned spectral energy should concentrate in its band
    e0_band0 = FB[0, 3:16].sum() / FB[0].sum()
    e1_band1 = FB[1, 26:42].sum() / FB[1].sum()
    # permutation-tolerant check
    e0_band1 = FB[0, 26:42].sum() / FB[0].sum()
    e1_band0 = FB[1, 3:16].sum() / FB[1].sum()
    straight = min(e0_band0, e1_band1)
    flipped = min(e0_band1, e1_band0)
    assert max(straight, flipped) > 0.6, (straight, flipped)
