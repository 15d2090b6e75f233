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


def test_stream_blocks_bit_identical_to_full_stft(rng, tmp_path):
    """STFT.stream_blocks must reproduce the whole-file transform exactly
    (same framing/window/DFT code path, block-paged reads)."""
    from pyfasst_tpu.audio import wavwrite
    from pyfasst_tpu.tf.stft import STFT

    fs, n = 8000, 8000 + 123          # deliberately not frame-aligned
    mix = np.clip(0.4 * rng.standard_normal((n, 2)), -1, 1)
    p = str(tmp_path / "long.wav")
    wavwrite(mix, fs, p)

    st = STFT(wlen=256, fs=fs)
    from pyfasst_tpu.audio import wavread
    full = st.computeTransform(wavread(p)[0].astype(np.float32))
    blocks = list(st.stream_blocks(p, frames_per_block=7))
    streamed = jnp.concatenate(blocks, axis=1)
    assert streamed.shape == full.shape
    np.testing.assert_array_equal(np.asarray(jnp.real(streamed)),
                                  np.asarray(jnp.real(full)))
    np.testing.assert_array_equal(np.asarray(jnp.imag(streamed)),
                                  np.asarray(jnp.imag(full)))


def test_online_block_matches_scanned_run(rng):
    """Host-driven online_block carries must equal run_gem_online's scan
    (shared body)."""
    from pyfasst_tpu.ops.online import (
        online_block, online_init, run_gem_online,
    )

    J, F, K, Nb, nb = 2, 17, 3, 16, 4
    X = jnp.asarray(rng.standard_normal((F, nb * Nb, 2))
                    + 1j * rng.standard_normal((F, nb * Nb, 2)),
                    jnp.complex64)
    A0 = jnp.asarray(0.4 + rng.random((J, F, 2)), jnp.float32
                     ).astype(jnp.complex64)
    FB0 = jnp.asarray(0.5 + rng.random((J, F, K)), jnp.float32)
    TW0 = jnp.asarray(0.5 + rng.random((J, K, Nb)), jnp.float32)
    sigma = jnp.full((F,), 0.01, jnp.float32)

    A_ref, FB_ref, TW_ref, ll_ref = run_gem_online(A0, FB0, TW0, X, sigma,
                                                   n_blocks=nb)
    state = online_init(A0, FB0)
    tws, lls = [], []
    for b in range(nb):
        Xb = X[:, b * Nb:(b + 1) * Nb]
        state, (TWb, ll) = online_block(state, Xb, TW0, sigma)
        tws.append(TWb)
        lls.append(float(ll))
    np.testing.assert_allclose(np.asarray(state.A), np.asarray(A_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.FB), np.asarray(FB_ref),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(tws, axis=-1)), np.asarray(TW_ref),
        rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(lls, np.asarray(ll_ref), rtol=1e-5)
