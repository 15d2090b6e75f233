"""Perfect-reconstruction ERBlet transform tests (VERDICT r1 #7).

The pass bar from the round-1 verdict: invert(compute(x)) ~ x to < 1e-5 on
broadband noise -- true PR, unlike filterbank.ERBTransform's band-limited
projection.
"""
import numpy as np
import pytest

from pyfasst_tpu.tf.erblet import ERBLetTransform


@pytest.mark.parametrize("fs,n_bands,T", [
    (16000, 64, 16000),        # 1 s
    (16000, 40, 12345),        # non-multiple-of-hop length
    (44100, 80, 22050),
])
def test_perfect_reconstruction_broadband(rng, fs, n_bands, T):
    t = ERBLetTransform(fs=fs, n_bands=n_bands)
    x = rng.standard_normal(T).astype(np.float32)
    C = t.computeTransform(x)
    assert C.shape[0] == n_bands and np.iscomplexobj(C)
    y = np.asarray(t.invertTransform(C))
    assert y.shape == x.shape
    rel = np.abs(y - x).max() / np.abs(x).max()
    assert rel < 1e-5, rel


def test_perfect_reconstruction_stereo(rng):
    t = ERBLetTransform(fs=16000, n_bands=48)
    x = rng.standard_normal((8000, 2)).astype(np.float32)
    y = np.asarray(t.invertTransform(t.computeTransform(x)))
    rel = np.abs(y - x).max() / np.abs(x).max()
    assert rel < 1e-5, rel


def test_analyze_modify_resynthesize(rng):
    """The reference capability the projection transform lacked: zeroing
    bands removes exactly those bands' content from the resynthesis."""
    fs, T = 16000, 16000
    t = ERBLetTransform(fs=fs, n_bands=64)
    time = np.arange(T) / fs
    lo = np.sin(2 * np.pi * 200 * time)            # low-band tone
    hi = np.sin(2 * np.pi * 5000 * time)           # high-band tone
    C = np.array(t.computeTransform((lo + hi).astype(np.float32)))
    centers = t.band_centers()
    keep = centers < 1000.0                        # kill everything >= 1 kHz
    C[~keep] = 0.0
    y = np.asarray(t.invertTransform(C, nsamples=T))
    # interior (edge bands taper): low tone preserved, high tone gone
    sl = slice(T // 8, -T // 8)
    num = np.sum((y[sl] - lo[sl]) ** 2)
    assert 10 * np.log10(np.sum(lo[sl] ** 2) / num) > 30.0
    assert np.abs(y[sl] @ hi[sl]) / np.sqrt(
        (y[sl] @ y[sl]) * (hi[sl] @ hi[sl])) < 0.02


def test_tone_band_localization(rng):
    fs, T = 16000, 8192
    t = ERBLetTransform(fs=fs, n_bands=64)
    time = np.arange(T) / fs
    for f0 in (150.0, 440.0, 2000.0, 6000.0):
        C = np.abs(np.asarray(
            t.computeTransform(np.sin(2 * np.pi * f0 * time))))
        b_peak = int(np.argmax(C.mean(axis=1)))
        b_true = int(np.argmin(np.abs(t.band_centers() - f0)))
        assert abs(b_peak - b_true) <= 1, (f0, b_peak, b_true)


def test_frame_bounds_and_hop_guard():
    t = ERBLetTransform(fs=16000, n_bands=64)
    A, B = t.frame_bounds(16000)
    assert A > 0.1 and B / A < 10.0                # snug frame
    bad = ERBLetTransform(fs=16000, n_bands=64, hop=4096)
    with pytest.raises(ValueError, match="hop"):
        bad.computeTransform(np.zeros(16000, np.float32))
