"""End-to-end I > 2 channel separation (the general-I engine).

Reference parity: pyfasst's model math is generic in the channel count I
(SURVEY.md §A; its stereo-tuned hot path notwithstanding, UNVERIFIED -- mount
empty). The round-2 verdict asked for an I x I engine path; these tests drive
it through the SAME user API as stereo: a 3-channel mixture into
MultiChanNMFInst_FASST / MultiChanNMFConv, GEM, Wiener separation, BSS-Eval.
"""
import numpy as np
import pytest

from pyfasst_tpu.models import MultiChanNMFConv, MultiChanNMFInst_FASST
from pyfasst_tpu.utils.metrics import bss_eval_sources


def _three_channel_mixture(seed=0, fs=16000, dur=3.0):
    r = np.random.default_rng(seed)
    n = int(fs * dur)
    t = np.arange(n) / fs
    # harmonic source with AM, noise-burst source
    f0 = 196.0 * 2 ** (0.15 * np.sin(2 * np.pi * 1.1 * t))
    phase = 2 * np.pi * np.cumsum(f0) / fs
    am = 0.5 + 0.5 * np.clip(np.sin(2 * np.pi * 1.7 * t), 0, None)
    s1 = am * sum((0.7 / h) * np.sin(h * phase) for h in range(1, 6))
    gate = (np.sin(2 * np.pi * 2.5 * t) > 0.3).astype(float)
    s2 = gate * r.standard_normal(n) * 0.5
    s1 /= np.abs(s1).max()
    s2 /= np.abs(s2).max()
    # distinct 3-channel gain directions (e.g. a 3-mic array)
    a1 = np.array([0.9, 0.5, 0.2])
    a2 = np.array([0.25, 0.6, 0.95])
    y1 = s1[:, None] * a1
    y2 = s2[:, None] * a2
    return (y1 + y2).astype(np.float32), y1, y2


def test_inst_three_channel_separation():
    mix, y1, y2 = _three_channel_mixture()
    assert mix.shape[1] == 3
    m = MultiChanNMFInst_FASST(mix, fs=16000, wlen=512, iter_num=150,
                               nbComps=2, nbNMFComps=6, seed=0)
    ll = m.estim_param_a_posteriori()
    assert np.all(np.isfinite(ll))
    ys = m.separated_images()                         # (2, n, 3)
    assert ys.shape == (2, mix.shape[0], 3)
    # conservation: images sum back to the mixture up to the Wiener noise
    # residual sigma * Sigma_x^-1 x (relative energy, not pointwise -- the
    # residual equals x in source-free bins)
    res = np.linalg.norm(ys.sum(axis=0) - mix) / np.linalg.norm(mix)
    assert res < 5e-2, res
    out = bss_eval_sources(ys.mean(axis=2),
                           np.stack([y1, y2]).mean(axis=2), filt_len=32)
    assert out["sdr"].min() > 4.0, out


def test_conv_three_channel_runs():
    """Convolutive/full-rank I=3 through the general engine: finite GEM and
    a working spatial-filter separation variant."""
    mix, _, _ = _three_channel_mixture(seed=3, dur=1.5)
    m = MultiChanNMFConv(mix, fs=16000, wlen=512, iter_num=60, nbComps=2,
                         nbNMFComps=4, spatial_rank=1, seed=1)
    ll = m.estim_param_a_posteriori()
    assert np.all(np.isfinite(ll))
    ys = m.separated_images()
    assert ys.shape == (2, mix.shape[0], 3)
    assert np.all(np.isfinite(ys))
    paths = m.separate_spatial_filter_comp(None)
    assert paths == []


def test_mono_single_channel_separation():
    """I = 1 runs through the general engine: single-channel FASST
    separates on the spectral model alone (no spatial cues). Round-3
    verify-drive regression: generalizing the engine to I != 2 silently
    admitted mono, and init_inst_mixing's I > 2 taper divided by I - 1 =
    0 -> NaN init -> divergence at iteration 0."""
    fs, dur = 16000, 4.0
    n = int(fs * dur)
    rng = np.random.default_rng(0)
    t = np.arange(n) / fs
    s1 = np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(
        2 * np.pi * 1.3 * t))
    w = rng.standard_normal(n)
    s2 = (w - np.convolve(w, np.ones(8) / 8, "same")) \
        * (np.sin(2 * np.pi * 0.7 * t + 1) > 0) * 0.5
    mix = (s1 + s2).astype(np.float32)
    m = MultiChanNMFInst_FASST(mix[:, None], fs=fs, nbComps=2,
                               nbNMFComps=6, wlen=1024, iter_num=200,
                               seed=0)
    ll = m.estim_param_a_posteriori()
    assert np.all(np.isfinite(ll))
    ys = m.separated_images()
    assert ys.shape == (2, n, 1)

    def sdr(a, b):
        return 10 * np.log10(np.sum(b ** 2)
                             / max(np.sum((a - b) ** 2), 1e-12))

    best = max(min(sdr(ys[p[0], :, 0], s1), sdr(ys[p[1], :, 0], s2))
               for p in [(0, 1), (1, 0)])
    assert best > 1.5, f"mono separation too weak: {best:.2f} dB"


def test_cx_property_guards_non_stereo():
    mix, _, _ = _three_channel_mixture(dur=0.5)
    m = MultiChanNMFInst_FASST(mix, fs=16000, wlen=512, iter_num=5,
                               nbComps=2, nbNMFComps=3)
    with pytest.raises(ValueError, match="stereo"):
        _ = m.Cx
