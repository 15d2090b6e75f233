"""Second reverberant fixture family (tools/fixtures2.py): generator
physics sanity. The quality/threshold-transfer claims live in
tools/reverb_robustness.py --family image (hardware)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.fixtures2 import image_method_rir, make_image_fixture  # noqa: E402


def test_rir_direct_path_and_decay():
    fs = 16000
    room, src, mic = (5.0, 4.0, 3.0), (1.5, 1.2, 1.5), (3.0, 2.0, 1.5)
    h = image_method_rir(room, src, mic, t60=0.25, fs=fs)
    # direct path arrives at d/c with 1/(4 pi d) amplitude
    d = np.linalg.norm(np.subtract(src, mic))
    i_direct = int(round(d / 343.0 * fs))
    assert abs(int(np.argmax(np.abs(h))) - i_direct) <= 1
    np.testing.assert_allclose(h[i_direct], 1 / (4 * np.pi * d), rtol=1e-6)
    # Schroeder-integral decay reaches -20 dB at ~t60/3 (Sabine target)
    e = np.cumsum(h[::-1] ** 2)[::-1]
    db = 10 * np.log10(e / e[0] + 1e-30)
    t20 = np.argmax(db < -20.0) / fs
    assert 0.25 / 4 < t20 < 0.25 / 1.8, t20
    # a longer T60 decays slower
    h2 = image_method_rir(room, src, mic, t60=0.5, fs=fs)
    e2 = np.cumsum(h2[::-1] ** 2)[::-1]
    db2 = 10 * np.log10(e2 / e2[0] + 1e-30)
    assert np.argmax(db2 < -20.0) > np.argmax(db < -20.0)


def test_image_fixture_contract():
    mix, ys, meta = make_image_fixture(202, fs=8000, dur=2.0, J=3)
    assert mix.shape == (16000, 2) and ys.shape == (3, 16000, 2)
    np.testing.assert_allclose(mix, ys.sum(0), rtol=1e-12)
    # equal source-image power, both channels alive
    np.testing.assert_allclose(np.std(ys, axis=(1, 2)), 1.0, atol=1e-6)
    assert np.all(np.std(mix, axis=0) > 0.1)
    assert 0.15 <= meta["t60"] <= 0.32
    # deterministic per seed, different across seeds
    mix2, _, _ = make_image_fixture(202, fs=8000, dur=2.0, J=3)
    np.testing.assert_array_equal(mix, mix2)
    mix3, _, _ = make_image_fixture(203, fs=8000, dur=2.0, J=3)
    assert not np.allclose(mix, mix3)
