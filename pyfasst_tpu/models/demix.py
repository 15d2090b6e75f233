"""DEMIX: blind anechoic mixing-parameter estimation for initialization.

Reference parity: pyfasst/demixTF.py::DEMIX (UNVERIFIED; mount empty, see
SURVEY.md §3.4), implementing the idea of Arberet, Gribonval & Bimbot's DEMIX:
find time-frequency regions where ONE source dominates (local covariance is
near rank-1), read the mixing direction off the principal eigenvector, and
cluster the directions into K anechoic (gain, delay) parameters.

TPU-native shape: the local covariance smoothing and the closed-form 2x2
eigendecomposition are vectorized over the whole (f, n) plane (device
friendly); the final confidence-weighted k-means over (log-gain, phase-slope)
features runs on host (tiny data). Returns mixing matrices ready to seed
MultiChanNMFConv (configs[1]).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from pyfasst_tpu.tf.stft import STFT


def _box_smooth(x: np.ndarray, wf: int, wn: int) -> np.ndarray:
    """Separable box filter over the leading two axes (F, N[, ...])."""
    from scipy.ndimage import uniform_filter1d
    if np.iscomplexobj(x):
        return (_box_smooth(x.real, wf, wn)
                + 1j * _box_smooth(x.imag, wf, wn))
    out = uniform_filter1d(x, wf, axis=0, mode="nearest")
    return uniform_filter1d(out, wn, axis=1, mode="nearest")


def local_directions(X: np.ndarray, wf: int = 3, wn: int = 8):
    """Per-bin principal direction + confidence of the smoothed covariance.

    X: (F, N, 2) complex. Returns (u, conf): u (F, N, 2) complex unit
    principal eigenvectors, conf (F, N) = lambda1/lambda2 (>= 1; large where
    a single source locally dominates -- DEMIX's selection criterion).
    """
    a = _box_smooth(np.abs(X[..., 0]) ** 2, wf, wn)
    d = _box_smooth(np.abs(X[..., 1]) ** 2, wf, wn)
    b = _box_smooth(X[..., 0] * np.conj(X[..., 1]), wf, wn)
    half = 0.5 * (a + d)
    disc = np.sqrt(np.maximum(0.25 * (a - d) ** 2 + np.abs(b) ** 2, 0.0))
    lam1 = half + disc
    lam2 = np.maximum(half - disc, 1e-30)
    u0 = b
    u1 = lam1 - a
    # fall back to the axis vector when b ~ 0 (diagonal covariance)
    degenerate = np.abs(u0) + np.abs(u1) < 1e-12 * np.maximum(lam1, 1e-30)
    u0 = np.where(degenerate, (a >= d).astype(complex), u0)
    u1 = np.where(degenerate, (a < d).astype(complex), u1)
    norm = np.sqrt(np.abs(u0) ** 2 + np.abs(u1) ** 2) + 1e-30
    u = np.stack([u0 / norm, u1 / norm], axis=-1)
    conf = lam1 / lam2
    return u, conf, lam1


def _weighted_kmeans(z: np.ndarray, w: np.ndarray, K: int, n_iter: int = 50,
                     restarts: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Weighted k-means with k-means++ restarts; keeps the best inertia."""
    best = None
    for seed in range(restarts):
        rng = np.random.default_rng(seed)
        centers = [z[rng.choice(len(z), p=w / w.sum())]]
        for _ in range(K - 1):
            d2 = np.min([np.sum((z - c) ** 2, axis=1) for c in centers],
                        axis=0)
            p = w * d2
            p = p / max(p.sum(), 1e-30)
            centers.append(z[rng.choice(len(z), p=p)])
        centers = np.stack(centers)
        labels = np.zeros(len(z), np.int64)
        for _ in range(n_iter):
            d2 = np.stack([np.sum((z - c) ** 2, axis=1) for c in centers])
            labels = np.argmin(d2, axis=0)
            for k in range(K):
                m = labels == k
                if np.any(m):
                    centers[k] = np.average(z[m], axis=0, weights=w[m])
        inertia = float(np.sum(w * np.min(
            np.stack([np.sum((z - c) ** 2, axis=1) for c in centers]),
            axis=0)))
        if best is None or inertia < best[0]:
            best = (inertia, centers.copy(), labels.copy())
    return best[1], best[2]


class DEMIX:
    """Estimate K anechoic mixing vectors a_k(f) = [1, g_k e^{-i pi f d_k/(F-1)}].

    Parameters mirror the reference's usage: construct from audio (or a
    precomputed STFT), call `comp_parameters(K)`, then `mixing(F)` for the
    (K, F, 2, 1) initialization of MultiChanNMFConv.
    """

    def __init__(self, audio=None, X: Optional[np.ndarray] = None,
                 fs: int = 44100, wlen: int = 1024,
                 conf_quantile: float = 0.8, wf: int = 3, wn: int = 8):
        if X is None:
            from pyfasst_tpu.audio import AudioObject
            obj = audio if isinstance(audio, AudioObject) else \
                AudioObject(audio)
            tft = STFT(wlen=wlen, fs=obj.samplerate)
            from pyfasst_tpu.utils.misc import to_host_complex
            X = to_host_complex(tft.computeTransform(obj.data.astype(np.float32)))
        self.X = np.asarray(X)
        self.F = self.X.shape[0]
        self.conf_quantile = conf_quantile
        self.wf, self.wn = wf, wn
        self.gains: Optional[np.ndarray] = None
        self.delays: Optional[np.ndarray] = None

    # -- reference API -------------------------------------------------------
    def comp_pcafeatures(self):
        """Local PCA of covariance neighbourhoods -> directions+confidence."""
        self.u, self.conf, self.lam1 = local_directions(self.X, self.wf,
                                                        self.wn)
        return self.u, self.conf

    def estimate_count(self, K_max: int = 6, drop: float = 0.5) -> int:
        """Estimate the source count K^ (reference DEMIX estimates it too).

        Elbow rule on the weighted k-means inertia: grow K while adding a
        cluster still cuts the inertia by more than `drop`; the first K
        whose improvement falls below it is returned.
        """
        z, w = self._features()
        scale = np.array([1.0, 1.0 / max(np.std(z[:, 1]), 1e-6)
                          * max(np.std(z[:, 0]), 1e-6)])
        z = z * scale
        prev = None
        for K in range(1, K_max + 1):
            centers, _ = _weighted_kmeans(z, w, K)
            inertia = float(np.sum(w * np.min(
                np.stack([np.sum((z - c) ** 2, axis=1) for c in centers]),
                axis=0)))
            if prev is not None and inertia > drop * prev:
                return K - 1
            prev = inertia
        return K_max

    def comp_parameters(self, K: Optional[int] = None
                        ) -> Tuple[np.ndarray, np.ndarray]:
        """Cluster confident bins -> (gains[K], delays[K] in samples).

        K=None estimates the source count first (estimate_count)."""
        if K is None:
            K = self.estimate_count()
        z, w = self._features()
        scale = np.array([1.0, 1.0 / max(np.std(z[:, 1]), 1e-6)
                          * max(np.std(z[:, 0]), 1e-6)])
        centers, _ = _weighted_kmeans(z * scale, w, K)
        centers = centers / scale
        self.gains = np.exp(centers[:, 0])
        self.delays = -centers[:, 1]
        return self.gains, self.delays

    def _features(self) -> Tuple[np.ndarray, np.ndarray]:
        """(features z (M, 2), weights w (M,)) of confident loud bins;
        z columns are (log gain, delay in samples), pre-scaling."""
        self.comp_pcafeatures()
        u, conf, lam1 = self.u, self.conf, self.lam1
        # feature 1: log gain ratio |u1/u0|
        g = np.abs(u[..., 1]) / np.maximum(np.abs(u[..., 0]), 1e-12)
        # feature 2: phase increment of u1 u0* between adjacent frequencies
        # (wrap-free delay read-out: equals -pi * delay / (F-1) per bin)
        prod = u[..., 1] * np.conj(u[..., 0])
        slope = np.angle(prod[1:] * np.conj(prod[:-1]))        # (F-1, N)
        gmid = 0.5 * (np.log(np.maximum(g[1:], 1e-9))
                      + np.log(np.maximum(g[:-1], 1e-9)))
        # selection: silent bins have 0/0 covariances and garbage-huge
        # confidence -- gate on local ENERGY first, then on confidence,
        # and cap the k-means weights.
        energy = np.minimum(lam1[1:], lam1[:-1]).ravel()
        w = np.minimum(conf[1:], conf[:-1]).ravel()
        z = np.stack([gmid.ravel(), slope.ravel()
                      * (self.F - 1) / np.pi], axis=1)
        loud = energy >= 1e-3 * energy.mean()
        # cap the confidence weights HARD: conf scales like 1/(direction
        # rotation)^2 within the smoothing window, which biases raw-conf
        # selection toward small-delay sources; past ~confident it carries
        # no extra information.
        z, w = z[loud], np.minimum(w[loud], 100.0)
        keep = w >= np.quantile(w, self.conf_quantile)
        return z[keep], w[keep]

    def mixing(self, F: Optional[int] = None) -> np.ndarray:
        """(K, F, 2, 1) complex anechoic mixing matrices for model init."""
        if self.gains is None:
            raise RuntimeError("call comp_parameters(K) first")
        F = F or self.F
        f = np.arange(F)
        A = np.stack([
            np.stack([np.ones(F, complex),
                      g * np.exp(-1j * np.pi * f * d / (F - 1))], axis=1)
            for g, d in zip(self.gains, self.delays)])
        return A[..., None]
