"""SeparateLeadStereo: source/filter (SIMM) lead / accompaniment separation.

Reference parity: pyfasst/SeparateLeadStereo/SeparateLeadStereoTF.py
(UNVERIFIED; mount empty, see SURVEY.md §3.5), implementing Durrieu's
smoothed instantaneous mixture model:

    |X|^2 ~ V = (WF0 @ HF0) * (WGAMMA @ HGAMMA) + WM @ HM
                [lead: source comb x smooth filter]   [accompaniment NMF]

with IS-divergence multiplicative updates, Viterbi melody tracking over the
F0 activations, a melody-constrained second pass, and Wiener-mask synthesis.
TPU-native shape: the update loop is a jitted lax.fori_loop; Viterbi is a
lax.scan; masks/ISTFT reuse the framework front-end.
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pyfasst_tpu.audio import AudioObject
from pyfasst_tpu.models.variants import generate_WF0
from pyfasst_tpu.tf.filterbank import spectral_basis
from pyfasst_tpu.tf.stft import STFT


# -- jitted SIMM core ---------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("niter",))
@jax.default_matmul_precision("highest")
def simm_updates(P, WF0, WG, HF0, HG, WM, HM, niter: int, eps=1e-12):
    """IS-NMF multiplicative updates of the SIMM factors against P = |X|^2.

    Shapes: P (F, N); WF0 (F, U); HF0 (U, N); WG (F, G); HG (G, N);
    WM (F, M); HM (M, N). Returns updated (HF0, HG, WM, HM). Uses the same
    float32 guards as the GEM engine (mstep.py): model PSD floored RELATIVE
    to the observed scale, multiplicative ratios clamped (dead components
    otherwise 0/0-swing the model).
    """
    from pyfasst_tpu.ops.mstep import _mul_upd

    v_floor = 1e-12 * jnp.mean(P) + eps

    def nd(V):
        Vc = jnp.maximum(V, v_floor)
        return P / (Vc * Vc), 1.0 / Vc

    def body(_, carry):
        HF0, HG, WM, HM = carry
        SF0 = WF0 @ HF0
        SPHI = WG @ HG
        num, den = nd(SF0 * SPHI + WM @ HM)
        HF0 = _mul_upd(HF0, WF0.T @ (SPHI * num), WF0.T @ (SPHI * den), eps)
        SF0 = WF0 @ HF0
        num, den = nd(SF0 * SPHI + WM @ HM)
        HG = _mul_upd(HG, WG.T @ (SF0 * num), WG.T @ (SF0 * den), eps)
        SPHI = WG @ HG
        num, den = nd(SF0 * SPHI + WM @ HM)
        HM = _mul_upd(HM, WM.T @ num, WM.T @ den, eps)
        num, den = nd(SF0 * SPHI + WM @ HM)
        WM = _mul_upd(WM, num @ HM.T, den @ HM.T, eps)
        return HF0, HG, WM, HM

    return jax.lax.fori_loop(0, niter, body, (HF0, HG, WM, HM))


@jax.jit
def viterbi_melody(salience, jump_penalty: float = 0.8):
    """Viterbi path over F0 salience (U, N) with quadratic jump penalty.

    Reference parity: the melody tracking stage of SeparateLeadStereo
    (UNVERIFIED). Returns the melody index path (N,) int32.
    """
    U, N = salience.shape
    logS = jnp.log(jnp.maximum(salience, 1e-12))
    idx = jnp.arange(U)
    pen = -jump_penalty * (idx[:, None] - idx[None, :]) ** 2 / U

    def fwd(carry, ls):
        score = carry                       # (U,)
        cand = score[:, None] + pen         # from u -> to u'
        best = jnp.max(cand, axis=0)
        arg = jnp.argmax(cand, axis=0)
        return best + ls, arg

    score0 = logS[:, 0]
    final, args = jax.lax.scan(fwd, score0, logS.T[1:])
    last = jnp.argmax(final)

    def bwd(carry, arg):
        nxt = carry
        cur = arg[nxt]
        return cur, cur

    _, path_rev = jax.lax.scan(bwd, last, args[::-1])
    return jnp.concatenate([path_rev[::-1], jnp.array([last])]).astype(
        jnp.int32)


class SeparateLeadStereoTF:
    """Lead / accompaniment separation pipeline (Durrieu SIMM).

    Usage mirrors the reference:
        sep = SeparateLeadStereoTF("song.wav")
        sep.runDecomposition()
        sep.writeSeparatedSignals("out_dir")   # lead + accompaniment WAVs
    """

    def __init__(self, inputAudioFilename=None, audio=None, fs: int = 44100,
                 wlen: int = 2048, hop: Optional[int] = None,
                 n_f0: int = 120, f0_min: float = 80.0, f0_max: float = 800.0,
                 n_filter: int = 30, n_acc: int = 16,
                 niter: int = 50, melody_halfwidth: int = 2, seed: int = 0):
        if audio is not None:
            self.audio = AudioObject(data=np.asarray(audio), samplerate=fs)
        else:
            self.audio = AudioObject(inputAudioFilename)
        self.fs = self.audio.samplerate
        self.tft = STFT(wlen=wlen, hop=hop, fs=self.fs)
        self.niter = niter
        self.melody_halfwidth = melody_halfwidth
        data = self.audio.data.astype(np.float32)
        if data.shape[1] == 1:
            data = np.repeat(data, 2, axis=1)
        from pyfasst_tpu.utils.misc import to_host_complex
        self.X = to_host_complex(self.tft.computeTransform(data))  # (F, N, 2)
        F, N = self.X.shape[:2]
        self.F, self.N = F, N
        self.WF0 = jnp.asarray(
            generate_WF0(F, self.fs, wlen, n_f0=n_f0, f0_min=f0_min,
                         f0_max=f0_max), jnp.float32)
        self.WG = jnp.asarray(
            spectral_basis("mel", n_filter, F, self.fs, wlen), jnp.float32)
        rng = np.random.default_rng(seed)
        self.HF0 = jnp.asarray(0.5 + rng.random((n_f0, N)), jnp.float32)
        self.HG = jnp.asarray(0.5 + rng.random((n_filter, N)), jnp.float32)
        self.WM = jnp.asarray(0.5 + rng.random((F, n_acc)), jnp.float32)
        self.HM = jnp.asarray(0.5 + rng.random((n_acc, N)), jnp.float32)
        self.melody: Optional[np.ndarray] = None

    # -- pipeline -------------------------------------------------------------
    def runDecomposition(self) -> np.ndarray:
        """Two-pass SIMM estimation with Viterbi melody constraint.

        Returns the estimated melody path (F0-grid indices per frame).
        """
        P = jnp.asarray(np.mean(np.abs(self.X) ** 2, axis=-1), jnp.float32)
        P = P / jnp.maximum(jnp.mean(P), 1e-30)
        HF0, HG, WM, HM = simm_updates(
            P, self.WF0, self.WG, self.HF0, self.HG, self.WM, self.HM,
            self.niter)
        path = viterbi_melody(HF0)
        # melody-constrained second pass: zero F0 activations away from path
        U = HF0.shape[0]
        dist = jnp.abs(jnp.arange(U)[:, None] - path[None, :])
        mask = (dist <= self.melody_halfwidth).astype(HF0.dtype)
        HF0 = HF0 * mask + 1e-12
        HF0, HG, WM, HM = simm_updates(
            P, self.WF0, self.WG, HF0, HG, WM, HM, self.niter)
        self.HF0, self.HG, self.WM, self.HM = HF0, HG, WM, HM
        self.melody = np.asarray(path)
        return self.melody

    def lead_mask(self) -> jnp.ndarray:
        """Wiener mask of the lead source, (F, N) in [0, 1]."""
        V_lead = (self.WF0 @ self.HF0) * (self.WG @ self.HG)
        V_acc = self.WM @ self.HM
        return V_lead / jnp.maximum(V_lead + V_acc, 1e-30)

    def separated_signals(self) -> Tuple[np.ndarray, np.ndarray]:
        """(lead, accompaniment) time-domain stereo signals."""
        mask = np.asarray(self.lead_mask())[..., None]
        n = self.audio.nsamples
        lead = np.asarray(self.tft.invertTransform(self.X * mask, nsamples=n))
        acc = np.asarray(self.tft.invertTransform(self.X * (1.0 - mask),
                                                  nsamples=n))
        return lead, acc

    def writeSeparatedSignals(self, dir_results: str,
                              suffix: str = "") -> Tuple[str, str]:
        os.makedirs(dir_results, exist_ok=True)
        lead, acc = self.separated_signals()
        stem = os.path.splitext(os.path.basename(
            self.audio.filename or "input"))[0] + suffix
        p1 = os.path.join(dir_results, f"{stem}_lead.wav")
        p2 = os.path.join(dir_results, f"{stem}_accompaniment.wav")
        for p, sig in ((p1, lead), (p2, acc)):
            peak = np.max(np.abs(sig))
            AudioObject(data=sig / peak if peak > 1 else sig,
                        samplerate=self.fs)._write(p)
        return p1, p2
