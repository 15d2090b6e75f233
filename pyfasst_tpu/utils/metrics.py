"""Separation quality metrics and benchmark helpers.

The reference has no metrics module (SURVEY.md §5); quality in the FASST
literature is reported as BSS-Eval SDR/SIR/SAR. This is a self-contained
implementation of the classical bss_eval_sources decomposition (Vincent,
Gribonval & Fevotte 2006): project each estimate onto the subspace spanned
by time-shifted references (filt_len-tap allowed distortion filters,
default 128), split the error into interference/artifact parts, permute
for the best match.
Host-side numpy (scoring is not a hot path).
"""
from __future__ import annotations

import itertools
from typing import Dict

import numpy as np


def _shifted_gram_projection(est: np.ndarray, refs: np.ndarray, L: int):
    """Least-squares projection of `est` onto span{shifted refs}.

    est: (T,), refs: (J, T). Returns (proj_all, proj_each[J]) where proj_all
    uses all references jointly and proj_each[j] uses only reference j.
    """
    J, T = refs.shape
    # dense (J*L, T) shifted reference matrix (memory O(J*L*T))
    shifted = np.zeros((J * L, T))
    for j in range(J):
        for tau in range(L):
            row = np.zeros(T)
            row[tau:] = refs[j, :T - tau]
            shifted[j * L + tau] = row
    G = shifted @ shifted.T
    D = shifted @ est
    coef = np.linalg.lstsq(G + 1e-9 * np.trace(G) / max(len(G), 1)
                           * np.eye(len(G)), D, rcond=None)[0]
    proj_all = coef @ shifted
    projs_each = []
    for j in range(J):
        sl = slice(j * L, (j + 1) * L)
        Gj = G[sl, sl]
        cj = np.linalg.lstsq(Gj + 1e-9 * np.trace(Gj) / L * np.eye(L),
                             D[sl], rcond=None)[0]
        projs_each.append(cj @ shifted[sl])
    return proj_all, np.stack(projs_each)


def bss_eval_sources(est: np.ndarray, ref: np.ndarray, filt_len: int = 128
                     ) -> Dict[str, np.ndarray]:
    """BSS-Eval SDR/SIR/SAR with best permutation.

    est, ref: (J, T) mono source signals (mix multichannel images down or
    evaluate per channel). Returns dict with 'sdr', 'sir', 'sar' (J,) for
    the best permutation and 'perm'.
    """
    est = np.asarray(est, np.float64)
    ref = np.asarray(ref, np.float64)
    J, T = ref.shape
    sdr = np.full((J, J), -np.inf)
    sir = np.zeros((J, J))
    sar = np.zeros((J, J))
    for i in range(J):          # estimate i
        proj_all, proj_each = _shifted_gram_projection(est[i], ref, filt_len)
        artifact = est[i] - proj_all
        for j in range(J):      # against reference j
            s_target = proj_each[j]
            e_interf = proj_all - s_target
            denom_sdr = np.sum((e_interf + artifact) ** 2)
            sdr[i, j] = 10 * np.log10(np.sum(s_target ** 2)
                                      / max(denom_sdr, 1e-12))
            sir[i, j] = 10 * np.log10(np.sum(s_target ** 2)
                                      / max(np.sum(e_interf ** 2), 1e-12))
            sar[i, j] = 10 * np.log10(np.sum((s_target + e_interf) ** 2)
                                      / max(np.sum(artifact ** 2), 1e-12))
    best, best_perm = None, None
    for perm in itertools.permutations(range(J)):
        tot = sum(sdr[perm[j], j] for j in range(J))
        if best is None or tot > best:
            best, best_perm = tot, perm
    p = list(best_perm)
    return {
        "sdr": np.array([sdr[p[j], j] for j in range(J)]),
        "sir": np.array([sir[p[j], j] for j in range(J)]),
        "sar": np.array([sar[p[j], j] for j in range(J)]),
        "perm": np.array(p),
    }


def si_sdr(est: np.ndarray, ref: np.ndarray) -> float:
    """Scale-invariant SDR of one estimate against one reference (T,)."""
    est = np.asarray(est, np.float64).ravel()
    ref = np.asarray(ref, np.float64).ravel()
    alpha = float(est @ ref) / max(float(ref @ ref), 1e-12)
    return 10 * np.log10(max(np.sum((alpha * ref) ** 2), 1e-12)
                         / max(np.sum((est - alpha * ref) ** 2), 1e-12))


def xrt(audio_seconds: float, wall_seconds: float, n_chips: int = 1) -> float:
    """The BASELINE.json throughput metric: audio-sec / sec / chip."""
    return audio_seconds / max(wall_seconds, 1e-12) / n_chips
