"""High-level batch separation over many clips (BASELINE.json configs[4]).

"Batch separation of a full SiSEC dev set, vmapped over clips/segments
across a v5e-8 slice": clips of different lengths are padded into frame
BUCKETS (one compiled executable per bucket -- SURVEY.md §7's answer to
dynamic shapes), each bucket runs through the sharded batched GEM + Wiener
path, and per-clip results are cropped back.
"""
from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pyfasst_tpu.models.components import FasstParams
from pyfasst_tpu.parallel.sharding import (
    batch_params, batched_run_gem, make_mesh, sharded_batch_separate,
)
from pyfasst_tpu.ops.gem import endpoints_from_power
from pyfasst_tpu.utils.config import GEMConfig


def frame_buckets(n_frames: Sequence[int], granularity: int = 128
                  ) -> Dict[int, List[int]]:
    """Group clip indices by padded frame count (multiples of granularity).

    One bucket = one compiled executable; padding waste is bounded by
    granularity/bucket_size.
    """
    buckets: Dict[int, List[int]] = {}
    for i, n in enumerate(n_frames):
        b = max(granularity, int(math.ceil(n / granularity)) * granularity)
        buckets.setdefault(b, []).append(i)
    return buckets


def _pad_frames(X: np.ndarray, n_target: int) -> np.ndarray:
    F, N, I = X.shape
    return np.pad(X, ((0, 0), (0, n_target - N), (0, 0)))


def batch_separate(
    Xs: Sequence[np.ndarray],
    make_params: Callable[[int, int, int], FasstParams],
    cfg: GEMConfig,
    mesh=None,
    granularity: int = 128,
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Estimate + separate a set of clips.

    Xs: list of complex STFTs (F, N_i, 2), same F (same transform), varying
    N_i. make_params(F, N_padded, clip_index) builds the initial pytree for
    one clip. Returns (images, logliks) per clip, cropped to true lengths;
    images are (J, F, N_i, 2).

    Zero-padded trailing frames are cropped from the outputs, and the
    annealing endpoints are computed from the UNPADDED frames of each clip
    (padding would dilute the per-frequency mean power and shrink the noise
    floor for heavily padded clips).
    """
    mesh = mesh or make_mesh()
    dp = mesh.shape["dp"]
    F = Xs[0].shape[0]
    n_frames = [x.shape[1] for x in Xs]
    out_imgs: List[Optional[np.ndarray]] = [None] * len(Xs)
    out_lls: List[Optional[np.ndarray]] = [None] * len(Xs)

    for Npad, idxs in sorted(frame_buckets(n_frames, granularity).items()):
        # round the batch up to a multiple of the dp axis with repeats
        batch_idx = list(idxs)
        while len(batch_idx) % dp != 0:
            batch_idx.append(idxs[-1])
        from pyfasst_tpu.utils.misc import to_device_complex
        X_b = to_device_complex(np.stack([
            _pad_frames(np.asarray(Xs[i], np.complex64), Npad)
            for i in batch_idx]))
        params_b = batch_params([make_params(F, Npad, i) for i in batch_idx])
        # per-clip endpoints from the true (pre-padding) frame counts;
        # host-side real power, so no complex upload is involved
        Pm_true = jnp.asarray(np.stack([
            np.mean(np.abs(np.asarray(Xs[i])) ** 2, axis=(1, 2))
            for i in batch_idx]).astype(np.float32))
        sig0_b, sig1_b = jax.vmap(
            lambda p: endpoints_from_power(p, cfg))(Pm_true)
        params_b, lls = batched_run_gem(params_b, X_b, cfg, mesh,
                                        sigma_endpoints_b=(sig0_b, sig1_b))
        Y_b = sharded_batch_separate(params_b, X_b, sig1_b, mesh)
        from pyfasst_tpu.utils.misc import to_host_complex
        Y_b = to_host_complex(Y_b)
        lls = np.asarray(lls)
        for slot, i in enumerate(batch_idx[:len(idxs)]):
            out_imgs[i] = Y_b[slot][:, :, :n_frames[i], :]
            out_lls[i] = lls[slot]
    return out_imgs, out_lls
