"""Online/streaming separation of a long recording (block-wise GEM).

Usage: python examples/streaming_online.py long_mix.wav out_dir
"""
import sys

import numpy as np
import jax.numpy as jnp

from pyfasst_tpu.audio import AudioObject, wavwrite
from pyfasst_tpu.models.components import init_inst_mixing
from pyfasst_tpu.ops.online import run_gem_online
from pyfasst_tpu.tf.stft import STFT
from pyfasst_tpu.utils.misc import to_host_complex

mix_path, out_dir = sys.argv[1], sys.argv[2]
J, K, n_blocks = 2, 8, 16

audio = AudioObject(mix_path)
tft = STFT(wlen=1024, fs=audio.samplerate)
X = tft.computeTransform(audio.data.astype(np.float32))
F, N = int(X.shape[0]), int(X.shape[1])
Nb = N // n_blocks

# build the complex init ON DEVICE (complex host->device uploads are
# Unimplemented on the axon TPU backend; see CLAUDE.md)
A0 = jnp.stack([
    jnp.broadcast_to(jnp.asarray(np.asarray(a)[:, 0],
                                 jnp.float32).astype(jnp.complex64), (F, 2))
    for a in init_inst_mixing(None, 2, 1, J)])
rng = np.random.default_rng(0)
FB0 = jnp.asarray(0.5 + rng.random((J, F, K)), jnp.float32)
TW0 = jnp.asarray(0.5 + rng.random((J, K, Nb)), jnp.float32)
sigma = jnp.full((F,), 1e-4 * float(jnp.mean(jnp.abs(X) ** 2)), jnp.float32)

A, FB, TW_all, logliks = run_gem_online(A0, FB0, TW0, X[:, :n_blocks * Nb],
                                        sigma, n_blocks=n_blocks)
print("block log-likelihoods:", np.round(np.asarray(logliks), 1))
print("learned mixing (mean over f):",
      np.round(np.asarray(jnp.abs(A)).mean(axis=1), 3))
