"""Online/streaming separation of a long recording — bounded memory.

The estimation never holds the full (F, N) plane: STFT blocks are paged
off disk (STFT.stream_blocks reads only each block's samples, via the
native codec's seek+read when built) and pushed through the exponential-
forgetting online GEM one block at a time (ops.online.online_block).

Usage: python examples/streaming_online.py long_mix.wav out_dir
"""
import os
import sys
import os

# runnable from a plain checkout (no pip install needed)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from pyfasst_tpu.audio import AudioObject, wavwrite
from pyfasst_tpu.models.components import init_inst_mixing
from pyfasst_tpu.ops.online import online_block, online_init
from pyfasst_tpu.tf.stft import STFT

mix_path, out_dir = sys.argv[1], sys.argv[2]
J, K, Nb = 2, 8, 64                      # Nb frames per streamed block

audio_info = AudioObject(mix_path)        # header-level info + final synth
fs = audio_info.samplerate
tft = STFT(wlen=1024, fs=fs)
F = tft.F
n_frames = tft.n_frames(audio_info.nsamples)

# build the complex init ON DEVICE (complex host->device uploads are
# Unimplemented on the axon TPU backend; see CLAUDE.md)
A0 = jnp.stack([
    jnp.broadcast_to(jnp.asarray(np.asarray(a)[:, 0],
                                 jnp.float32).astype(jnp.complex64), (F, 2))
    for a in init_inst_mixing(None, 2, 1, J)])
rng = np.random.default_rng(0)
FB0 = jnp.asarray(0.5 + rng.random((J, F, K)), jnp.float32)
TW0 = jnp.asarray(0.5 + rng.random((J, K, Nb)), jnp.float32)
# fixed noise floor from the first block's power (no global annealing in
# streaming: the whole signal is never in memory at once)
first = next(tft.stream_blocks(mix_path, Nb))
sigma = jnp.full((F,), 1e-4 * float(jnp.mean(jnp.abs(first) ** 2)),
                 jnp.float32)

state = online_init(A0, FB0)
lls = []
for Xb in tft.stream_blocks(mix_path, Nb):
    if Xb.shape[1] < Nb:                 # ragged tail: skip (or pad) it
        break
    state, (TWb, ll) = online_block(state, Xb, TW0, sigma)
    lls.append(float(ll))
print(f"streamed {len(lls)} blocks of {Nb} frames "
      f"({n_frames} total); block log-likelihoods:")
print(np.round(np.asarray(lls), 1))
print("learned mixing (mean over f):",
      np.round(np.asarray(jnp.abs(state.A)).mean(axis=1), 3))

# Separation demo with the learned frequency-side parameters: second
# streaming pass building per-source masks block by block. (Synthesis here
# collects the masked blocks and inverts once; a production deployment
# would OLA per block with a wlen-hop tail carry.)
os.makedirs(out_dir, exist_ok=True)
ys = []
blocks = []
for Xb in tft.stream_blocks(mix_path, Nb):
    v = jnp.einsum("jfk,jkn->jfn", state.FB,
                   jnp.broadcast_to(jnp.mean(TW0, axis=2, keepdims=True),
                                    (J, K, Xb.shape[1])))
    g = jnp.abs(state.A) ** 2                       # (J, F, 2)
    num = v[:, :, :, None] * g[:, :, None, :]       # (J, F, Nb, 2)
    mask = num / jnp.maximum(num.sum(0, keepdims=True), 1e-12)
    blocks.append(mask * Xb[None])
Y = jnp.concatenate(blocks, axis=2)                 # (J, F, N, 2)
for j in range(J):
    y = np.asarray(tft.invertTransform(Y[j], nsamples=audio_info.nsamples))
    wavwrite(y, fs, os.path.join(out_dir, f"stream_src_{j}.wav"))
print("wrote", out_dir)
