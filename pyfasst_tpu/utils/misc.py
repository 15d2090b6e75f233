"""Small numeric helpers.

Reference parity: pyfasst/tools/utils.py::nextpow2/db/ident (UNVERIFIED symbol
names; the reference mount was empty -- see SURVEY.md). These are host-side
helpers; device math lives in pyfasst_tpu.ops.
"""
from __future__ import annotations

import numpy as np


def nextpow2(n: float) -> int:
    """Smallest p such that 2**p >= n (returns the exponent, as in MATLAB)."""
    if n <= 1:
        return 0
    return int(np.ceil(np.log2(n)))


def db(x, floor: float = 1e-30):
    """Power ratio in decibels: 10*log10(|x|)."""
    return 10.0 * np.log10(np.maximum(np.abs(x), floor))


def ident(n: int, dtype=np.float64):
    """Identity matrix helper (kept for API parity with the reference tools)."""
    return np.eye(n, dtype=dtype)


def to_device_complex(x, dtype=None):
    """Upload a complex host array via two real transfers.

    Complex transfers are Unimplemented in BOTH directions on the axon TPU
    backend (see CLAUDE.md): device->host must split (to_host_complex), and
    host->device complex buffers abort at execution time with an opaque
    'Unimplemented'. Combine on device with lax.complex instead.
    """
    import jax
    import jax.numpy as jnp
    x = np.asarray(x)
    if not np.iscomplexobj(x):
        return jnp.asarray(x, dtype)
    if dtype is not None:
        want64 = dtype == jnp.complex128
    else:  # follow the input
        want64 = x.dtype == np.complex128
    rdt = jnp.float64 if (want64 and jax.config.jax_enable_x64) \
        else jnp.float32
    return jax.lax.complex(jnp.asarray(x.real, rdt),
                           jnp.asarray(x.imag, rdt))


def czeros(shape, dtype):
    """Complex zeros that work in EAGER mode on the axon TPU backend.

    `jnp.zeros(shape, complex64)` outside jit dies at dispatch with an
    opaque 'UNIMPLEMENTED: TPU backend error' on axon -- filling a device
    buffer from a complex scalar constant is the same transfer hole as
    complex host->device uploads (to_device_complex). Real zeros followed
    by an on-device convert_element_type produce the identical result on
    every backend. For real dtypes this is just jnp.zeros.
    """
    import jax.numpy as jnp
    dtype = jnp.dtype(dtype)
    if not jnp.issubdtype(dtype, jnp.complexfloating):
        return jnp.zeros(shape, dtype)
    rdt = jnp.float64 if dtype == jnp.complex128 else jnp.float32
    return jnp.zeros(shape, rdt).astype(dtype)


def to_host_complex(x) -> np.ndarray:
    """Fetch a complex device array to host via two real transfers.

    Complex device->host transfers are Unimplemented on the axon TPU
    backend (see CLAUDE.md); always use this instead of np.asarray on
    complex jax arrays that may live on an accelerator.
    """
    import jax.numpy as jnp
    if not np.iscomplexobj(x):
        return np.asarray(x)
    re = np.asarray(jnp.real(x))
    im = np.asarray(jnp.imag(x))
    out = re.astype(np.complex128) + 1j * im
    # preserve the input width (complex64 stays complex64)
    return out.astype(np.complex64) if x.dtype == jnp.complex64 else out
