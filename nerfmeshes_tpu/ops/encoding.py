"""Input encodings, expressed as pure functions over jnp arrays.

The classic NeRF sin/cos positional encoding matches the reference's
PositionalEncoding module bit-for-bit in ordering (reference:
src/nerf/modules.py:8-37): for input dims (x, y, z) and L frequency bands,
the layout is [input?, sin(x*f0..x*fL-1, y*f0.., z*f0..), cos(same)] — i.e.
per input dimension, all frequencies are contiguous, and all sines precede
all cosines.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def frequency_bands(
    num_functions: int, log_sampling: bool = True, dtype=np.float32
) -> np.ndarray:
    """2^linspace(0, L-1, L) (log) or linspace(1, 2^(L-1), L) (linear)."""
    if num_functions == 0:
        return np.zeros((0,), dtype=dtype)
    if log_sampling:
        return (2.0 ** np.linspace(0.0, num_functions - 1, num_functions)).astype(dtype)
    return np.linspace(1.0, 2.0 ** (num_functions - 1), num_functions).astype(dtype)


def positional_encoding(
    x: jnp.ndarray,
    num_functions: int = 6,
    include_input: bool = True,
    log_sampling: bool = True,
) -> jnp.ndarray:
    """NeRF positional encoding of `x` (..., D) -> (..., PE_dim).

    PE_dim = 2 * D * num_functions (+ D if include_input).
    """
    bands = jnp.asarray(frequency_bands(num_functions, log_sampling), dtype=x.dtype)
    # (..., D, L) -> (..., D*L), frequencies contiguous per input dim.
    scaled = (x[..., None] * bands).reshape(*x.shape[:-1], -1)
    parts = [x] if include_input else []
    parts += [jnp.sin(scaled), jnp.cos(scaled)]
    return jnp.concatenate(parts, axis=-1)


def positional_encoding_output_size(
    num_functions: int, include_input: bool = True, in_dim: int = 3
) -> int:
    return 2 * in_dim * num_functions + (in_dim if include_input else 0)
