"""Batched 256-bin byte histogram — module F's make_freq (f.c:63-79), TPU-way.

Formulation: split each byte into nibbles; the histogram is the outer-product
contraction of the two 16-wide one-hots:

    hist[hi*16 + lo] = sum_i onehot16(x_i >> 4)[hi] * onehot16(x_i & 15)[lo]

which is a (16, P) x (P, 16) matmul on the MXU — 32 VPU compares per byte
instead of 256 for a direct one-hot, with the counting itself on the MXU.
Counts accumulate exactly: f32 partials stay below 2**24 because the
contraction is chunked to <= 2**22 elements; chunk results are summed in i32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_CHUNK = 1 << 22  # f32-exactness bound per contraction


@functools.partial(jax.jit, static_argnames=("n_valid_static",))
def histogram_batch(x: jnp.ndarray, lengths: jnp.ndarray,
                    n_valid_static: int | None = None) -> jnp.ndarray:
    """(B, P) uint8 blocks + (B,) true lengths -> (B, 256) int32 counts.

    Padding bytes are excluded via the length mask; histogram of the *valid*
    prefix of each row, matching per-block make_freq.
    """
    b, p = x.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, p), 1)
    valid = pos < lengths[:, None]
    xi = x.astype(jnp.int32)
    i16 = jnp.arange(16, dtype=jnp.int32)

    chunk = min(_CHUNK, p)
    n_chunks = -(-p // chunk)
    pad = n_chunks * chunk - p
    if pad:
        xi = jnp.pad(xi, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    xi = xi.reshape(b, n_chunks, chunk)
    valid = valid.reshape(b, n_chunks, chunk)

    oh_hi = ((xi[..., None] >> 4) == i16).astype(jnp.bfloat16)
    oh_lo = ((xi[..., None] & 15) == i16).astype(jnp.bfloat16)
    oh_hi = oh_hi * valid[..., None].astype(jnp.bfloat16)
    h = jnp.einsum("bcph,bcpl->bchl", oh_hi, oh_lo,
                   preferred_element_type=jnp.float32)
    return h.astype(jnp.int32).sum(axis=1).reshape(b, 256)
