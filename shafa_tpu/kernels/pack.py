"""Bit-pack encode — module C's binary_coding (c.c:52-83), TPU formulation.

The reference's trick is a pre-shifted 8-offset table so its inner loop is
branchless ORs (c.c:104,186-219). The vector equivalent:

  1. per-symbol (len, leftaligned32) LUT lookup via nibble matmuls
  2. bit offsets = exclusive cumsum of lengths (MSB-first stream order)
  3. each symbol's shifted code spans <= 5 bytes: byte k of
     (code64 << (8 - sh)) placed at byte_pos + k, sh = bit offset & 7
  4. since symbols' bit ranges are disjoint, OR == ADD: five sorted
     scatter-adds build the packed stream (no carries: each output byte
     receives only its own bits).

Codes longer than 32 bits (pathological skew; needs a block > 2^32 bytes to
even approach optimality) fall back to the numpy oracle at the backend level.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .ops import exclusive_cumsum, lut_nibble, lut_nibble_u32

MAX_CODE_BITS = 32
SPAN = 5  # ceil((32 + 7) / 8)


def pack_out_bound(p: int) -> int:
    """Worst-case packed bytes for p symbols of <=32-bit codes (rounded to
    a 512-multiple; see rle_out_bound)."""
    return (4 * p + 16 + 511) & ~511


def pack_stage1(x: jnp.ndarray, lengths: jnp.ndarray,
                code_lens: jnp.ndarray, code_vals: jnp.ndarray):
    """LUT lookup + bit-offset scan: (off, val, valid).

    Kept as a SEPARATE compile unit from pack_stage2: fusing the MXU LUT
    matmuls + cumsum with the emission scatters into one XLA program blows
    compile time from ~6 s to >400 s on v5e (same runtime either way).
    """
    b, p = x.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, p), 1)
    valid = pos < lengths[:, None]
    # Per-row LUTs: one-hot matmul against each row's table. vmap over rows.
    ln = jax.vmap(lut_nibble)(x, code_lens)
    val = jax.vmap(lut_nibble_u32_rows)(x, code_vals)
    ln = jnp.where(valid, ln, 0)
    off = exclusive_cumsum(ln, axis=1)  # bit offsets
    out_len = (off[:, -1] + ln[:, -1] + 7) >> 3
    return off, val, valid, out_len


def pack_stage2(off: jnp.ndarray, val: jnp.ndarray, valid: jnp.ndarray):
    """Emission: 5 sorted scatter-adds of the shifted code bytes."""
    b, p = off.shape
    out_p = pack_out_bound(p)
    byte_pos = off >> 3
    sh = (off & 7).astype(jnp.uint32)
    # 40-bit window W = val << (8 - sh), bytes big-endian b0..b4
    v = val
    up = jnp.uint32(8) - sh
    bytes_ = [
        (v >> (jnp.uint32(24) + sh)) & jnp.uint32(0xFF),
        (v >> (jnp.uint32(16) + sh)) & jnp.uint32(0xFF),
        (v >> (jnp.uint32(8) + sh)) & jnp.uint32(0xFF),
        (v >> sh) & jnp.uint32(0xFF),
        jnp.where(up == 8, jnp.uint32(0), (v << (up % 8)) & jnp.uint32(0xFF)),
    ]
    flat_base = ((jnp.arange(b, dtype=jnp.int32) * out_p)[:, None]
                 + byte_pos).ravel()
    out = jnp.zeros(b * out_p, jnp.int32)
    vmask = valid.ravel()
    for k, bk in enumerate(bytes_):
        vk = jnp.where(vmask, bk.ravel().astype(jnp.int32), 0)
        out = out.at[flat_base + k].add(vk, indices_are_sorted=True,
                                        mode="drop")
    return out.reshape(b, out_p).astype(jnp.uint8)


_stage1_jit = jax.jit(pack_stage1)
_stage2_jit = jax.jit(pack_stage2)


def pack_batch(x: jnp.ndarray, lengths: jnp.ndarray,
               code_lens: jnp.ndarray, code_vals: jnp.ndarray):
    """Pack (B, P) uint8 symbol streams with per-block code tables.

    code_lens: (B, 256) int32; code_vals: (B, 256) uint32 (left-aligned).
    Returns ((B, 4P+16) uint8 packed, (B,) packed byte lengths).

    Dispatches the two stages as separate jit calls (device-resident
    between them) — see pack_stage1 for why they must not fuse.
    """
    off, val, valid, out_len = _stage1_jit(x, lengths, code_lens, code_vals)
    return _stage2_jit(off, val, valid), out_len


def pack_batch_fused(x, lengths, code_lens, code_vals):
    """Single-graph composite (for shard_map on CPU meshes / interpreters
    where the split isn't needed and a single jittable callee is)."""
    off, val, valid, out_len = pack_stage1(x, lengths, code_lens, code_vals)
    return pack_stage2(off, val, valid), out_len


def lut_nibble_u32_rows(x_row: jnp.ndarray, tab_row: jnp.ndarray):
    """Row-wise uint32 LUT via two 16-bit-half nibble lookups."""
    hi = lut_nibble(x_row, (tab_row >> 16).astype(jnp.int32))
    lo = lut_nibble(x_row, (tab_row & 0xFFFF).astype(jnp.int32))
    return (hi.astype(jnp.uint32) << 16) | lo.astype(jnp.uint32)


def build_code_luts(block_codes, np_module=np):
    """Host helper: list of 256 code strings per block -> stacked LUT arrays.

    Returns (lens (B,256) int32, vals (B,256) uint32, max_len int).
    Raises OverflowError if any code exceeds 32 bits (caller falls back).
    """
    from ..codes import code_table_arrays
    lens, vals = [], []
    maxlen = 0
    for cs in block_codes:
        ln, va = code_table_arrays(cs, width=32)
        lens.append(ln)
        vals.append(va)
        maxlen = max(maxlen, int(ln.max()))
    return (np_module.stack(lens), np_module.stack(vals), maxlen)
