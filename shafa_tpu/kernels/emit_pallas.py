"""Pallas TPU kernel: variable-rate bit emission (the codec's hot loop).

This is the TPU-native replacement for the reference's OR-packing inner
loops (binary_coding c.c:52-83 and the RLE byte emission f.c:34-53). Both
XLA formulations tried before it — scatter-add emission and output-centric
binary-search gathers — lower to serialized element loops on v5e (measured
10-60 Melem/s scatter; 0.8 MB/s for the gather emission at (4, 8 MiB)),
so the emission lives in a hand-written Mosaic kernel instead.

Model: every input lane carries a left-aligned payload of `bitlen` <= 32
bits (a Shannon-Fano code, an RLE escape triple, a literal byte, ...). The
output is the MSB-first concatenation of all payloads of all valid lanes,
each row's stream starting at a host-chosen 512-byte-aligned offset of one
flat u32 buffer — i.e. compaction happens inside the kernel: rows can be
laid out back-to-back (fused download) or strided (the (B, P) padded
layout), purely by the host's choice of row offsets.

Key structural fact exploited: bitlen <= 32 means each lane advances the
output *word* index by 0 or 1, so a tile of T lanes spans at most T+2
words, and per-word accumulation is an exact one-hot matmul on the MXU
(16-bit halves carried in f32; within one output word all contributions
occupy disjoint bits, so integer-add == bitwise-OR and every 16-bit
partial sum stays <= 0xFFFF).

Kernel structure (grid = (rows, tiles), sequential on the core):
  per tile: optional in-kernel 256-entry LUT via nibble one-hot matmuls
            -> exclusive log-shift cumsum of bitlens (+ carry from SMEM)
            -> per-lane word index / in-word shift -> hi/lo u32 splits
            -> one-hot (W, T) matmul places 16-bit halves into W words
            -> byte-swap (file byte order), roll into a 2-page VMEM
               accumulator, OR at a 128-word-aligned slot
            -> page full? DMA the 8 KiB page to HBM at a dynamic
               128-word-aligned offset, slide the accumulator window.
Carry across tiles: bit offset + partial last word, in SMEM scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: default lanes per tile (input symbols per grid step)
TILE = 1024
#: placement sub-chunk width: the (w_span, T) one-hot placement is the
#: kernel's quadratic term; splitting the tile into T/SUB_LANES sub-chunks
#: each placed into its own (SUB_LANES+2)-word window cuts it ~sub x
#: (measured +60% at T=1024 over T=256 monolithic on v5e)
SUB_LANES = 128
#: page = DMA flush unit, in u32 words (8 KiB)
PAGE = 2048

assert PAGE % 128 == 0


def _round128(n: int) -> int:
    return (n + 127) & ~127


def _cumsum_lanes(x, inclusive=True):
    """Log-shift cumsum along the lane axis of a (1, T) int32 array."""
    n = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    acc = x
    s = 1
    while s < n:
        acc = acc + jnp.where(lane >= s, pltpu.roll(acc, s, 1),
                              jnp.zeros_like(acc))
        s *= 2
    return acc if inclusive else acc - x


#: stacked-LUT quarter tables: len, hi>>8, hi&255, lo>>8, lo&255
N_LUT_Q = 5


def _stack_luts(lut_len, lut_hi, lut_lo):
    """(B, 256) len / 16-bit-half tables -> (B, 80, 16) f32 stacked table.

    Row q*16+lo holds quarter-table q over the LOW nibble, columns are the
    HIGH nibble, so ONE default-precision matmul against the high-nibble
    one-hot fetches all five quarters: every entry is <= 255, exact under
    the MXU's bf16 multiplies — the three separate Precision.HIGHEST
    matmuls this replaces each cost 6 MXU passes.
    """
    def q(t):  # (B, 256) -> (B, 16, 16) [b, lo, hi]
        return t.reshape(-1, 16, 16).transpose(0, 2, 1).astype(jnp.float32)

    return jnp.concatenate(
        [q(lut_len), q(lut_hi >> 8), q(lut_hi & 0xFF),
         q(lut_lo >> 8), q(lut_lo & 0xFF)], axis=1)


def _lut256_stacked(tabs_f32, oh_hi, oh_lo):
    """All five quarter-LUTs in one bf16-exact matmul: (ln, val) per lane.

    tabs_f32 (80, 16) from _stack_luts; oh_hi/oh_lo (16, T). Returns
    ln (1, T) int32 and val (1, T) uint32 (left-aligned code)."""
    mid = jax.lax.dot_general(
        tabs_f32, oh_hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (80, T): [q*16+lo, i]

    def pick(qi):
        part = mid[qi * 16:(qi + 1) * 16] * oh_lo
        return jnp.sum(part, axis=0, keepdims=True)  # (1, T) f32

    ln = pick(0).astype(jnp.int32)

    def u16(hi8, lo8):  # exact f32 integers <= 255 -> u32 halfword
        return pltpu.bitcast((hi8 * 256.0 + lo8).astype(jnp.int32),
                             jnp.uint32)

    val = (u16(pick(1), pick(2)) << 16) | u16(pick(3), pick(4))
    return ln, val


def _byteswap32_u(x_u32):
    """Per-word byte swap: MSB-first bitstream -> little-endian u32 buffer,
    so the downloaded buffer viewed as uint8 is the file byte stream."""
    return ((x_u32 >> 24) | ((x_u32 >> 8) & jnp.uint32(0xFF00))
            | ((x_u32 << 8) & jnp.uint32(0xFF0000)) | (x_u32 << 24))


def _emit_kernel(row_len_ref, woff_ref, *args, lut, t_lanes):
    """Grid (B, n_tiles). See module docstring.

    args (lut=True):  x, tabs (1, 80, 16) f32, out, pagebuf, sem, smem
    args (lut=False): val, bitlen, out, pagebuf, sem, smem
    smem: [0]=carry_bits [1]=flushed_pages [2]=carry_word (i32 bits)
    """
    if lut:
        x_ref, tabs_ref, out_ref, pagebuf, sem, smem = args
    else:
        val_ref, bitlen_ref, out_ref, pagebuf, sem, smem = args
    w_span = t_lanes + 2
    reg = _round128(w_span + 127)
    s_lanes = min(SUB_LANES, t_lanes)
    r_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    row_len = row_len_ref[r_idx]
    woff = pl.multiple_of(woff_ref[r_idx], 128)
    last_tile = jnp.maximum((row_len + t_lanes - 1) // t_lanes - 1, 0)

    @pl.when(t_idx == 0)
    def _init():
        smem[0] = 0
        smem[1] = 0
        smem[2] = 0
        pagebuf[...] = jnp.zeros((1, 2 * PAGE), jnp.int32)

    # Tiles past the row's data (P padded >> row_len) skip all compute —
    # the pack input is a 2x-overprovisioned RLE buffer, so this guard is
    # worth ~2x on the C stage.
    @pl.when(t_idx <= last_tile)
    def _body():
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, t_lanes), 1)
        gpos = t_idx * t_lanes + lane
        valid = gpos < row_len

        # --- per-lane (payload, bitlen) -------------------------------------
        if lut:
            xi = x_ref[...].astype(jnp.int32)
            k16 = jax.lax.broadcasted_iota(jnp.int32, (16, t_lanes), 0)
            oh_hi = (jnp.broadcast_to(xi >> 4, (16, t_lanes)) == k16) \
                .astype(jnp.float32)
            oh_lo = (jnp.broadcast_to(xi & 15, (16, t_lanes)) == k16) \
                .astype(jnp.float32)
            ln, val = _lut256_stacked(tabs_ref[0], oh_hi, oh_lo)
        else:
            val = pltpu.bitcast(val_ref[...], jnp.uint32)
            ln = bitlen_ref[...]
        ln = jnp.where(valid, ln, 0)
        val = jnp.where(ln > 0, val, jnp.uint32(0))

        # --- bit offsets (carry + local exclusive cumsum) -------------------
        carry_bits = smem[0]
        off = carry_bits + _cumsum_lanes(ln, inclusive=False)
        sum_len = jnp.sum(ln)
        new_bits = carry_bits + sum_len

        base_w = carry_bits >> 5
        w = (off >> 5) - base_w      # word advance per lane: in [0, w_span)
        r5 = pltpu.bitcast(off & 31, jnp.uint32)
        hi = val >> r5                                  # bits into word w
        lo = (val << (jnp.uint32(31) - r5)) << 1        # bits into word w + 1

        def u16f(z):  # u32 (< 2^16) -> f32; Mosaic lacks a u32->f32 cast
            return pltpu.bitcast(z, jnp.int32).astype(jnp.float32)

        def f16u(z):  # f32 integer (< 2^16) -> u32, via the i32 cast
            return pltpu.bitcast(z.astype(jnp.int32), jnp.uint32)

        # --- place into words: sub-chunked one-hot matmuls ------------------
        # The (w_span, T) one-hot placement is quadratic in T; each
        # SUB_LANES-wide sub-chunk spans <= s+2 words, so placing per
        # sub-chunk into its own window and OR-merging (contributions to a
        # shared boundary word occupy disjoint bits) cuts the quadratic by
        # T/SUB_LANES while keeping one grid step per T lanes. Payload words
        # travel as BYTE quarters: every matmul value <= 255 is exact under
        # the MXU's default-precision bf16 multiplies — the u16 halves this
        # replaces needed Precision.HIGHEST (6 passes per matmul).
        ws = s_lanes + 2
        lanes_reg = jax.lax.broadcasted_iota(jnp.int32, (1, reg), 1)
        wq = jax.lax.broadcasted_iota(jnp.int32, (ws, s_lanes), 0)
        wl_s = jax.lax.broadcasted_iota(jnp.int32, (1, ws), 1)
        acc = jnp.zeros((1, reg), jnp.int32)
        for k in range(t_lanes // s_lanes):
            sl = slice(k * s_lanes, (k + 1) * s_lanes)
            wk = w[:, sl]
            base_k = jnp.min(wk)  # == wk[0,0]: w is monotone
            cmp = (jnp.broadcast_to(wk - base_k, (ws, s_lanes)) == wq) \
                .astype(jnp.float32)
            hq = hi[:, sl]
            lq = lo[:, sl]
            halves = jnp.concatenate(
                [u16f(hq >> 24), u16f((hq >> 16) & jnp.uint32(0xFF)),
                 u16f((hq >> 8) & jnp.uint32(0xFF)),
                 u16f(hq & jnp.uint32(0xFF)),
                 u16f(lq >> 24), u16f((lq >> 16) & jnp.uint32(0xFF)),
                 u16f((lq >> 8) & jnp.uint32(0xFF)),
                 u16f(lq & jnp.uint32(0xFF))],
                axis=0)                                  # (8, s) bytes
            placed = jax.lax.dot_general(
                halves, cmp, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (8, ws)
            ph = (f16u(placed[0:1]) << 24) | (f16u(placed[1:2]) << 16) \
                | (f16u(placed[2:3]) << 8) | f16u(placed[3:4])
            plo = (f16u(placed[4:5]) << 24) | (f16u(placed[5:6]) << 16) \
                | (f16u(placed[6:7]) << 8) | f16u(placed[7:8])
            # lo parts land one word later: shift right by 1, zero slot 0
            plo = jnp.where(wl_s >= 1, pltpu.roll(plo, 1, 1), jnp.uint32(0))
            wk_words = pltpu.bitcast(ph + plo, jnp.int32)
            wpad = jnp.concatenate(
                [wk_words, jnp.zeros((1, reg - ws), jnp.int32)], axis=1)
            rolled = pltpu.roll(wpad, base_k, 1)
            rolled = jnp.where((lanes_reg >= base_k)
                               & (lanes_reg < base_k + ws), rolled, 0)
            acc = acc | rolled
        # carry word (bits of the partial first word from previous tiles):
        # disjoint bits, so OR == add
        acc = acc | jnp.where(lanes_reg == 0, smem[2], 0)
        words = pltpu.bitcast(acc[:, :w_span], jnp.uint32)

        # --- next carry word (masked sums; no dynamic scalar VMEM reads) ----
        last_wrel = (new_bits >> 5) - base_w
        hi_i = pltpu.bitcast(hi, jnp.int32)  # i32 adds wrap like u32
        lo_i = pltpu.bitcast(lo, jnp.int32)
        cw_i = (jnp.sum(jnp.where(w == last_wrel, hi_i, 0))
                + jnp.sum(jnp.where(w + 1 == last_wrel, lo_i, 0)))
        cw_i = cw_i + jnp.where(last_wrel == 0, smem[2], 0)

        # --- OR the tile's words into the 2-page accumulator ----------------
        flushed = smem[1]
        slot = base_w - flushed * PAGE           # in [0, PAGE)
        a_base = pl.multiple_of((slot >> 7) << 7, 128)
        sh = slot & 127
        wpad = jnp.concatenate(
            [pltpu.bitcast(_byteswap32_u(words), jnp.int32),
             jnp.zeros((1, reg - w_span), jnp.int32)], axis=1)
        rolled = pltpu.roll(wpad, sh, 1)
        rolled = jnp.where((lanes_reg >= sh) & (lanes_reg < sh + w_span),
                           rolled, 0)
        pagebuf[0:1, pl.ds(a_base, reg)] = pagebuf[0:1, pl.ds(a_base, reg)] \
            | rolled

        smem[0] = new_bits
        smem[2] = cw_i

        # --- flush a completed page ------------------------------------------
        new_w = new_bits >> 5

        @pl.when(new_w >= (flushed + 1) * PAGE)
        def _flush():
            dst = pl.multiple_of(woff + flushed * PAGE, 128)
            cp = pltpu.make_async_copy(pagebuf.at[0, pl.ds(0, PAGE)],
                                       out_ref.at[0, pl.ds(dst, PAGE)], sem)
            cp.start()
            cp.wait()
            pagebuf[0:1, 0:PAGE] = pagebuf[0:1, PAGE:2 * PAGE]
            pagebuf[0:1, PAGE:2 * PAGE] = jnp.zeros((1, PAGE), jnp.int32)
            smem[1] = flushed + 1

        # --- row end: flush the remaining window (both pages) ----------------
        @pl.when(t_idx == last_tile)
        def _final():
            f = smem[1]
            dst = pl.multiple_of(woff + f * PAGE, 128)
            cp = pltpu.make_async_copy(pagebuf.at[0, pl.ds(0, 2 * PAGE)],
                                       out_ref.at[0, pl.ds(dst, 2 * PAGE)],
                                       sem)
            cp.start()
            cp.wait()


def _emit_call(lut: bool, b: int, p: int, out_words: int, t_lanes: int,
               interpret: bool):
    if p % t_lanes:
        raise ValueError(f"P={p} must be a multiple of t_lanes={t_lanes}")
    n_tiles = p // t_lanes
    kern = functools.partial(_emit_kernel, lut=lut, t_lanes=t_lanes)
    # (B, P) arrays travel flattened to (1, B*P): TPU block shapes require
    # the sublane block dim to divide 8 or equal the array dim, which a
    # (1, t_lanes) block over (B, P) violates for B > 1.
    flat = pl.BlockSpec((1, t_lanes),
                        lambda r, t, *_: (0, r * n_tiles + t))
    if lut:
        in_specs = [
            flat,
            pl.BlockSpec((1, 16 * N_LUT_Q, 16), lambda r, t, *_: (r, 0, 0)),
        ]
    else:
        in_specs = [flat, flat]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # row_lens, woff_words
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((1, 2 * PAGE), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SMEM((3,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, out_words), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )


@functools.partial(jax.jit,
                   static_argnames=("out_words", "t_lanes", "interpret"))
def emit_bits(val: jnp.ndarray, bitlen: jnp.ndarray, row_lens: jnp.ndarray,
              woff_words: jnp.ndarray, out_words: int,
              t_lanes: int = TILE, interpret: bool = False) -> jnp.ndarray:
    """Concatenate per-lane payloads into packed rows of one flat buffer.

    val (B, P) uint32 left-aligned payloads; bitlen (B, P) int32 in [0, 32];
    row_lens (B,) int32 valid lanes per row; woff_words (B,) int32 128-word
    -multiple output offset per row. Returns (1, out_words) int32 whose u8
    view (little-endian) is the byte stream; out_words must leave 2*PAGE
    words of slack after the last row's end (see aligned_offsets).
    """
    b, p = val.shape
    pad = (-p) % t_lanes
    if pad:
        val = jnp.pad(val, ((0, 0), (0, pad)))
        bitlen = jnp.pad(bitlen, ((0, 0), (0, pad)))
        p += pad
    call = _emit_call(False, b, p, out_words, t_lanes, interpret)
    return call(row_lens.astype(jnp.int32), woff_words.astype(jnp.int32),
                jax.lax.bitcast_convert_type(val, jnp.int32)
                .reshape(1, b * p), bitlen.reshape(1, b * p))


@functools.partial(jax.jit,
                   static_argnames=("out_words", "t_lanes", "interpret"))
def emit_coded(x: jnp.ndarray, row_lens: jnp.ndarray,
               lut_len: jnp.ndarray, lut_hi: jnp.ndarray,
               lut_lo: jnp.ndarray, woff_words: jnp.ndarray,
               out_words: int, t_lanes: int = TILE,
               interpret: bool = False) -> jnp.ndarray:
    """Module C's whole hot path in one kernel: per-symbol LUT + bit-pack.

    x (B, P) uint8 symbols; lut_len (B, 256) int32 code bit lengths;
    lut_hi/lut_lo (B, 256) int32 high/low 16-bit halves of the left-aligned
    code values. Other args/returns as emit_bits. (Replaces the reference's
    pre-shifted 8-offset table + OR loop, c.c:91-237 + 52-83.)
    """
    b, p = x.shape
    pad = (-p) % t_lanes
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
        p += pad
    call = _emit_call(True, b, p, out_words, t_lanes, interpret)
    return call(row_lens.astype(jnp.int32), woff_words.astype(jnp.int32),
                x.reshape(1, b * p),
                _stack_luts(lut_len.astype(jnp.int32),
                            lut_hi.astype(jnp.int32),
                            lut_lo.astype(jnp.int32)))


@functools.partial(jax.jit, static_argnames=("stride_words", "t_lanes",
                                              "interpret"))
def emit_bits_rows(val: jnp.ndarray, bitlen: jnp.ndarray,
                   row_lens: jnp.ndarray, stride_words: int,
                   t_lanes: int = TILE,
                   interpret: bool = False) -> jnp.ndarray:
    """emit_bits into a strided (B, 4*stride_words) uint8 row layout.

    Row r's packed stream occupies out[r, :ceil(bits_r/8)]; bytes past each
    row's end are unspecified. stride_words must be a multiple of 128 (512 B
    row alignment) and >= each row's packed length in words. Used by the
    RLE encoder, whose output feeds the pack stage as a padded (B, P) array.
    """
    if stride_words % 128:
        raise ValueError("stride_words must be a multiple of 128")
    b = val.shape[0]
    woff = jnp.arange(b, dtype=jnp.int32) * stride_words
    out_words = b * stride_words + 2 * PAGE
    flat = emit_bits(val, bitlen, row_lens, woff, out_words=out_words,
                     t_lanes=t_lanes, interpret=interpret)
    rows = flat[0, : b * stride_words].reshape(b, stride_words)
    return jax.lax.bitcast_convert_type(rows, jnp.uint8) \
        .reshape(b, 4 * stride_words)


@functools.partial(jax.jit, static_argnames=("stride_words", "t_lanes",
                                              "interpret"))
def emit_coded_words(x: jnp.ndarray, row_lens: jnp.ndarray,
                     lut_len: jnp.ndarray, lut_hi: jnp.ndarray,
                     lut_lo: jnp.ndarray, stride_words: int,
                     t_lanes: int = TILE,
                     interpret: bool = False) -> jnp.ndarray:
    """emit_coded into strided (B, stride_words) int32 WORD rows.

    Row r's packed bytes are the little-endian u8 view of its words. The
    word layout is what device-side consumers (compact_words) and host
    .view(uint8) need; the u8-bitcast variant below materializes a
    (B, stride, 4) intermediate that XLA lays out catastrophically at
    multi-GB strides (34 GiB compile-time allocation observed at
    (8, 16 Mi) — the minor-4 dim tiles against (8, 128)).
    """
    if stride_words % 128:
        raise ValueError("stride_words must be a multiple of 128")
    b = x.shape[0]
    woff = jnp.arange(b, dtype=jnp.int32) * stride_words
    out_words = b * stride_words + 2 * PAGE
    flat = emit_coded(x, row_lens, lut_len, lut_hi, lut_lo, woff,
                      out_words=out_words, t_lanes=t_lanes,
                      interpret=interpret)
    return flat[0, : b * stride_words].reshape(b, stride_words)


def emit_coded_rows(x: jnp.ndarray, row_lens: jnp.ndarray,
                    lut_len: jnp.ndarray, lut_hi: jnp.ndarray,
                    lut_lo: jnp.ndarray, stride_words: int,
                    t_lanes: int = TILE,
                    interpret: bool = False) -> jnp.ndarray:
    """emit_coded into a strided (B, 4*stride_words) uint8 row layout.

    Prefer emit_coded_words + a host-side .view(uint8) for large strides
    (see its docstring); this byte-layout wrapper remains for small-shape
    and test callers.
    """
    b = x.shape[0]
    rows = emit_coded_words(x, row_lens, lut_len, lut_hi, lut_lo,
                            stride_words, t_lanes=t_lanes,
                            interpret=interpret)
    return jax.lax.bitcast_convert_type(rows, jnp.uint8) \
        .reshape(b, 4 * stride_words)


def aligned_offsets_device(out_bytes: int) -> int:
    """Static out_words for a single-row flat emission of out_bytes."""
    words = (out_bytes + 3) // 4
    return -(-words // 128) * 128 + 2 * PAGE


def aligned_offsets(byte_lens, align: int = 512):
    """Host helper: 512 B-aligned row start offsets for back-to-back layout.

    Returns (woff_words (B,) int32, total_words int incl. 2*PAGE slack).
    Host slices row i's bytes at [4*woff[i], 4*woff[i] + byte_lens[i]).
    """
    starts = np.zeros(len(byte_lens), np.int64)
    pos = 0
    for i, n in enumerate(byte_lens):
        starts[i] = pos
        pos += (int(n) + align - 1) // align * align
    return (starts // 4).astype(np.int32), pos // 4 + 2 * PAGE


def emit_reference(val: np.ndarray, bitlen: np.ndarray, row_lens: np.ndarray,
                   woff_words: np.ndarray, out_words: int) -> np.ndarray:
    """Slow numpy oracle of emit_bits for differential tests."""
    out = np.zeros(out_words * 4, np.uint8)
    for r in range(val.shape[0]):
        bitpos = 0
        base = int(woff_words[r]) * 4
        for i in range(int(row_lens[r])):
            ln = int(bitlen[r, i])
            v = int(val[r, i])
            for k in range(ln):
                bit = (v >> (31 - k)) & 1
                if bit:
                    out[base + (bitpos >> 3)] |= 0x80 >> (bitpos & 7)
                bitpos += 1
    return out.view(np.int32).reshape(1, out_words)
