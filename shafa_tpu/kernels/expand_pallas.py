"""Pallas TPU kernel: RLE run expansion (module D's hot loop #5).

The reference expands escape triples with byte-serial memsets
(rle_block_decompressor, d.c:116-197). The previous TPU formulation
(rle.rle_expand_compact) was output-centric binary search: every output
byte probed a per-row cumsum ~23 times — 2.3 G gathers for a 100 MB file
at the measured 83 Melem/s v5e gather rate = the entire 27 s decode wall
(BENCH_r03's 3.7 MB/s). This kernel has NO gathers at all.

Formulation — "place deltas, prefix-sum the page":

  For output byte position pos, the value is the symbol of its covering
  token. Let dsym[t] = sym[t] - sym[t-1] (token chain, per row) and
  off[t] = the token's first output byte. Then

      out[pos] = sum_{t : off[t] <= pos} dsym[t]

  i.e. EVERY inclusive prefix of the placed deltas is an actual byte
  value. Placement of W window tokens into a 2048-byte page is two
  one-hot factors contracted on the MXU:

      D[u, a] = sum_t A[u, t] * L[t, a]        u = 4*k + b2, a in [0,128)
      pos     = 512*b2 + 4*a + k               (k = byte-in-word)

  so the page prefix-sum decomposes into three cheap passes in (16, 128)
  layout (k across row-blocks, a across lanes, b2 across sections), and
  the 4 k-blocks pack directly into little-endian u32 words — the page is
  written as a (4, 128) i32 block whose ravel IS the byte stream.

Per page the kernel DMAs a W-lane window of (off, dsym) from HBM; W=8192
bounds the worst case (a 2048-byte page covered by 2049 one-byte tokens
of up to 3 input lanes each, plus 512 window alignment). Window start and
the base symbol (prefix of all deltas before the window) are scalar-
prefetched, computed by ~n_pages searchsorted queries in XLA. Pages are
row-local: page q of row r covers the row's output bytes [2048q, 2048q+2048),
so windows never cross row boundaries; bytes past a row's true output
length are unspecified (consumers mask by length, as everywhere else).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: output page size in bytes (one grid step's output block)
PAGE_B = 2048
#: token window lanes per page (see module docstring for the bound)
WIN = 8192
#: window start alignment in lanes (<= the minimum P bucket, so r*P + ws
#: stays aligned for every batch shape)
WALIGN = 256
#: sentinel offset for non-token lanes. Offsets are GLOBAL (rows' outputs
#: laid back-to-back), so masking "off_rel < PAGE_B" is only sound while
#: every page start + PAGE_B stays below the sentinel — callers keep a
#: batch's total output under SENTINEL - PAGE_B (~1 GiB).
SENTINEL = np.int32(0x40000000)


def _expand_kernel(ws_ref, base_ref, pstart_ref, off_hbm, dsym_hbm, out_ref,
                   offw0, dsymw0, offw1, dsymw1, sems):
    """Grid (B, Q): one 2048-byte output page per step.

    Window DMAs are DOUBLE-BUFFERED: page pid+1's (off, dsym) windows are
    started while page pid computes (the two 32 KB window loads per 2 KB
    page otherwise serialize their latency into every grid step — measured
    as the dominant term of the expand stage). Two separate (1, WIN)
    buffers + static slot branches: Mosaic rejects dim-0 slices of a
    (2, WIN) scratch ("slice must be aligned to tiling (2)")."""
    r = pl.program_id(0)
    q = pl.program_id(1)
    n_q = pl.num_programs(1)
    nb_total = pl.num_programs(0) * n_q
    pid = r * n_q + q
    slot = pid % 2
    base = base_ref[pid]
    bufs = ((offw0, dsymw0), (offw1, dsymw1))

    def copies(p, si):
        ws = pl.multiple_of(ws_ref[p], WALIGN)  # flat lane index (r*P + ws)
        bo, bd = bufs[si]
        return (pltpu.make_async_copy(off_hbm.at[0, pl.ds(ws, WIN)],
                                      bo.at[0], sems.at[si, 0]),
                pltpu.make_async_copy(dsym_hbm.at[0, pl.ds(ws, WIN)],
                                      bd.at[0], sems.at[si, 1]))

    @pl.when(pid == 0)
    def _first():  # slot is 0 at pid 0
        for cp in copies(pid, 0):
            cp.start()

    for si in (0, 1):
        @pl.when(slot == si)
        def _wait(si=si):
            for cp in copies(pid, si):
                cp.wait()

        @pl.when((pid + 1 < nb_total) & (slot == si))
        def _prefetch_next(si=si):
            for cp in copies(pid + 1, 1 - si):
                cp.start()

    page_start = pstart_ref[pid]                 # global output byte
    offv = jnp.where(slot == 0, offw0[0:1, :], offw1[0:1, :])
    dsv = jnp.where(slot == 0, dsymw0[0:1, :], dsymw1[0:1, :])
    off_rel = offv - page_start                  # (1, W)
    contrib = jnp.where(off_rel < PAGE_B, dsv, 0)
    pos = jnp.clip(off_rel, 0, PAGE_B - 1)       # (1, W) in [0, 2048)

    k = pos & 3
    w = pos >> 2
    b2 = w >> 7
    a = w & 127
    u = 4 * k + b2                               # (1, W) in [0, 16)

    # one-hot factors (bf16 exact: |dsym| <= 255, onehots 0/1). Both are
    # built with WIN on the LANE axis (sublane broadcasts are free); the
    # contraction runs over lanes on the MXU.
    u_ids = jax.lax.broadcasted_iota(jnp.int32, (16, WIN), 0)
    A = jnp.where(jnp.broadcast_to(u, (16, WIN)) == u_ids,
                  jnp.broadcast_to(contrib, (16, WIN)), 0) \
        .astype(jnp.bfloat16)
    a_ids = jax.lax.broadcasted_iota(jnp.int32, (128, WIN), 0)
    L = (jnp.broadcast_to(a, (128, WIN)) == a_ids).astype(jnp.bfloat16)
    D = jax.lax.dot_general(A, L, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (16, 128)
    D = D.astype(jnp.int32)

    # --- prefix over pos = 512*b2 + 4*a + k ------------------------------
    # 1) k-prefix: row-blocks [4k : 4k+4] accumulate downward
    s0 = D[0:4, :]
    s1 = s0 + D[4:8, :]
    s2 = s1 + D[8:12, :]
    s3 = s2 + D[12:16, :]
    S = jnp.concatenate([s0, s1, s2, s3], axis=0)  # (16, 128)

    # 2) a-prefix: exclusive lane-cumsum of the k-totals (s3), added to all
    g = s3  # (4, 128) per-(b2, a) totals
    lane = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 1)
    acc = g
    sft = 1
    while sft < 128:
        acc = acc + jnp.where(lane >= sft, pltpu.roll(acc, sft, 1), 0)
        sft *= 2
    excl_a = acc - g                               # (4, 128) exclusive
    S = S + jnp.concatenate([excl_a] * 4, axis=0)

    # 3) b2-prefix: section totals = inclusive value at (k=3, a=127)
    tot = (s3 + excl_a)[:, 127:128]                # (4, 1) per-b2 totals
    lt = (jax.lax.broadcasted_iota(jnp.int32, (4, 4), 1)
          < jax.lax.broadcasted_iota(jnp.int32, (4, 4), 0)) \
        .astype(jnp.float32)                       # strict lower triangle
    excl_b = jax.lax.dot_general(
        lt, tot.astype(jnp.float32), (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32).astype(jnp.int32)  # (4, 1)
    S = S + jnp.broadcast_to(jnp.concatenate([excl_b] * 4, axis=0), (16, 128))

    S = S + base                                   # absolute symbol values

    # --- pack k-blocks into little-endian words ---------------------------
    bt = S & 255
    words = (bt[0:4, :] | (bt[4:8, :] << 8)
             | (bt[8:12, :] << 16) | (bt[12:16, :] << 24))
    out_ref[0, 0] = words                          # (4, 128) = page words


@functools.partial(jax.jit, static_argnames=("b", "n_q", "interpret"))
def _expand_pages_call(ws_flat, base_flat, pstart_flat, off_flat, dsym_flat,
                       b: int, n_q: int, interpret: bool = False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # ws_flat, base_flat, pstart_flat
        grid=(b, n_q),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, 4, 128), lambda r, q, *_: (r, q, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, WIN), jnp.int32),
            pltpu.VMEM((1, WIN), jnp.int32),
            pltpu.VMEM((1, WIN), jnp.int32),
            pltpu.VMEM((1, WIN), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        _expand_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_q, 4, 128), jnp.int32),
        interpret=interpret,
    )(ws_flat.astype(jnp.int32), base_flat.astype(jnp.int32),
      pstart_flat.astype(jnp.int32), off_flat, dsym_flat)


@jax.jit
def rle_expand_prep(x: jnp.ndarray, lengths: jnp.ndarray) -> dict:
    """Shared expand pre-pass: token FSM + cumsums, ONE device pass.

    Returns the per-lane arrays both the exact-size query and the page
    kernel need ({off, dsym, cum, fill, out_base, out_len}). Callers that
    need sizes first (to pick out_p/out_sz) download out_len from this
    prep and then run rle_expand_compact_prepped — previously the token
    FSM + cumsum ran TWICE (rle_expand_sizes, then again inside the page
    prepass), a full extra pass over the decoded stream per batch."""
    from .rle import _token_fields
    b, p = x.shape
    is_tok, sym, cnt = _token_fields(x, lengths)
    cum = jnp.cumsum(cnt, axis=1)                  # (B, P) inclusive, local
    out_len = cum[:, -1]
    out_base = jnp.cumsum(out_len) - out_len      # (B,) global row starts
    # GLOBAL exclusive start offset per token (rows back-to-back): a window
    # that runs past its row only sees larger offsets, whose contributions
    # land in the page's past-row-end garbage zone.
    off = jnp.where(is_tok, out_base[:, None] + cum - cnt, SENTINEL)
    # previous token's symbol within the row (forward fill via cummax of
    # (pos<<8 | sym); pos < 2^24 so the packed key fits uint32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, p), 1)
    key = jnp.where(is_tok, ((pos.astype(jnp.uint32) << 8)
                             | sym.astype(jnp.uint32)), 0)
    fill = jax.lax.cummax(key, axis=1)             # (B, P)
    prev = jnp.pad(fill[:, :-1], ((0, 0), (1, 0)))
    prev_sym = (prev & 255).astype(jnp.int32)      # 0 before first token
    dsym = jnp.where(is_tok, sym - prev_sym, 0)
    return dict(off=off, dsym=dsym, cum=cum, fill=fill,
                out_base=out_base, out_len=out_len)


def _page_windows(prep: dict, n_q: int):
    """Per-page (window start, base symbol, page start) from the prep
    arrays + flat padded (off, dsym) for the kernel's window DMAs."""
    cum = prep["cum"]
    fill = prep["fill"]
    b, p = cum.shape
    qpos = jax.lax.broadcasted_iota(jnp.int32, (b, n_q), 1) * PAGE_B
    # first covering token lane: count of lanes with cum <= qpos (cum is
    # non-decreasing per row; non-token lanes repeat the previous value but
    # sit at later indices, so the count lands on the token lane itself).
    # Binary search: log2(P) probe rounds over only (B, n_q) page queries.
    lo = jnp.zeros((b, n_q), jnp.int32)
    step = 1 << max(0, (p - 1).bit_length() - 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, n_q), 0)
    cum_flat = cum.ravel()
    while step:
        idx = lo + (step - 1)
        probe = cum_flat[rows * p + jnp.minimum(idx, p - 1)]
        lo = lo + jnp.where((idx < p) & (probe <= qpos), step, 0)
        step >>= 1
    fl = jnp.minimum(lo, p - 1)                    # first covering lane
    ws = (fl // WALIGN) * WALIGN                   # aligned window start
    # base = symbol prefix of all tokens strictly before lane ws
    fill_flat = fill.ravel()
    prev_fill = fill_flat[rows * p + jnp.maximum(ws - 1, 0)]
    base = jnp.where(ws > 0, (prev_fill & 255).astype(jnp.int32), 0)

    # flatten + pad so every window DMA [r*P + ws, +WIN) is in bounds
    off_flat = jnp.pad(prep["off"].reshape(1, b * p), ((0, 0), (0, WIN)),
                       constant_values=SENTINEL)
    dsym_flat = jnp.pad(prep["dsym"].reshape(1, b * p), ((0, 0), (0, WIN)))
    ws_flat = (rows * p + ws).reshape(-1)
    base_flat = base.reshape(-1)
    pstart_flat = (prep["out_base"][:, None] + qpos).reshape(-1)
    return off_flat, dsym_flat, ws_flat, base_flat, pstart_flat


def _check_shapes(b: int, out_p: int) -> int:
    if out_p % PAGE_B:
        raise ValueError(f"out_p must be a multiple of {PAGE_B}")
    if b * out_p > int(SENTINEL) - PAGE_B:
        raise ValueError("batch output too large for the sentinel masking; "
                         "split the batch (see SENTINEL)")
    return out_p // PAGE_B


@functools.partial(jax.jit, static_argnames=("out_p", "interpret"))
def rle_expand_pages_prepped(prep: dict, out_p: int,
                             interpret: bool = False):
    """rle_expand_pages from a precomputed rle_expand_prep dict (skips the
    second token-FSM pass when the caller already downloaded sizes)."""
    b = prep["cum"].shape[0]
    n_q = _check_shapes(b, out_p)
    off_flat, dsym_flat, ws_flat, base_flat, pstart_flat = \
        _page_windows(prep, n_q)
    pages = _expand_pages_call(ws_flat, base_flat, pstart_flat, off_flat,
                               dsym_flat, b, n_q, interpret=interpret)
    return pages.reshape(b, n_q * 512), prep["out_len"]


@functools.partial(jax.jit, static_argnames=("out_p", "interpret"))
def rle_expand_pages(x: jnp.ndarray, lengths: jnp.ndarray, out_p: int,
                     interpret: bool = False):
    """RLE expand into word-layout pages: ((B, out_p//4) i32 LE, (B,) lens).

    out_p (bytes, multiple of PAGE_B) >= the largest decompressed block.
    The i32 words are little-endian: row r's decompressed bytes are
    out[r].ravel().view(u8)[:lens[r]]. Bytes past each row's length are
    UNSPECIFIED. Replaces the searchsorted emission for the TPU path.
    """
    b, p = x.shape
    n_q = _check_shapes(b, out_p)
    prep = rle_expand_prep(x, lengths)
    off_flat, dsym_flat, ws_flat, base_flat, pstart_flat = \
        _page_windows(prep, n_q)
    pages = _expand_pages_call(ws_flat, base_flat, pstart_flat, off_flat,
                               dsym_flat, b, n_q, interpret=interpret)
    return pages.reshape(b, n_q * 512), prep["out_len"]


def rle_expand_pages_reference(x: np.ndarray, lengths: np.ndarray,
                               out_p: int):
    """Slow numpy oracle of rle_expand_pages for differential tests."""
    b = x.shape[0]
    out = np.zeros((b, out_p), np.uint8)
    lens = np.zeros(b, np.int32)
    for r in range(b):
        row = bytes(x[r, : lengths[r]].tolist())
        dec = bytearray()
        i = 0
        while i < len(row):
            if row[i] == 0:  # escape triple (truncated fields read as 0,
                s = row[i + 1] if i + 1 < len(row) else 0   # matching
                c = row[i + 2] if i + 2 < len(row) else 0   # _token_fields)
                dec += bytes([s]) * max(c, 1)
                i += 3
            else:
                dec.append(row[i])
                i += 1
        lens[r] = len(dec)
        w = min(len(dec), out_p)  # callers size out_p >= max row; a smaller
        out[r, :w] = np.frombuffer(bytes(dec[:w]), np.uint8)  # probe call
        # still gets exact lens
    return out.reshape(b, out_p // 4, 4).view(np.int32).reshape(b, -1), lens
