"""Shannon-Fano prefix decode — module D's trie walk (d.c:514-551), TPU-way.

The reference walks a pointer trie bit-by-bit (~8 branches per compressed
byte — its hottest loop). That cannot run on a vector machine; instead we
exploit two structural facts of the reference's code construction (codes.py):

  * the code set is COMPLETE (the split tree is full), so every 32-bit
    window starting at a symbol boundary falls in exactly one code interval
    [code << (32-len), next_code << (32-next_len));
  * codes in rank order are lexicographically increasing, so "which code"
    is a RANK: count of codes whose left-aligned value <= window.

Pipeline (all batched over blocks, flat over bit positions):
  1. windows    W[b] = 32 bits starting at bit b (byte shifts, no gather)
  2. rank       hierarchical compare: 16 pivots -> group, 16 in-group
                thresholds (fetched by one-hot matmul, exact via u16 halves)
  3. len/sym    prefix-delta dot products against the same compare masks
                (integer-exact in f32; avoids 256-entry gathers which are
                ~90 Melem/s on v5e)
  4. chain      symbol starts p0=0, p_{k+1} = p_k + len[p_k]: pointer
                doubling with large-array gathers (~435 GB/s measured)
  5. emit       gather sym at chain positions; positions past the known
                output count are masked (decode terminates on count, not
                input exhaustion — d.c:530).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

N_GROUPS = 16
GROUP = 16


# ---------------------------------------------------------------------------
# Host-side table construction (per block; 256 entries — negligible)
# ---------------------------------------------------------------------------

def decode_tables_u32(codes: list[str]):
    """Code strings -> fixed-shape decode tables for the kernel.

    Returns dict of numpy arrays:
      pc      (256,) uint32  left-aligned code values, rank order, padded 0
      pivots  (16,)  uint32  pc[::16]
      dlen2d  (16,16) int32  len deltas per rank (len[r]-len[r-1])
      plen    (16,)  int32   sum of dlen over full groups < g (prefix)
      dsym2d, psym           same for symbol values
      n_codes ()     int32
    Raises OverflowError for codes > 32 bits (backend falls back to oracle).
    """
    entries = [(len(c), int(c, 2), s) for s, c in enumerate(codes) if c]
    if not entries:
        raise ValueError("all-empty code table is undecodable")
    if max(e[0] for e in entries) > 32:
        raise OverflowError("code length > 32 bits")
    rows = sorted((v << (32 - ln), ln, s) for ln, v, s in entries)
    n = len(rows)
    pc = np.zeros(256, np.uint32)
    lens = np.zeros(256, np.int64)
    syms = np.zeros(256, np.int64)
    pc[:n] = [r[0] for r in rows]
    lens[:n] = [r[1] for r in rows]
    syms[:n] = [r[2] for r in rows]
    dlen = np.diff(np.concatenate(([0], lens[:n])))
    dsym = np.diff(np.concatenate(([0], syms[:n])))
    dlen_p = np.zeros(256, np.int64)
    dsym_p = np.zeros(256, np.int64)
    dlen_p[:n] = dlen
    dsym_p[:n] = dsym
    dlen2d = dlen_p.reshape(16, 16)
    dsym2d = dsym_p.reshape(16, 16)
    plen = np.concatenate(([0], np.cumsum(dlen2d.sum(1))))[:16]
    psym = np.concatenate(([0], np.cumsum(dsym2d.sum(1))))[:16]
    return {
        "pc": pc,
        "pivots": pc[::16].copy(),
        "dlen2d": dlen2d.astype(np.int32),
        "plen": plen.astype(np.int32),
        "dsym2d": dsym2d.astype(np.int32),
        "psym": psym.astype(np.int32),
        "n_codes": np.int32(n),
    }


def stack_decode_tables(tables: list[dict]):
    return {k: np.stack([t[k] for t in tables]) for k in tables[0]}


def decode_tables_batch(lens: np.ndarray, vals: np.ndarray) -> dict:
    """Vectorized decode_tables_u32 over a batch: no per-block Python.

    lens (n, 256) uint8, vals (n, 256) uint64 left-aligned (CodeTables
    layout). Every row must have max code length <= 32 and at least one code
    (callers filter; violations would silently decode garbage, so asserted).
    Produces the same stacked dict as stack_decode_tables(map(
    decode_tables_u32, ...)).
    """
    n = lens.shape[0]
    present = lens > 0
    n_codes = present.sum(1).astype(np.int32)
    assert n == 0 or (int(lens.max()) <= 32 and int(n_codes.min()) >= 1)
    # Sort present codes ascending by left-aligned value (rank order);
    # absent symbols to the back (their vals are 0, so force the key up).
    key = np.where(present, vals, np.uint64(0xFFFFFFFFFFFFFFFF))
    order = np.argsort(key, axis=1, kind="stable")
    rank_in = (np.arange(256)[None, :] < n_codes[:, None])
    lens_s = np.where(rank_in, np.take_along_axis(lens, order, 1), 0) \
        .astype(np.int64)
    syms_s = np.where(rank_in, order, 0).astype(np.int64)
    vals_s = np.take_along_axis(vals, order, 1)
    pc = np.where(rank_in, (vals_s >> np.uint64(32)).astype(np.uint32),
                  np.uint32(0))

    def deltas_prefix(x):
        d = np.diff(x, axis=1, prepend=0)
        d = np.where(rank_in, d, 0)
        d2 = d.reshape(n, 16, 16).astype(np.int32)
        gs = d2.sum(2)
        pref = np.concatenate(
            [np.zeros((n, 1), np.int64), np.cumsum(gs, axis=1,
                                                   dtype=np.int64)],
            axis=1)[:, :16].astype(np.int32)
        return d2, pref

    dlen2d, plen = deltas_prefix(lens_s)
    dsym2d, psym = deltas_prefix(syms_s)
    return {
        "pc": pc,
        "pivots": np.ascontiguousarray(pc[:, ::16]),
        "dlen2d": dlen2d,
        "plen": plen,
        "dsym2d": dsym2d,
        "psym": psym,
        "n_codes": n_codes,
    }


# ---------------------------------------------------------------------------
# Device kernel
# ---------------------------------------------------------------------------

def _windows32(payload: jnp.ndarray) -> jnp.ndarray:
    """(B, P) uint8 -> (B, 8P) uint32 windows in PLANE-MAJOR slot order.

    Slot i = s*P + j holds the 32-bit window starting at bit 8j + s. The
    natural bit-position order would be a (B, P, 8)-stack-then-reshape, but
    a minor-most dim of 8 pads to 128 lanes under TPU tiling — a 16x HBM
    blowup (34 GB for a 64 MiB batch, observed OOM). Plane-major keeps P
    minor-most; all consumers translate slot <-> bit arithmetically.
    """
    b, p = payload.shape
    by = payload.astype(jnp.uint32)

    def sh(k):
        return jnp.pad(by[:, k:], ((0, 0), (0, k)))

    w32 = (by << 24) | (sh(1) << 16) | (sh(2) << 8) | sh(3)
    b4 = sh(4)
    outs = []
    for s in range(8):
        if s == 0:
            outs.append(w32)
        else:
            outs.append((w32 << s) | (b4 >> (8 - s)))
    # (B, 8, P): plane s = windows at bit offset s within each byte
    return jnp.stack(outs, axis=1).reshape(b, 8 * p)


def _rank_fields(w: jnp.ndarray, t: dict):
    """Window values (B, N) uint32 + tables -> (len (B,N) i32, sym (B,N) i32).

    Hierarchical rank: coarse group via 16 pivots, in-group thresholds via
    one-hot matmul (u16 halves keep f32 matmuls exact), then prefix-delta
    dot products give len/sym without any 256-entry gather.
    """
    b, n = w.shape
    grp_ids = jnp.arange(N_GROUPS, dtype=jnp.int32)
    n_codes = t["n_codes"][:, None]  # (B,1)

    ge_piv = (w[..., None] >= t["pivots"][:, None, :]) \
        & (grp_ids * GROUP < n_codes)[:, None, :]
    c1 = ge_piv.sum(-1).astype(jnp.int32) - 1  # (B, N) group index

    oh = (c1[..., None] == grp_ids).astype(jnp.float32)  # (B, N, 16)

    def fetch16(tab2d_f32):  # (B,16,16) f32 -> (B,N,16) rows by group
        # HIGHEST: TPU's default f32 matmul rounds through bf16, which
        # corrupts the 16-bit table halves (values up to 65535).
        return jax.lax.dot_general(
            oh, tab2d_f32.astype(jnp.float32),
            (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    pc2d = t["pc"].reshape(b, 16, 16)
    row_hi = fetch16((pc2d >> 16).astype(jnp.float32))
    row_lo = fetch16((pc2d & 0xFFFF).astype(jnp.float32))
    rows = (row_hi.astype(jnp.uint32) << 16) | row_lo.astype(jnp.uint32)

    in_grp = jnp.arange(GROUP, dtype=jnp.int32)
    gidx = c1[..., None] * GROUP + in_grp
    ge_row = ((w[..., None] >= rows) & (gidx < n_codes[..., None])) \
        .astype(jnp.float32)

    def prefix_delta(d2d, pref):
        part = jnp.sum(ge_row * fetch16(d2d.astype(jnp.float32)), axis=-1)
        full = jnp.sum(oh.astype(jnp.float32)
                       * pref[:, None, :].astype(jnp.float32), axis=-1)
        return (part + full).astype(jnp.int32)

    ln = prefix_delta(t["dlen2d"], t["plen"])
    sym = prefix_delta(t["dsym2d"], t["psym"])
    return ln, sym


#: stage1 byte-chunk width: bounds the (B, 8*chunk, 16) one-hot temporaries
#: of the hierarchical rank. Unchunked, a (4, 8 MiB) batch materializes a
#: 16 GB one-hot and OOMs the 16 GB HBM (observed on v5e); at 2^18 bytes
#: the peak temp is ~(B * 2^21 * 16 * 4) bytes per buffer.
STAGE1_CHUNK = 1 << 18


def decode_stage1(payload: jnp.ndarray, tables: dict):
    """Window construction + per-bit-position rank: (len, sym) per bit.

    Chunked over byte positions with lax.map so the rank's one-hot
    temporaries stay bounded (see STAGE1_CHUNK); each chunk rebuilds its
    windows from a 4-byte-halo payload slice. Output stays in _windows32's
    plane-major slot order. Separate compile unit from the chain stage (see
    pack_stage1 for the XLA fusion compile-time pathology this avoids)."""
    b, p = payload.shape
    cj = min(STAGE1_CHUNK, p)
    n_chunks = p // cj
    if n_chunks <= 1:
        return _rank_fields(_windows32(payload), tables)
    padded = jnp.pad(payload, ((0, 0), (0, 4)))

    def chunk_fn(c):
        seg = jax.lax.dynamic_slice(padded, (0, c * cj), (b, cj + 4))
        w = _windows32_halo(seg, cj)         # (B, 8*cj) plane-major
        ln, sym = _rank_fields(w, tables)
        return ln.reshape(b, 8, cj), sym.reshape(b, 8, cj)

    ln, sym = jax.lax.map(chunk_fn, jnp.arange(n_chunks, dtype=jnp.int32))
    # (nch, B, 8, cj) -> (B, 8, nch, cj) -> (B, 8P) plane-major
    ln = ln.transpose(1, 2, 0, 3).reshape(b, 8 * p)
    sym = sym.transpose(1, 2, 0, 3).reshape(b, 8 * p)
    return ln, sym


def _windows32_halo(seg: jnp.ndarray, cj: int) -> jnp.ndarray:
    """Windows for the first cj bytes of a (B, cj+4) slice (4-byte halo)."""
    b = seg.shape[0]
    by = seg.astype(jnp.uint32)

    def sh(k):
        return by[:, k:k + cj]

    w32 = (sh(0) << 24) | (sh(1) << 16) | (sh(2) << 8) | sh(3)
    b4 = sh(4)
    outs = []
    for s in range(8):
        outs.append(w32 if s == 0 else (w32 << s) | (b4 >> (8 - s)))
    return jnp.stack(outs, axis=1).reshape(b, 8 * cj)


def decode_stage2(ln: jnp.ndarray, sym: jnp.ndarray,
                  payload_lens: jnp.ndarray, out_counts: jnp.ndarray,
                  out_p: int):
    """Symbol chain (pointer doubling) + emission by known output count.

    ln/sym are in _windows32's plane-major slot order (slot s*P + j <-> bit
    8j + s); the chain jumps in bit space but stores/gathers in slot space —
    the translation is integer arithmetic on a power-of-two P.
    """
    b, nslots = ln.shape  # nslots == total bit count
    p = nslots // 8
    n_valid_bits = payload_lens * 8
    slot = jax.lax.broadcasted_iota(jnp.int32, (b, nslots), 1)
    bit = 8 * (slot % p) + slot // p
    nbit = bit + ln  # next symbol's bit position
    nslot = jnp.where(nbit < nslots, (nbit % 8) * p + nbit // 8, nslots)
    base = (jnp.arange(b, dtype=jnp.int32) * (nslots + 1))[:, None]
    jump_flat = jnp.concatenate([base + nslot, base + nslots], axis=1).ravel()

    posn = base  # (B,1) local slot 0 == bit 0
    stride = jump_flat
    m = 1
    while m < out_p:
        posn = jnp.concatenate([posn, stride[posn]], axis=1)
        stride = stride[stride]
        m *= 2
    posn = posn[:, :out_p] - base  # local slots, nslots == absorbed

    k = jax.lax.broadcasted_iota(jnp.int32, (b, out_p), 1)
    pos_bit = jnp.where(posn < nslots, 8 * (posn % p) + posn // p, nslots)
    ok = (k < out_counts[:, None]) & (pos_bit < n_valid_bits[:, None])
    flat_sym = ((jnp.arange(b, dtype=jnp.int32) * nslots)[:, None]
                + jnp.minimum(posn, nslots - 1)).ravel()
    out = jnp.where(ok, sym.ravel()[flat_sym].reshape(b, out_p), 0)
    # error flag: requested more symbols than the stream contains
    underrun = jnp.any((k < out_counts[:, None]) & ~ok, axis=1)
    return out.astype(jnp.uint8), underrun


# ---------------------------------------------------------------------------
# Stage 2 v2: FSM scan + Pallas emission (the TPU production chain stage)
# ---------------------------------------------------------------------------
#
# The pointer-doubling stage2 above runs on XLA gathers, which serialize on
# real TPU (~35 Melem/s measured on v5e — 45 s for a (2, 8 MiB) batch). The
# v2 formulation has no gathers at all:
#
#   * the bit chain is a finite-state machine over BYTES: the state before
#     byte j is "bits until the next symbol boundary" in [0, S) with
#     S >= max code length; each byte's transition function (an S-vector of
#     next-states) is built elementwise from the 8 per-bit code lengths of
#     stage1 (8 unrolled countdown/reload rounds);
#   * transitions compose associatively, so jax.lax.associative_scan
#     resolves the whole history in log2(P) ELEMENTWISE rounds;
#   * per byte, entry state -> up to 8 ordered boundary symbols (8 more
#     elementwise replay rounds), packed into two <=32-bit lanes per byte;
#   * the Pallas emission kernel (emit_pallas.emit_bits_rows) concatenates
#     the per-byte symbol packs into the decoded rows — termination by
#     known output count (d.c:530) via an ordinal clip on the pack lengths.


def _fsm_tables(ln8: jnp.ndarray, s_states: int) -> jnp.ndarray:
    """Per-byte FSM transitions f (S, B, P) int8 from per-bit lens.

    ln8 (B, 8, P) int8: plane q = code length at bit 8j+q. f[s, b, j] =
    state after consuming byte j entering with state s. 8 countdown/reload
    rounds; garbage lens (padding bits) are clamped into range — only the
    true chain's states matter downstream."""
    b, _, p = ln8.shape
    q = jnp.broadcast_to(
        jnp.arange(s_states, dtype=jnp.int8)[:, None, None], (s_states, b, p))
    planes = [ln8[:, k, :].astype(jnp.int8) for k in range(8)]
    for _ in range(8):
        ln_at = jnp.zeros_like(q)
        for k in range(8):
            ln_at = jnp.where(q == k, jnp.maximum(planes[k], 1), ln_at)
        q = jnp.where(q < 8, q + ln_at, q)
    return jnp.clip(q - 8, 0, s_states - 1).astype(jnp.int8)


#: FSM chunk width (bytes): the associative_scan unrolls log2(chunk) select
#: levels in the compile graph. Scanning the FULL row instead (log2(8 Mi) =
#: 23 levels over (S, B, P) operands) OOM-kills the TPU compiler at
#: (8, 8 MiB) batches; a lax.scan over chunks keeps the graph bounded while
#: each step stays wide enough to saturate the VPU.
FSM_CHUNK = 1 << 16


def _fsm_entries(f: jnp.ndarray) -> jnp.ndarray:
    """Entry state BEFORE each byte, (B, P) int32, stream starting at 0.

    f (S, B, P) int8: per-byte transition vectors. lax.scan over FSM_CHUNK
    chunks; the carry is each row's entry state (a scalar per row — only
    the orbit of state 0 is ever needed), resolved inside each chunk by an
    associative composition scan."""
    s_states, b, p = f.shape
    c = min(FSM_CHUNK, p)
    nch = p // c
    fc = f.reshape(s_states, b, nch, c).transpose(2, 0, 1, 3)

    def compose(a, g):
        out = jnp.zeros_like(a)
        for t in range(s_states):
            out = jnp.where(a == t, g[t][None], out)
        return out

    def apply(fn, state):  # fn (S, B, C) or (S, B); state (B,) -> like fn[0]
        out = jnp.zeros_like(fn[0])
        st = state.reshape((b,) + (1,) * (fn.ndim - 2))
        for t in range(s_states):
            out = jnp.where(st == t, fn[t], out)
        return out

    ident = jnp.broadcast_to(
        jnp.arange(s_states, dtype=f.dtype)[:, None, None], (s_states, b, 1))

    def step(carry, fk):  # carry (B,) int32; fk (S, B, C)
        loc = jax.lax.associative_scan(compose, fk, axis=2)  # inclusive
        excl = jnp.concatenate([ident, loc[:, :, :-1]], axis=2)
        entry = apply(excl, carry).astype(jnp.int32)         # (B, C)
        new_carry = apply(loc[:, :, -1], carry).astype(jnp.int32)
        return new_carry, entry

    carry0 = jnp.zeros((b,), jnp.int32)
    _, entries = jax.lax.scan(step, carry0, fc)
    return entries.transpose(1, 0, 2).reshape(b, p)


def decode_stage2_scan(ln: jnp.ndarray, sym: jnp.ndarray,
                       payload_lens: jnp.ndarray, out_counts: jnp.ndarray,
                       stride_words: int, s_states: int,
                       interpret: bool = False):
    """FSM-scan chain + Pallas emission: ((B, 4*stride_words) u8, underrun).

    ln/sym in stage1's plane-major slot order; s_states static >= the
    batch's max code length (callers pick 8/16/32 and route longer codes to
    the oracle). Row r's decoded bytes are out[r, :out_counts[r]]; bytes
    past that are unspecified."""
    from .emit_pallas import emit_bits_rows
    b, nslots = ln.shape
    p = nslots // 8
    ln8 = ln.reshape(b, 8, p).astype(jnp.int8)
    sym8 = sym.reshape(b, 8, p)

    f = _fsm_tables(ln8, s_states)
    entry = _fsm_entries(f)

    # replay boundaries within each byte (ordered by round)
    planes_ln = [ln8[:, k, :].astype(jnp.int32) for k in range(8)]
    planes_sym = [sym8[:, k, :] for k in range(8)]
    q = entry
    syms = []
    for _ in range(8):
        is_b = q < 8
        s_at = jnp.zeros_like(q)
        l_at = jnp.ones_like(q)
        for k in range(8):
            hit = q == k
            s_at = jnp.where(hit, planes_sym[k], s_at)
            l_at = jnp.where(hit, jnp.maximum(planes_ln[k], 1), l_at)
        syms.append((is_b, s_at))
        q = jnp.where(is_b, q + l_at, q)
    nb = sum(m.astype(jnp.int32) for m, _ in syms)

    # output-count clip: allowed symbols for byte j given row's out_count
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, p), 1)
    in_payload = pos < payload_lens[:, None]
    nb = jnp.where(in_payload, nb, 0)
    cum = jnp.cumsum(nb, axis=1)
    before = cum - nb
    allowed = jnp.clip(out_counts[:, None] - before, 0, nb)
    underrun = cum[:, -1] < out_counts

    def pack4(slots, base):
        val = jnp.zeros((b, p), jnp.uint32)
        for i in range(4):
            if base + i < len(slots):
                _, s_at = slots[base + i]
                val = val | (s_at.astype(jnp.uint32) << (24 - 8 * i))
        n = jnp.clip(allowed - base, 0, 4)
        bits = 8 * n
        mask = jnp.where(n > 0,
                         (~jnp.uint32(0)) << (32 - bits).astype(jnp.uint32),
                         jnp.uint32(0))
        return val & mask, bits

    val1, len1 = pack4(syms, 0)
    val2, len2 = pack4(syms, 4)

    # interleave to (B, 2P) byte-lane order: lane 2j = first 4 syms of
    # byte j, lane 2j+1 = the rest. Built with interior-padded lax.pad —
    # a stack(axis=2).reshape materializes a (B, P, 2) array whose minor
    # dim tiles 2 -> 128 on TPU (64x HBM blowup: 32 GiB at (8, 8 MiB),
    # observed compile-time OOM).
    def interleave(a, c):
        da = jax.lax.pad(a, jnp.zeros((), a.dtype), ((0, 0, 0), (0, 1, 1)))
        dc = jax.lax.pad(c, jnp.zeros((), c.dtype), ((0, 0, 0), (1, 0, 1)))
        return da | dc

    vals = interleave(val1, val2)
    lens = interleave(len1, len2)
    rows = emit_bits_rows(vals, lens, 2 * payload_lens, stride_words,
                          interpret=interpret)
    return rows, underrun


_stage2_scan_jit = jax.jit(
    decode_stage2_scan,
    static_argnames=("stride_words", "s_states", "interpret"))


_stage1_jit = jax.jit(decode_stage1)
_stage2_jit = jax.jit(decode_stage2, static_argnames=("out_p",))


def decode_batch(payload: jnp.ndarray, payload_lens: jnp.ndarray,
                 tables: dict, out_counts: jnp.ndarray, out_p: int,
                 max_len: int = 32):
    """(B, P) packed payloads -> ((B, out_p) uint8 symbols, underrun).

    out_p: static padded output size (>= max out_counts in the batch).
    Positions past out_counts are unspecified on the TPU path (zero on the
    XLA path) — termination is by count, like the reference (d.c:530).
    max_len: the batch's max code bit length (picks the FSM state count on
    the TPU path). Platform dispatch like the encode kernels: FSM scan +
    Pallas emission on TPU, pointer-doubling gathers elsewhere."""
    from .dispatch import pallas_interpret, use_pallas_emit
    ln, sym = _stage1_jit(payload, tables)
    if use_pallas_emit():
        s_states = 8 if max_len <= 8 else (16 if max_len <= 16 else 32)
        stride_bytes = max(out_p, 512)
        rows, under = _stage2_scan_jit(
            ln, sym, payload_lens, out_counts,
            stride_words=stride_bytes // 4, s_states=s_states,
            interpret=pallas_interpret())
        return rows[:, :out_p], under
    return _stage2_jit(ln, sym, payload_lens, out_counts, out_p=out_p)


def decode_batch_fused(payload, payload_lens, tables, out_counts, out_p):
    """Single-graph composite for shard_map on CPU meshes (one callee)."""
    ln, sym = decode_stage1(payload, tables)
    return decode_stage2(ln, sym, payload_lens, out_counts, out_p)
