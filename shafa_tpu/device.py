"""JAX device backend: block batching, padding, kernel dispatch, fallbacks.

Blocks of a file share one size (except the last), so a file's blocks stack
into a (B, P) array: B is the data-parallel axis — the TPU replacement for
the reference's thread-per-block pipeline (multithread.c:126-194). P is
padded per jit-bucket and B per power-of-two row bucket, so compile shapes
are bounded regardless of file size; true lengths mask all padding.

Two dispatch tiers:

  * the legacy per-stage methods (rle_encode/histogram/pack/unpack/
    rle_expand) move full padded buffers host<->device per stage — simple,
    used by tests and the sharded (mesh) path;
  * the fused_* methods keep intermediate streams DEVICE-RESIDENT across
    the F->C (and D: unpack->expand) chains and download only compacted
    exact-size byte streams (kernels/ops.compact_rows).  Through a thin
    host->TPU link the padded transfers dominate end-to-end time, so this
    is the difference between ~MB/s and ~HBM-bound throughput.

Fallback policy: blocks whose code tables exceed the 32-bit kernel width
(pathological skew) or whose packed size could overflow int32 bit offsets
route to the numpy oracle — bit-exactness is never at risk from the fast
path's static bounds.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from . import oracle
from .errors import FileUnrecognizableError
from .kernels import decode as kdecode
from .kernels import histogram as khist
from .kernels import ops as kops
from .kernels import pack as kpack
from .kernels import rle as krle

#: Max elements per (B, P) device batch — bounds peak HBM across the int32
#: intermediates of the analysis scans. History: (8, 8 MiB) batches
#: reproducibly faulted v5e (UNAVAILABLE) inside the *gather* emission's
#: ~20x int32 intermediates; the Pallas emission path (emit_pallas.py) has
#: none of those (its working set is the 2-page VMEM accumulator), so the
#: cap is restored to 1<<26 — verified on-chip at (8, 8 MiB) by bench.py.
#: Env override exists for tests that force many small batches.
MAX_BATCH_ELEMS = int(os.environ.get("SHAFA_MAX_BATCH_ELEMS", 1 << 26))

#: Compacted downloads are padded to a multiple of this (few static shapes
#: for the compact kernel, <=4 MiB slack per transfer).
DOWNLOAD_BUCKET = 4 << 20


def _bucket(n: int, minimum: int = 256) -> int:
    """Next power-of-two bucket (static shapes => bounded recompiles)."""
    b = minimum
    while b < n:
        b *= 2
    return b


def _row_bucket(n: int, cap: int) -> int:
    """Pad a row count to a power of two, capped (bounds compile shapes)."""
    return min(_bucket(max(n, 1), minimum=1), max(cap, 1))


def _dl_bucket(n: int) -> int:
    return max(DOWNLOAD_BUCKET,
               -(-max(n, 1) // DOWNLOAD_BUCKET) * DOWNLOAD_BUCKET)


def _kraft_complete(lens: np.ndarray) -> np.ndarray:
    """(n, 256) code bit lengths -> (n,) bool: Kraft sum exactly 1.

    The rank decoder (kernels/decode.py) ASSUMES a complete code set: every
    window falls in exactly one code interval. Self-produced multi-symbol
    tables are complete by construction (the split tree is full), but a
    hand-edited .cod with gaps would decode silently wrong there — the
    reference's trie walk fails loudly instead (NULL child, d.c:534).
    Incomplete rows are routed to the trie-semantics oracle (slow_unpack)."""
    ln = lens.astype(np.int64)
    present = ln > 0
    terms = np.where(present & (ln <= 32),
                     np.int64(1) << (32 - np.clip(ln, 1, 32)), 0)
    return (terms.sum(axis=1) == (np.int64(1) << 32)) \
        & (ln.max(axis=1, initial=0) <= 32)


def _slow_decode(payload, code_strings, out_count, expand: bool):
    """Reference-trie-semantics decode for oracle-routed rows: fails loudly
    on code-gap/underrun like the reference (d.c:534) instead of the rank
    formulation's silent mis-decode."""
    try:
        dec = np.frombuffer(oracle.slow_unpack(payload, code_strings,
                                               out_count), np.uint8)
    except ValueError as e:
        raise FileUnrecognizableError(str(e)) from e
    return oracle.rle_expand(dec) if expand else dec


def _stack_blocks(blocks, b_rows: int | None = None, minimum: int = 256):
    """list of 1-D uint8 -> (B, P) padded + (B,) lengths (host-side).

    b_rows pads the row count (extra rows have length 0 — every kernel
    masks by true length, so they produce empty outputs).
    """
    lens_l = [b.size for b in blocks]
    p = _bucket(max(lens_l) if blocks else 1, minimum=minimum)
    rows = b_rows if b_rows is not None else len(blocks)
    out = np.zeros((rows, p), dtype=np.uint8)
    lens = np.zeros(rows, dtype=np.int32)
    for i, b in enumerate(blocks):
        out[i, : b.size] = b
        lens[i] = b.size
    return out, lens


def _batches(n_blocks: int, p: int):
    bsz = max(1, MAX_BATCH_ELEMS // max(p, 1))
    for lo in range(0, n_blocks, bsz):
        yield lo, min(lo + bsz, n_blocks)


# ---------------------------------------------------------------------------
# Fused jit steps (single-device path)
# ---------------------------------------------------------------------------

# NOTE on jit granularity: rle/histogram/pack-stage/decode-stage/compact run
# as SEPARATE jit programs, chained through device-resident arrays. Fusing
# them into one XLA program looks natural but is a compile-time trap on TPU:
# a single program combining the MXU LUT matmuls with the scatter emission
# (or one giant einsum over ~2^27 elements) takes 100-400+ s to compile,
# while the same math as chained ~4 Mi-chunk programs compiles in seconds
# with identical warm runtime (measured on v5e; see kernels/pack.py).

@functools.cache
def _compact_step():
    import jax
    return jax.jit(kops.compact_rows, static_argnames="out_sz")


def _f_encode_step():
    def step(x, lens):
        enc, enc_len = krle.rle_encode_batch(x, lens)  # jit #1
        hist = khist.histogram_batch(enc, enc_len)     # jit #2 (fori_loop)
        return enc, enc_len, hist
    return step


def _hist_step():
    return khist.histogram_batch


def _pack_step():
    return kpack.pack_batch_compact  # dispatches its jit stages itself


def _decode_step():
    return kdecode.decode_batch  # dispatches its two jit stages itself


def _expand_sizes_step():
    return krle.rle_expand_sizes


def _expand_step():
    return krle.rle_expand_batch


def _split_rows(flat: np.ndarray, sizes) -> list[np.ndarray]:
    """Split a compacted flat buffer back into per-row views (no copies)."""
    out = []
    pos = 0
    for s in sizes:
        out.append(flat[pos:pos + int(s)])
        pos += int(s)
    return out


class _EncodeHandle:
    """Device-resident state of a fused encode: per-batch arrays + row map."""

    def __init__(self):
        self.batches = []  # dicts: x, lens, enc, enc_len, n (true rows)

    @property
    def n_blocks(self):
        return sum(b["n"] for b in self.batches)


class JaxBackend:
    """Device implementation of the pipeline Backend protocol.

    With ``mesh=None`` kernels run single-device. With a mesh (dist.block_mesh)
    every kernel shard_maps its block axis over the mesh — the multi-chip path
    (SURVEY.md §5.8); results come back in block order, so outputs are
    byte-identical regardless of device count.
    """

    def __init__(self, mesh=None, sequential=False):
        if mesh is not None:
            from .dist import ShardedKernels
            self._sk = ShardedKernels(mesh)
        else:
            self._sk = None
        #: --no-multithread analogue: one block per device batch — the
        #: sequential oracle for the batched path (reference shafa.c:55-56;
        #: SURVEY.md §4 'Distributed level').
        self.sequential = bool(sequential)

    def _batches_for(self, n_blocks: int, p: int):
        if self.sequential:
            return ((i, i + 1) for i in range(n_blocks))
        return _batches(n_blocks, p)

    # -- kernel dispatch (single-device or sharded) -------------------------

    def _k_rle_encode(self, x, lens):
        if self._sk:
            return self._sk.rle_encode(x, lens)
        enc, n = krle.rle_encode_batch(x, lens)
        return np.asarray(enc), np.asarray(n)

    def _k_histogram(self, x, lens):
        if self._sk:
            return self._sk.histogram(x, lens)
        return np.asarray(khist.histogram_batch(x, lens))

    def _k_pack(self, x, lens, cl, cv):
        if self._sk:
            return self._sk.pack(x, lens, cl, cv)
        packed, plen = kpack.pack_batch(x, lens, cl, cv)
        return np.asarray(packed), np.asarray(plen)

    def _k_decode(self, payload, plens, tables, counts, out_p, max_len=32):
        if self._sk:
            return self._sk.decode(payload, plens, tables, counts, out_p)
        out, under = kdecode.decode_batch(payload, plens, tables, counts,
                                          out_p, max_len=max_len)
        return np.asarray(out), np.asarray(under)

    def _k_expand_sizes(self, x, lens):
        if self._sk:
            return self._sk.expand_sizes(x, lens)
        return np.asarray(krle.rle_expand_sizes(x, lens))

    def _k_expand(self, x, lens, out_p):
        if self._sk:
            return self._sk.expand(x, lens, out_p)
        out, n = krle.rle_expand_batch(x, lens, out_p)
        return np.asarray(out), np.asarray(n)

    # -- Backend protocol (per-stage; padded transfers) ---------------------

    def rle_encode(self, blocks):
        if not blocks:
            return []
        out = []
        stacked, lens = _stack_blocks(blocks)
        for lo, hi in self._batches_for(len(blocks), stacked.shape[1]):
            enc, out_len = self._k_rle_encode(stacked[lo:hi], lens[lo:hi])
            out.extend(enc[i, : out_len[i]] for i in range(hi - lo))
        return out

    def histogram(self, blocks):
        if not blocks:
            return []
        stacked, lens = _stack_blocks(blocks)
        out = []
        for lo, hi in self._batches_for(len(blocks), stacked.shape[1]):
            h = self._k_histogram(stacked[lo:hi], lens[lo:hi])
            out.extend(np.asarray(h).astype(np.int64))
        return out

    def pack(self, blocks, tables):
        """blocks + codes.CodeTables (row i = block i's table) -> payloads."""
        if not blocks:
            return []
        results: list[bytes | None] = [None] * len(blocks)
        maxlen = tables.lens.max(axis=1)
        fast_idx = []
        for i, blk in enumerate(blocks):
            if i in tables.overflow:
                results[i] = oracle.slow_pack(blk.tobytes(),
                                              tables.row_strings(i))
            elif maxlen[i] > 32 or int(maxlen[i]) * blk.size >= (1 << 31) - 64:
                # 32-bit kernel LUT width / int32 bit-offset overflow: oracle
                results[i] = oracle.pack(blk, tables.lens[i], tables.vals[i])
            else:
                fast_idx.append(i)
        if fast_idx:
            from .kernels import emit_pallas as kemit
            from .kernels.dispatch import use_pallas_emit
            pallas = use_pallas_emit() and self._sk is None
            stacked, lens = _stack_blocks([blocks[i] for i in fast_idx])
            lens_arr = tables.lens[fast_idx].astype(np.int32)
            vals_arr = (tables.vals[fast_idx] >> np.uint64(32)) \
                .astype(np.uint32)
            for lo, hi in self._batches_for(len(fast_idx), stacked.shape[1]):
                if pallas:
                    # exact packed sizes via a device histogram + host dot
                    hist = np.asarray(khist.histogram_batch(
                        stacked[lo:hi], lens[lo:hi]))
                    byte_lens = kpack.pack_byte_lens(hist, lens_arr[lo:hi])
                    woff, need = kemit.aligned_offsets(byte_lens)
                    out_words = _dl_bucket(4 * need) // 4
                    flat = kpack.pack_batch_pallas(
                        stacked[lo:hi], lens[lo:hi], lens_arr[lo:hi],
                        vals_arr[lo:hi], out_words, woff)
                    buf = np.asarray(flat).ravel().view(np.uint8)
                    for j in range(hi - lo):
                        o = 4 * int(woff[j])
                        results[fast_idx[lo + j]] = \
                            buf[o:o + int(byte_lens[j])].tobytes()
                else:
                    packed, plen = self._k_pack(
                        stacked[lo:hi], lens[lo:hi],
                        lens_arr[lo:hi], vals_arr[lo:hi])
                    for j in range(hi - lo):
                        results[fast_idx[lo + j]] = \
                            packed[j, : plen[j]].tobytes()
        return results

    def unpack(self, payloads, tables, out_counts):
        if not payloads:
            return []
        results: list[np.ndarray | None] = [None] * len(payloads)
        maxlen = tables.lens.max(axis=1)
        n_codes = (tables.lens > 0).sum(axis=1)
        complete = _kraft_complete(tables.lens)
        fast_idx = []
        for i in range(len(payloads)):
            if i in tables.overflow or maxlen[i] > 32 or n_codes[i] == 0:
                results[i] = oracle.unpack(payloads[i], tables.row_strings(i),
                                           out_counts[i])
            elif not complete[i]:  # foreign .cod with gaps: trie semantics
                results[i] = _slow_decode(payloads[i], tables.row_strings(i),
                                          out_counts[i], expand=False)
            else:
                fast_idx.append(i)
        if fast_idx:
            blocks = [np.frombuffer(payloads[i], np.uint8) for i in fast_idx]
            stacked, plens = _stack_blocks(blocks)
            counts = np.array([out_counts[i] for i in fast_idx], np.int32)
            tab = kdecode.decode_tables_batch(tables.lens[fast_idx],
                                              tables.vals[fast_idx])
            out_p = _bucket(int(counts.max()))
            ml = int(maxlen[fast_idx].max())
            for lo, hi in self._batches_for(len(fast_idx), stacked.shape[1] * 8):
                sub_tab = {k: v[lo:hi] for k, v in tab.items()}
                out, underrun = self._k_decode(
                    stacked[lo:hi], plens[lo:hi], sub_tab,
                    counts[lo:hi], out_p, max_len=ml)
                if bool(underrun.any()):
                    raise FileUnrecognizableError("compressed stream exhausted early")
                for j in range(hi - lo):
                    i = fast_idx[lo + j]
                    results[i] = out[j, : out_counts[i]]
        return results

    def rle_expand(self, blocks):
        if not blocks:
            return []
        stacked, lens = _stack_blocks(blocks)
        sizes = self._k_expand_sizes(stacked, lens)
        out_p = _bucket(int(sizes.max()) if sizes.size else 1)
        out = []
        for lo, hi in self._batches_for(len(blocks), max(stacked.shape[1], out_p)):
            ex, ex_len = self._k_expand(stacked[lo:hi], lens[lo:hi], out_p)
            out.extend(ex[i, : ex_len[i]] for i in range(hi - lo))
        return out

    # -- fused device-resident paths (pipeline fast path) --------------------

    @property
    def supports_fused(self) -> bool:
        return not self.sequential

    def _fused_rows(self, n: int, bsz: int) -> int:
        """Row bucket for a fused batch; on a mesh, also a multiple of the
        device count (shard_map requires B % n_devices == 0)."""
        rows = _row_bucket(n, bsz)
        if self._sk and rows % self._sk.n_devices:
            rows = -(-rows // self._sk.n_devices) * self._sk.n_devices
        return rows

    def fused_encode(self, blocks) -> _EncodeHandle:
        """Upload blocks once; run RLE + histogram-of-RLE on device.

        Raw and RLE streams stay device-resident for fused_pack; only the
        (B,) RLE lengths and (B, 256) histograms come to host. With a mesh,
        both kernels shard_map the block axis (dist.ShardedKernels) and the
        streams stay sharded across devices.
        """
        import jax.numpy as jnp
        h = _EncodeHandle()
        if not blocks:
            return h
        p = _bucket(max(b.size for b in blocks))
        bsz = max(1, MAX_BATCH_ELEMS // p)
        step = _f_encode_step()
        for lo in range(0, len(blocks), bsz):
            rows = blocks[lo:lo + bsz]
            stacked, lens = _stack_blocks(rows, self._fused_rows(len(rows),
                                                                 bsz))
            x = jnp.asarray(stacked)
            ld = jnp.asarray(lens)
            if self._sk:
                enc, enc_len = self._sk.rle_encode_dev(x, ld)
                hist = self._sk.histogram_dev(enc, enc_len)
            else:
                enc, enc_len, hist = step(x, ld)
            h.batches.append(dict(x=x, lens=lens, enc=enc, enc_len=enc_len,
                                  hist=hist, n=len(rows)))
        return h

    def fused_rle_hists(self, h: _EncodeHandle):
        """(n_blocks, 256) int64 histograms of the RLE streams."""
        return np.concatenate(
            [np.asarray(b["hist"])[: b["n"]] for b in h.batches]
        ).astype(np.int64) if h.batches else np.zeros((0, 256), np.int64)

    def fused_raw_hists(self, h: _EncodeHandle):
        """Histograms of the RAW blocks (N mode / -c f), device-resident.

        Cached per batch: the Pallas pack path reuses them to compute exact
        packed byte lengths (kernels/pack.pack_byte_lens)."""
        step = (self._sk.histogram_dev if self._sk else _hist_step())
        for b in h.batches:
            if "raw_hist" not in b:
                b["raw_hist"] = np.asarray(step(b["x"], np.asarray(b["lens"])))
        return np.concatenate(
            [b["raw_hist"][: b["n"]] for b in h.batches]
        ).astype(np.int64) if h.batches else np.zeros((0, 256), np.int64)

    def fused_rle_sizes(self, h: _EncodeHandle) -> np.ndarray:
        return np.concatenate(
            [np.asarray(b["enc_len"])[: b["n"]] for b in h.batches]
        ).astype(np.int64) if h.batches else np.zeros(0, np.int64)

    def fused_rle_bytes(self, h: _EncodeHandle) -> np.ndarray:
        """All RLE streams concatenated in block order (exact bytes)."""
        compact = _compact_step()
        parts = []
        for b in h.batches:
            lens = np.asarray(b["enc_len"]).copy()
            lens[b["n"]:] = 0
            total = int(lens.sum())
            flat = compact(b["enc"], lens, out_sz=_dl_bucket(total))
            parts.append(np.asarray(flat)[:total])
        return (np.concatenate(parts) if parts else
                np.zeros(0, np.uint8))

    def fused_pack(self, h: _EncodeHandle, tables, use_rle: bool,
                   host_row) -> list[bytes]:
        """Bit-pack the device-resident streams (RLE or raw) with per-block
        code tables; downloads one compacted buffer per batch.

        On TPU the emission is the Pallas kernel (kernels/emit_pallas.py,
        emit_coded: in-kernel 256-entry LUT + bit concatenation — the
        replacement for the reference's pre-shifted-table OR loop,
        c.c:91-237 + 52-83); exact per-row byte lengths come for free from
        the stream histograms (pack_byte_lens), and the host slices each
        row out of one aligned flat download. Elsewhere: the XLA gather
        emission (pack_batch_compact).

        host_row(i) -> np.uint8 row i's stream bytes, used only for the rare
        oracle-fallback rows (>32-bit codes / offset overflow).
        """
        from .kernels import emit_pallas as kemit
        from .kernels.dispatch import use_pallas_emit
        n_total = h.n_blocks
        results: list[bytes | None] = [None] * n_total
        maxlen = tables.lens.max(axis=1)
        pallas = use_pallas_emit()
        pack = _pack_step()
        base = 0
        for b in h.batches:
            n = b["n"]
            src = b["enc"] if use_rle else b["x"]
            src_len = (np.asarray(b["enc_len"]) if use_rle
                       else np.asarray(b["lens"])).copy()
            src_len[n:] = 0
            fallback = []
            for j in range(n):
                i = base + j
                if (i in tables.overflow or maxlen[i] > 32
                        or int(maxlen[i]) * int(src_len[j])
                        >= (1 << 31) - 64):
                    fallback.append(i)
                    src_len[j] = 0  # mask out of the kernel pass
            rows = b["lens"].shape[0]  # already row-bucketed by fused_encode
            cl = np.zeros((rows, 256), np.int32)
            cv = np.zeros((rows, 256), np.uint32)
            sel = [base + j for j in range(n)]
            cl[:n] = tables.lens[sel].astype(np.int32)
            cv[:n] = (tables.vals[sel] >> np.uint64(32)).astype(np.uint32)
            np.clip(cl, 0, 32, out=cl)
            if self._sk:
                # Mesh: per-shard production emission + PER-SHARD
                # compaction — the download is ~payload-sized (exact bytes
                # back-to-back per shard), like single-device compaction.
                if use_rle:
                    hist = np.asarray(b["hist"])
                else:
                    self.fused_raw_hists(h)  # ensure cached
                    hist = b["raw_hist"]
                byte_lens = kpack.pack_byte_lens(hist, cl)
                byte_lens[n:] = 0
                for i in fallback:
                    byte_lens[i - base] = 0
                d = self._sk.n_devices
                rows_d = rows // d
                shard_totals = byte_lens.reshape(d, rows_d).sum(axis=1)
                bound = -(-max(int(shard_totals.max()), 1) // 65536) * 65536
                flat, _ = self._sk.pack_compact_dev(src, src_len, cl, cv,
                                                    bound)
                buf = np.asarray(flat).reshape(d, bound)
                for j in range(n):
                    if base + j not in fallback:
                        sd = j // rows_d
                        o = int(byte_lens[sd * rows_d: j].sum())
                        results[base + j] = \
                            buf[sd, o:o + int(byte_lens[j])].tobytes()
            elif pallas:
                if use_rle:
                    hist = np.asarray(b["hist"])
                else:
                    self.fused_raw_hists(h)  # ensure cached
                    hist = b["raw_hist"]
                byte_lens = kpack.pack_byte_lens(hist, cl)
                byte_lens[n:] = 0
                for i in fallback:
                    byte_lens[i - base] = 0
                woff, need = kemit.aligned_offsets(byte_lens)
                out_words = _dl_bucket(4 * need) // 4
                flat = kpack.pack_batch_pallas(
                    src, src_len, cl, cv, out_words, woff)
                buf = np.asarray(flat).ravel().view(np.uint8)
                for j in range(n):
                    if base + j not in fallback:
                        o = 4 * int(woff[j])
                        results[base + j] = \
                            buf[o:o + int(byte_lens[j])].tobytes()
            else:
                flat, plen_np = pack(src, src_len, cl, cv, _dl_bucket)
                total = int(plen_np.sum())
                flat = np.asarray(flat)[:total]
                for j, row in enumerate(_split_rows(flat, plen_np[:n])):
                    if base + j not in fallback:
                        results[base + j] = row.tobytes()
            for i in fallback:
                blk = host_row(i)
                if i in tables.overflow:
                    results[i] = oracle.slow_pack(blk.tobytes(),
                                                  tables.row_strings(i))
                else:
                    results[i] = oracle.pack(blk, tables.lens[i],
                                             tables.vals[i])
            base += n
        return results

    def fused_decode(self, payloads, tables, out_counts,
                     expand: bool) -> list[np.ndarray]:
        """Device-resident D chain: SF decode (+ optional RLE expand), one
        compacted download of the final bytes."""
        if self._sk:
            # Mesh: the per-stage sharded kernels already cover the D chain
            # (block order preserved by the deterministic shard layout).
            decoded = self.unpack(payloads, tables, out_counts)
            return self.rle_expand(decoded) if expand else decoded
        n_total = len(payloads)
        results: list[np.ndarray | None] = [None] * n_total
        maxlen = tables.lens.max(axis=1)
        n_codes = (tables.lens > 0).sum(axis=1)
        complete = _kraft_complete(tables.lens)
        fast_idx = []
        for i in range(n_total):
            if i in tables.overflow or maxlen[i] > 32 or n_codes[i] == 0:
                dec = oracle.unpack(payloads[i], tables.row_strings(i),
                                    out_counts[i])
                results[i] = oracle.rle_expand(dec) if expand else dec
            elif not complete[i]:  # foreign .cod with gaps: trie semantics
                results[i] = _slow_decode(payloads[i], tables.row_strings(i),
                                          out_counts[i], expand)
            else:
                fast_idx.append(i)
        if not fast_idx:
            return results
        # Split by code width: a single skewed block (codes 17-32 bits)
        # must not drag every <=16-bit block onto the HBM-bound XLA stage1
        # (decode.py:316-321) — each group decodes at its own state width.
        fast16 = [i for i in fast_idx if maxlen[i] <= 16]
        fast32 = [i for i in fast_idx if maxlen[i] > 16]
        for group in (fast16, fast32):
            if group:
                self._fused_decode_group(payloads, tables, out_counts,
                                         expand, maxlen, group, results)
        return results

    def _fused_decode_group(self, payloads, tables, out_counts, expand,
                            maxlen, fast_idx, results) -> None:
        import jax.numpy as jnp
        decode = _decode_step()
        compact = _compact_step()
        blocks = [np.frombuffer(payloads[i], np.uint8) for i in fast_idx]
        p = _bucket(max(b.size for b in blocks), minimum=1024)
        # v5 decode emits in-kernel (no (S, B*P) pack intermediates), so the
        # batch cap only covers the ~44 B/payload-byte of rank planes +
        # windows; wider batches amortize the per-dispatch host round trip
        # (each batch costs 2 syncs through the dev relay, ~45 ms each).
        bsz = max(1, MAX_BATCH_ELEMS // (p * 2))
        counts_all = np.array([out_counts[i] for i in fast_idx], np.int32)
        out_p = _bucket(int(counts_all.max()))
        tab_all = kdecode.decode_tables_batch(tables.lens[fast_idx],
                                              tables.vals[fast_idx])
        for lo in range(0, len(fast_idx), bsz):
            rows = blocks[lo:lo + bsz]
            nb = len(rows)
            b_rows = _row_bucket(nb, bsz)
            # payload width floor 1024: qualifies the all-Pallas v4 decode
            # chain (decode.py requires p % 1024 == 0)
            stacked, plens = _stack_blocks(rows, b_rows, minimum=1024)
            counts = np.zeros(b_rows, np.int32)
            counts[:nb] = counts_all[lo:lo + nb]
            tab = {}
            for k, v in tab_all.items():
                pad = np.zeros((b_rows,) + v.shape[1:], v.dtype)
                pad[:nb] = v[lo:lo + nb]
                if b_rows > nb:  # padding rows need a decodable table
                    pad[nb:] = v[lo:lo + 1]
                tab[k] = pad
            dec, underrun = decode(jnp.asarray(stacked), plens, tab, counts,
                                   out_p=out_p,
                                   max_len=int(maxlen[fast_idx].max()))
            if bool(np.asarray(underrun)[:nb].any()):
                raise FileUnrecognizableError("compressed stream exhausted early")
            if expand:
                from .kernels.dispatch import pallas_interpret, \
                    use_pallas_emit
                if use_pallas_emit():
                    # one shared prep pass feeds both the exact sizes and
                    # the page kernel (saves a token-FSM pass per batch)
                    from .kernels import expand_pallas as kexpand
                    prep = kexpand.rle_expand_prep(dec, jnp.asarray(counts))
                    sizes = np.asarray(prep["out_len"]).copy()
                    sizes[nb:] = 0
                    total = int(sizes.sum())
                    flat = np.asarray(krle.rle_expand_compact_prepped(
                        prep, out_sz=_dl_bucket(total),
                        out_p=_bucket(int(max(sizes.max(), 1)),
                                      minimum=2048),
                        interpret=pallas_interpret()))[:total]
                else:
                    sizes = np.asarray(
                        _expand_sizes_step()(dec, counts)).copy()
                    sizes[nb:] = 0
                    total = int(sizes.sum())
                    flat = np.asarray(krle.rle_expand_compact(
                        dec, jnp.asarray(counts), out_sz=_dl_bucket(total),
                        out_p=_bucket(int(max(sizes.max(), 1)),
                                      minimum=2048)))[:total]
                out_rows = _split_rows(flat, sizes[:nb])
            else:
                cts = counts.copy()
                total = int(cts.sum())
                flat = np.asarray(compact(dec, cts,
                                          out_sz=_dl_bucket(total)))[:total]
                out_rows = _split_rows(flat, cts[:nb])
            for j, row in enumerate(out_rows):
                results[fast_idx[lo + j]] = row
