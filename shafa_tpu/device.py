"""JAX device backend: block batching, padding, kernel dispatch, fallbacks.

Blocks of a file share one size (except the last), so a file's blocks stack
into a (B, P) array: B is the data-parallel axis — the TPU replacement for
the reference's thread-per-block pipeline (multithread.c:126-194). P is
padded per jit-bucket to bound recompilation; true lengths mask the padding.

Fallback policy: blocks whose code tables exceed the 32-bit kernel width
(pathological skew) or whose packed size could overflow int32 bit offsets
route to the numpy oracle — bit-exactness is never at risk from the fast
path's static bounds.
"""

from __future__ import annotations

import numpy as np

from . import codes as codes_mod
from . import oracle
from .kernels import decode as kdecode
from .kernels import histogram as khist
from .kernels import pack as kpack
from .kernels import rle as krle

#: Max elements per (B, P) device batch — bounds peak HBM across the ~20x
#: int32 intermediates of the scan/scatter kernels.
MAX_BATCH_ELEMS = 1 << 26


def _bucket(n: int, minimum: int = 256) -> int:
    """Next power-of-two bucket (static shapes => bounded recompiles)."""
    b = minimum
    while b < n:
        b *= 2
    return b


def _stack_blocks(blocks):
    """list of 1-D uint8 -> (B, P) padded + (B,) lengths (host-side)."""
    lens = np.array([b.size for b in blocks], dtype=np.int32)
    p = _bucket(int(lens.max()) if len(blocks) else 1)
    out = np.zeros((len(blocks), p), dtype=np.uint8)
    for i, b in enumerate(blocks):
        out[i, : b.size] = b
    return out, lens


def _batches(n_blocks: int, p: int):
    bsz = max(1, MAX_BATCH_ELEMS // max(p, 1))
    for lo in range(0, n_blocks, bsz):
        yield lo, min(lo + bsz, n_blocks)


class JaxBackend:
    """Device implementation of the pipeline Backend protocol.

    With ``mesh=None`` kernels run single-device. With a mesh (dist.block_mesh)
    every kernel shard_maps its block axis over the mesh — the multi-chip path
    (SURVEY.md §5.8); results come back in block order, so outputs are
    byte-identical regardless of device count.
    """

    def __init__(self, mesh=None):
        if mesh is not None:
            from .dist import ShardedKernels
            self._sk = ShardedKernels(mesh)
        else:
            self._sk = None

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

    def _k_decode(self, payload, plens, tables, counts, out_p):
        if self._sk:
            return self._sk.decode(payload, plens, tables, counts, out_p)
        out, under = kdecode.decode_batch(payload, plens, tables, counts,
                                          out_p)
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

    # -- Backend protocol ---------------------------------------------------

    def rle_encode(self, blocks):
        if not blocks:
            return []
        out = []
        stacked, lens = _stack_blocks(blocks)
        for lo, hi in _batches(len(blocks), stacked.shape[1]):
            enc, out_len = self._k_rle_encode(stacked[lo:hi], lens[lo:hi])
            out.extend(enc[i, : out_len[i]] for i in range(hi - lo))
        return out

    def histogram(self, blocks):
        if not blocks:
            return []
        stacked, lens = _stack_blocks(blocks)
        out = []
        for lo, hi in _batches(len(blocks), stacked.shape[1]):
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
            stacked, lens = _stack_blocks([blocks[i] for i in fast_idx])
            lens_arr = tables.lens[fast_idx].astype(np.int32)
            vals_arr = (tables.vals[fast_idx] >> np.uint64(32)) \
                .astype(np.uint32)
            for lo, hi in _batches(len(fast_idx), stacked.shape[1]):
                packed, plen = self._k_pack(
                    stacked[lo:hi], lens[lo:hi],
                    lens_arr[lo:hi], vals_arr[lo:hi])
                for j in range(hi - lo):
                    results[fast_idx[lo + j]] = packed[j, : plen[j]].tobytes()
        return results

    def unpack(self, payloads, tables, out_counts):
        if not payloads:
            return []
        results: list[np.ndarray | None] = [None] * len(payloads)
        maxlen = tables.lens.max(axis=1)
        n_codes = (tables.lens > 0).sum(axis=1)
        fast_idx = []
        for i in range(len(payloads)):
            if i in tables.overflow or maxlen[i] > 32 or n_codes[i] == 0:
                results[i] = oracle.unpack(payloads[i], tables.row_strings(i),
                                           out_counts[i])
            else:
                fast_idx.append(i)
        if fast_idx:
            blocks = [np.frombuffer(payloads[i], np.uint8) for i in fast_idx]
            stacked, plens = _stack_blocks(blocks)
            counts = np.array([out_counts[i] for i in fast_idx], np.int32)
            tab = kdecode.decode_tables_batch(tables.lens[fast_idx],
                                              tables.vals[fast_idx])
            out_p = _bucket(int(counts.max()))
            for lo, hi in _batches(len(fast_idx), stacked.shape[1] * 8):
                sub_tab = {k: v[lo:hi] for k, v in tab.items()}
                out, underrun = self._k_decode(
                    stacked[lo:hi], plens[lo:hi], sub_tab,
                    counts[lo:hi], out_p)
                if bool(underrun.any()):
                    raise ValueError("compressed stream exhausted early")
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
        for lo, hi in _batches(len(blocks), max(stacked.shape[1], out_p)):
            ex, ex_len = self._k_expand(stacked[lo:hi], lens[lo:hi], out_p)
            out.extend(ex[i, : ex_len[i]] for i in range(hi - lo))
        return out
