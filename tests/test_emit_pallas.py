"""Differential tests for the Pallas emission kernel (kernels/emit_pallas.py).

Interpret mode (CPU) vs the numpy bit-oracle `emit_reference`, over the
layout contract of the reference encoder: MSB-first bitstream, zero-padded
final byte (c.c:133-146, c.c:58/80). Only each row's valid byte range
[4*woff[r], 4*woff[r] + byte_len[r]) is specified — slack between rows is
unspecified (the host never reads it).

Covers the VERDICT-r2 matrix: masked lanes, multi-tile rows, page-boundary
crossings, 0/32-bit lengths, B > 1, zero-length rows, and the in-kernel
LUT path (emit_coded) against the pack oracle.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from shafa_tpu.kernels import emit_pallas as ep
from shafa_tpu import oracle


def _rand_payloads(rng, b, p, max_bits=32, min_bits=0):
    lens = rng.integers(min_bits, max_bits + 1, size=(b, p)).astype(np.int32)
    vals = rng.integers(0, 1 << 32, size=(b, p), dtype=np.uint64) \
        .astype(np.uint32)
    mask = np.where(
        lens == 0, np.uint32(0),
        (~np.uint32(0)) << (32 - np.maximum(lens, 1)).astype(np.uint32))
    return vals & mask, lens


def _byte_lens(lens, row_lens):
    return [(int(lens[r, :row_lens[r]].sum()) + 7) // 8
            for r in range(lens.shape[0])]


def _run_and_compare(vals, lens, row_lens, t_lanes=256):
    byte_lens = _byte_lens(lens, row_lens)
    woff, out_words = ep.aligned_offsets(byte_lens)
    got = np.asarray(ep.emit_bits(
        jnp.asarray(vals), jnp.asarray(lens), jnp.asarray(row_lens),
        jnp.asarray(woff), out_words=out_words, t_lanes=t_lanes,
        interpret=True)).ravel().view(np.uint8)
    want = np.asarray(ep.emit_reference(
        vals, lens, row_lens, woff, out_words)).ravel().view(np.uint8)
    for r in range(vals.shape[0]):
        base = int(woff[r]) * 4
        np.testing.assert_array_equal(
            got[base:base + byte_lens[r]], want[base:base + byte_lens[r]],
            err_msg=f"row {r}")


def test_emit_bits_small_masked():
    rng = np.random.default_rng(1)
    vals, lens = _rand_payloads(rng, 1, 300)
    _run_and_compare(vals, lens, np.array([137], np.int32))


def test_emit_bits_multirow_ragged():
    rng = np.random.default_rng(2)
    vals, lens = _rand_payloads(rng, 4, 700)
    row_lens = np.array([700, 0, 33, 512], np.int32)  # incl. zero-length row
    _run_and_compare(vals, lens, row_lens)


def test_emit_bits_multitile_row():
    rng = np.random.default_rng(3)
    vals, lens = _rand_payloads(rng, 2, 1000)
    _run_and_compare(vals, lens, np.array([1000, 999], np.int32))


def test_emit_bits_page_crossing():
    # 8 KiB page = 65536 bits; force > 2 page flushes in one row.
    rng = np.random.default_rng(4)
    p = 30000
    vals, lens = _rand_payloads(rng, 1, p, max_bits=8, min_bits=6)
    _run_and_compare(vals, lens, np.array([p], np.int32))


def test_emit_bits_extreme_lengths():
    # all-zero, all-32, and alternating 0/32-bit payloads
    b, p = 3, 400
    lens = np.zeros((b, p), np.int32)
    lens[1] = 32
    lens[2, ::2] = 32
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 1 << 32, size=(b, p), dtype=np.uint64) \
        .astype(np.uint32)
    vals = np.where(lens == 32, vals, 0)
    _run_and_compare(vals, lens, np.array([p, p, p], np.int32))


def test_emit_bits_exact_page_boundary():
    # row bit total exactly a page multiple (65536 bits = 1 page of words)
    b, p = 1, 8192
    lens = np.full((b, p), 8, np.int32)
    rng = np.random.default_rng(6)
    vals = (rng.integers(0, 256, size=(b, p), dtype=np.uint64)
            .astype(np.uint32) << 24)
    _run_and_compare(vals, lens, np.array([p], np.int32))


def test_emit_bits_nondefault_tile():
    rng = np.random.default_rng(7)
    vals, lens = _rand_payloads(rng, 2, 513)
    _run_and_compare(vals, lens, np.array([513, 200], np.int32), t_lanes=128)


def test_emit_coded_vs_pack_oracle():
    """In-kernel LUT path == oracle.pack on real Shannon-Fano tables."""
    from shafa_tpu import codes as codes_mod
    rng = np.random.default_rng(8)
    b, p = 3, 1500
    x = rng.integers(0, 256, size=(b, p), dtype=np.uint8)
    x[1, :700] = 7  # skewed histogram -> longer codes
    row_lens = np.array([p, 1300, 64], np.int32)
    hists = np.stack([np.bincount(x[r, :row_lens[r]], minlength=256)
                      for r in range(b)])
    tables = codes_mod.build_code_tables(hists)
    cl = tables.lens.astype(np.int32)
    cv = (tables.vals >> np.uint64(32)).astype(np.uint32)
    byte_lens = [(int((hists[r] * cl[r]).sum()) + 7) // 8 for r in range(b)]
    woff, out_words = ep.aligned_offsets(byte_lens)
    got = np.asarray(ep.emit_coded(
        jnp.asarray(x), jnp.asarray(row_lens),
        jnp.asarray(cl), jnp.asarray((cv >> 16).astype(np.int32)),
        jnp.asarray((cv & 0xFFFF).astype(np.int32)), jnp.asarray(woff),
        out_words=out_words, interpret=True)).ravel().view(np.uint8)
    for r in range(b):
        want = oracle.pack(x[r, :row_lens[r]], tables.lens[r], tables.vals[r])
        base = int(woff[r]) * 4
        np.testing.assert_array_equal(
            got[base:base + byte_lens[r]],
            np.frombuffer(want, np.uint8), err_msg=f"row {r}")


def test_aligned_offsets_contract():
    woff, total = ep.aligned_offsets([1, 512, 513, 0])
    assert list(woff) == [0, 128, 256, 512]
    assert woff.dtype == np.int32
    assert total == 512 + 2 * ep.PAGE  # 2048 bytes of rows = 512 words
    # every row 512 B-aligned and non-overlapping
    assert all(w % 128 == 0 for w in woff)
