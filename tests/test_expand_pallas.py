"""Differential tests for the Pallas RLE run-expansion page kernel
(kernels/expand_pallas.py) in interpret mode, vs the numpy oracle and the
XLA gather formulation. Mirrors tests/test_emit_pallas.py's approach."""

import numpy as np
import pytest

import jax.numpy as jnp

from shafa_tpu.kernels import rle as krle
from shafa_tpu.kernels.expand_pallas import (
    PAGE_B, rle_expand_pages, rle_expand_pages_reference)
from shafa_tpu.kernels.ops import compact_words_pallas


def _rle_stream(rng, n):
    """Random but VALID rle stream bytes (complete escape triples)."""
    out = bytearray()
    while len(out) < n:
        if rng.random() < 0.4:
            out += bytes([0, int(rng.integers(0, 256)),
                          int(rng.integers(0, 256))])
        else:
            out.append(int(rng.integers(1, 256)))
    return np.frombuffer(bytes(out[:n]), np.uint8)  # may truncate a triple


def _stack(rows):
    p = max(r.size for r in rows)
    p = max(256, 1 << (p - 1).bit_length())
    x = np.zeros((len(rows), p), np.uint8)
    lens = np.zeros(len(rows), np.int32)
    for i, r in enumerate(rows):
        x[i, : r.size] = r
        lens[i] = r.size
    return x, lens


def _check(rows, out_p=None):
    x, lens = _stack(rows)
    ref_words, ref_lens = rle_expand_pages_reference(
        x, lens, out_p or _out_p(x, lens))
    got_words, got_lens = rle_expand_pages(
        jnp.asarray(x), jnp.asarray(lens), out_p or _out_p(x, lens),
        interpret=True)
    got_words = np.asarray(got_words)
    got_lens = np.asarray(got_lens)
    np.testing.assert_array_equal(got_lens, ref_lens)
    gb = got_words.view(np.uint8).reshape(x.shape[0], -1)
    rb = np.asarray(ref_words).view(np.uint8).reshape(x.shape[0], -1)
    for r in range(x.shape[0]):
        np.testing.assert_array_equal(gb[r, : got_lens[r]],
                                      rb[r, : ref_lens[r]],
                                      err_msg=f"row {r}")
    return got_words, got_lens


def _out_p(x, lens):
    _, ref_lens = rle_expand_pages_reference(x, lens, PAGE_B)
    need = max(1, int(ref_lens.max()))
    return -(-need // PAGE_B) * PAGE_B


def test_single_row_literals():
    _check([np.arange(1, 200, dtype=np.uint8)])


def test_single_row_escapes():
    rows = [np.frombuffer(b"\x00A\xff\x00B\x04\x00\x00\x01C", np.uint8)]
    _check(rows)


def test_multi_row_mixed():
    rng = np.random.default_rng(0)
    rows = [_rle_stream(rng, int(rng.integers(300, 5000))) for _ in range(5)]
    _check(rows)


def test_big_runs_cross_pages():
    # escapes expanding to 255 each: output >> input, many page crossings
    row = np.frombuffer(b"".join(
        bytes([0, s % 256, 255]) for s in range(1, 200)), np.uint8)
    _check([row, row[:30]])


def test_row_boundary_garbage_confined():
    # a row whose output ends mid-page followed by another row: the next
    # row's bytes must not leak into the previous row's valid region
    rows = [np.frombuffer(b"\x00Q\x07", np.uint8),      # 7 bytes out
            np.frombuffer(b"\x00Z\xff" * 40, np.uint8)]  # 10200 bytes out
    _check(rows)


def test_empty_and_tiny_rows():
    rows = [np.zeros(0, np.uint8), np.frombuffer(b"A", np.uint8),
            np.frombuffer(b"\x00\x00\x00", np.uint8)]  # escape of 0x00 x0->1
    _check(rows)


def test_compact_words_roundtrip():
    rng = np.random.default_rng(3)
    rows = [_rle_stream(rng, int(rng.integers(100, 3000))) for _ in range(4)]
    x, lens = _stack(rows)
    out_p = _out_p(x, lens)
    words, out_len = rle_expand_pages(jnp.asarray(x), jnp.asarray(lens),
                                      out_p, interpret=True)
    total = int(np.asarray(out_len).sum())
    out_sz = -(-total // 512) * 512
    flat = np.asarray(compact_words_pallas(words, out_len, out_sz,
                                           interpret=True))[:total]
    # reference: concatenated oracle expansions
    ref = np.concatenate([
        np.asarray(rle_expand_pages_reference(x[r:r + 1], lens[r:r + 1],
                                              out_p)[0]).view(np.uint8)
        .ravel()[: int(np.asarray(out_len)[r])]
        for r in range(x.shape[0])])
    np.testing.assert_array_equal(flat, ref)


def test_dispatcher_xla_vs_pallas():
    rng = np.random.default_rng(5)
    rows = [_rle_stream(rng, int(rng.integers(200, 4000))) for _ in range(3)]
    x, lens = _stack(rows)
    out_p = _out_p(x, lens)
    sizes = np.asarray(krle.rle_expand_sizes(jnp.asarray(x),
                                             jnp.asarray(lens)))
    total = int(sizes.sum())
    out_sz = -(-total // 512) * 512
    a = np.asarray(krle.rle_expand_compact_xla(
        jnp.asarray(x), jnp.asarray(lens), out_sz))[:total]
    b = np.asarray(krle.rle_expand_compact_pallas(
        jnp.asarray(x), jnp.asarray(lens), out_sz, out_p,
        interpret=True))[:total]
    np.testing.assert_array_equal(a, b)
