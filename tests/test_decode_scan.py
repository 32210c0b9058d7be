"""FSM-scan decode stage2 (TPU production path) vs the numpy oracle.

Runs the Pallas-emission decode path on CPU via interpret mode (dispatch
monkeypatched), differential against oracle.unpack — multi-row, ragged
counts, skewed tables (16/32-state FSM), and underrun detection.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from shafa_tpu import codes as codes_mod, oracle
from shafa_tpu.device import _bucket, _stack_blocks
from shafa_tpu.kernels import decode as kdecode
from shafa_tpu.kernels import dispatch


@pytest.fixture(autouse=True)
def force_pallas(monkeypatch):
    monkeypatch.setattr(dispatch, "use_pallas_emit", lambda: True)
    monkeypatch.setattr(dispatch, "pallas_interpret", lambda: True)


def _archive(blocks):
    hists = np.stack([oracle.histogram(b) for b in blocks])
    tables = codes_mod.build_code_tables(hists)
    payloads = [oracle.pack(b, tables.lens[i], tables.vals[i])
                for i, b in enumerate(blocks)]
    return tables, payloads


def _decode(payloads, tables, counts):
    pblocks = [np.frombuffer(p, np.uint8) for p in payloads]
    stacked, plens = _stack_blocks(pblocks)
    tab = kdecode.decode_tables_batch(tables.lens, tables.vals)
    out_p = _bucket(int(max(counts)))
    ml = int(tables.lens.max())
    out, under = kdecode.decode_batch(
        jnp.asarray(stacked), jnp.asarray(plens), tab,
        jnp.asarray(np.array(counts, np.int32)), out_p, max_len=ml)
    return np.asarray(out), np.asarray(under)


def test_scan_decode_mixed_rows():
    rng = np.random.default_rng(41)
    blocks = [
        rng.integers(0, 256, 3000, dtype=np.uint8),            # broad
        np.repeat(rng.integers(0, 5, 700), 3).astype(np.uint8)[:2000],
        rng.integers(97, 102, 1500).astype(np.uint8),          # tiny alphabet
    ]
    tables, payloads = _archive(blocks)
    counts = [b.size for b in blocks]
    out, under = _decode(payloads, tables, counts)
    assert not under.any()
    for i, b in enumerate(blocks):
        np.testing.assert_array_equal(out[i, :counts[i]], b,
                                      err_msg=f"row {i}")


def test_scan_decode_skewed_long_codes():
    # geometric-ish skew drives code lengths past 8 and 16 bits
    rng = np.random.default_rng(42)
    parts = [np.full(1 << max(0, 12 - s), s, np.uint8) for s in range(40)]
    b0 = np.concatenate(parts)
    rng.shuffle(b0)
    tables, payloads = _archive([b0])
    assert int(tables.lens.max()) > 8  # exercise >8-state FSM
    out, under = _decode(payloads, tables, [b0.size])
    assert not under.any()
    np.testing.assert_array_equal(out[0, :b0.size], b0)


def test_scan_decode_all_8bit_codes():
    # Uniform 256-symbol data gives every symbol an exactly-8-bit code, so
    # max_len == s_states == 8. Regression: the FSM kernel clipped code
    # lengths to s_states-1, corrupting every block on this boundary.
    rng = np.random.default_rng(45)
    b0 = np.tile(np.arange(256, dtype=np.uint8), 16)
    rng.shuffle(b0)
    tables, payloads = _archive([b0])
    nz = tables.lens[0][tables.lens[0] > 0]
    assert int(nz.max()) == 8 and int(nz.min()) == 8
    out, under = _decode(payloads, tables, [b0.size])
    assert not under.any()
    np.testing.assert_array_equal(out[0, :b0.size], b0)


def test_scan_decode_len_equals_16():
    # Canonical complete code whose longest code is exactly 16 bits — the
    # s_states==16 boundary of the same length clip.
    lens_list = list(range(1, 16)) + [16, 16]  # Kraft sum == 1
    lens = np.zeros((1, 256), np.uint8)
    vals = np.zeros((1, 256), np.uint64)
    code = prev = 0
    for s, ln in enumerate(lens_list):
        code <<= ln - prev
        lens[0, s] = ln
        vals[0, s] = np.uint64(code) << np.uint64(64 - ln)
        code += 1
        prev = ln
    tables = codes_mod.CodeTables(lens, vals)
    rng = np.random.default_rng(46)
    b0 = rng.integers(0, len(lens_list), 4000).astype(np.uint8)
    payloads = [oracle.pack(b0, tables.lens[0], tables.vals[0])]
    out, under = _decode(payloads, tables, [b0.size])
    assert not under.any()
    np.testing.assert_array_equal(out[0, :b0.size], b0)


def test_scan_decode_codes_over_16_bits():
    # Canonical complete table with codes up to 20 bits: routes through
    # the 32-bit rank kernel + S=32 FSM chain (the former XLA-stage1 path)
    lens_list = list(range(1, 20)) + [20, 20]  # Kraft sum == 1
    lens = np.zeros((1, 256), np.uint8)
    vals = np.zeros((1, 256), np.uint64)
    code = prev = 0
    for s, ln in enumerate(lens_list):
        code <<= ln - prev
        lens[0, s] = ln
        vals[0, s] = np.uint64(code) << np.uint64(64 - ln)
        code += 1
        prev = ln
    tables = codes_mod.CodeTables(lens, vals)
    rng = np.random.default_rng(49)
    b0 = rng.integers(0, len(lens_list), 5000).astype(np.uint8)
    payloads = [oracle.pack(b0, tables.lens[0], tables.vals[0])]
    out, under = _decode(payloads, tables, [b0.size])
    assert not under.any()
    np.testing.assert_array_equal(out[0, :b0.size], b0)


def test_scan_decode_high_expansion_flush():
    # 2-symbol table -> 1-bit codes: 8 output bytes per payload byte, the
    # maximum in-kernel emission rate (exercises multi-page flushes of the
    # v5 decode kernel's 4-page accumulator)
    rng = np.random.default_rng(48)
    b0 = np.where(rng.random(60000) < 0.5, 65, 66).astype(np.uint8)
    tables, payloads = _archive([b0])
    assert int(tables.lens[0].max()) == 1
    out, under = _decode(payloads, tables, [b0.size])
    assert not under.any()
    np.testing.assert_array_equal(out[0, :b0.size], b0)


def test_scan_decode_partial_count():
    rng = np.random.default_rng(43)
    b0 = rng.integers(0, 256, 2048, dtype=np.uint8)
    tables, payloads = _archive([b0])
    out, under = _decode(payloads, tables, [1000])  # fewer than available
    assert not under.any()
    np.testing.assert_array_equal(out[0, :1000], b0[:1000])


def test_scan_decode_underrun_flag():
    rng = np.random.default_rng(44)
    b0 = rng.integers(0, 256, 2048, dtype=np.uint8)
    tables, payloads = _archive([b0])
    truncated = payloads[0][: len(payloads[0]) // 2]
    out, under = _decode([truncated], tables, [b0.size])
    assert bool(under[0])
