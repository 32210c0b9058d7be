"""Oracle unit tests: vectorized numpy vs slow ground-truth, and format
properties (prefix-free, Kraft, round-trip). SURVEY.md §4 'Unit level'."""

import numpy as np
import pytest

from shafa_tpu import codes as codes_mod
from shafa_tpu import oracle

from corpus import edge_cases, incompressible, mixed, runs_heavy, text


def all_samples():
    s = dict(edge_cases())
    s["mixed_10k"] = mixed(10240, 1)
    s["text_8k"] = text(8192, 2)
    s["rand_4k"] = incompressible(4096, 3)
    s["runs_16k"] = runs_heavy(16384, 4)
    return s


@pytest.mark.parametrize("name,data", all_samples().items())
def test_rle_encode_matches_slow(name, data):
    fast = oracle.rle_encode(data).tobytes()
    slow = oracle.slow_rle_encode(data)
    assert fast == slow


@pytest.mark.parametrize("name,data", all_samples().items())
def test_rle_roundtrip(name, data):
    enc = oracle.rle_encode(data)
    dec = oracle.rle_expand(enc)
    assert dec.tobytes() == data
    assert oracle.slow_rle_expand(enc.tobytes()) == data


def test_rle_escape_rules():
    # run of 3 nonzero -> literals; run of 4 -> escape; any zero -> escape
    assert oracle.rle_encode(b"aaa").tobytes() == b"aaa"
    assert oracle.rle_encode(b"aaaa").tobytes() == b"\x00a\x04"
    assert oracle.rle_encode(b"\x00").tobytes() == b"\x00\x00\x01"
    # 1024-run: 4 x 255 + 4 (SURVEY.md §2.1 verified example)
    enc = oracle.rle_encode(b"G" * 1024).tobytes()
    assert enc == b"\x00G\xff" * 4 + b"\x00G\x04"
    # run capped at block end
    assert oracle.rle_encode(b"G" * 2).tobytes() == b"GG"


def test_histogram():
    data = mixed(5000, 7)
    h = oracle.histogram(data)
    assert h.sum() == 5000
    ref = np.zeros(256, np.int64)
    for b in data:
        ref[b] += 1
    assert (h == ref).all()


@pytest.mark.parametrize("name,data", all_samples().items())
def test_codes_properties(name, data):
    freqs = oracle.histogram(data)
    cs = codes_mod.build_codes(freqs)
    present = [cs[s] for s in range(256) if freqs[s] > 0]
    absent = [cs[s] for s in range(256) if freqs[s] == 0]
    assert all(c == "" for c in absent)
    distinct = len(set(np.frombuffer(data, np.uint8).tolist()))
    if distinct > 1:
        assert all(c for c in present)
        # prefix-free over present symbols
        ps = sorted(present)
        for a, b in zip(ps, ps[1:]):
            assert not b.startswith(a), (a, b)
        # Kraft sum == 1 (the SF split tree is full => complete code)
        kraft = sum(2.0 ** -len(c) for c in present)
        assert abs(kraft - 1.0) < 1e-9
        # lexicographic order by rank (decoder precondition, codes.py)
        order = codes_mod.sort_symbols(freqs)
        rank_codes = [cs[int(s)] for s in order if freqs[int(s)] > 0]
        maxlen = max(len(c) for c in rank_codes)
        padded = [int(c, 2) << (maxlen - len(c)) for c in rank_codes]
        assert padded == sorted(padded)
        assert len(set(padded)) == len(padded)


@pytest.mark.parametrize("name,data", all_samples().items())
def test_pack_unpack_roundtrip(name, data):
    stream = oracle.rle_encode(data).tobytes()
    freqs = oracle.histogram(stream)
    cs = codes_mod.build_codes(freqs)
    lens, vals = codes_mod.code_table_arrays(cs, width=64)
    packed = oracle.pack(stream, lens, vals)
    assert packed == oracle.slow_pack(stream, cs)
    distinct = len(set(stream))
    dec = oracle.unpack(packed, cs, len(stream))
    assert dec.tobytes() == stream
    if distinct > 1:
        assert oracle.slow_unpack(packed, cs, len(stream)) == stream


def test_pack_bit_layout():
    # two symbols: codes '0' and '1' -> bytes are the bitmap, MSB-first
    cs = [""] * 256
    cs[65], cs[66] = "0", "1"
    lens, vals = codes_mod.code_table_arrays(cs, width=64)
    packed = oracle.pack(b"ABBABBBB", lens, vals)
    assert packed == bytes([0b01101111])
    packed = oracle.pack(b"ABB", lens, vals)  # zero padding to the right
    assert packed == bytes([0b01100000])


def test_single_symbol_block_gets_one_bit_code():
    # Single-distinct-symbol block: the reference emits all-empty codes (an
    # archive its own decoder crashes on); we deviate to a one-bit code so
    # the round-trip is well-defined. docs/DEVIATIONS.md.
    freqs = np.zeros(256, np.int64)
    freqs[66] = 1000
    cs = codes_mod.build_codes(freqs)
    assert cs[66] == "0" and all(c == "" for s, c in enumerate(cs) if s != 66)
    lens, vals = codes_mod.code_table_arrays(cs)
    packed = oracle.pack(b"B" * 1000, lens, vals)
    assert len(packed) == 125  # 1000 bits
    dec = oracle.unpack(packed, cs, 1000)
    assert dec.tobytes() == b"B" * 1000
    # all-empty table (C-reference-produced) is rejected, not garbage-decoded
    with pytest.raises(ValueError):
        oracle.unpack(b"", [""] * 256, 10)


def test_best_division_greedy_early_stop():
    # The greedy stops at the first non-improvement even if a later split
    # would be better — part of the observable format (t.c:138-149).
    f = np.array([8, 7, 1, 1, 1, 1, 1], dtype=np.int64)
    # total=20; g1 after idx0=8 -> |16-20|=4 < 20; idx1=15 -> |30-20|=10 stop
    assert codes_mod.best_division(f, 0, 6) == 0


def test_chain_positions():
    jump = np.array([2, 3, 4, 5, 5, 5], dtype=np.int64)  # n=5
    pos = oracle._chain_positions(jump, 4)
    assert pos.tolist() == [0, 2, 4, 5]
