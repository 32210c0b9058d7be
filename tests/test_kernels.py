"""Differential tests: JAX kernels vs numpy oracle (CPU platform).
SURVEY.md §4 'Unit level' + the --check cross-verification mode's core."""

import numpy as np
import pytest

from shafa_tpu import codes as codes_mod
from shafa_tpu import oracle
from shafa_tpu.device import JaxBackend, _stack_blocks
from shafa_tpu.kernels import decode as kdecode
from shafa_tpu.kernels import histogram as khist
from shafa_tpu.kernels import pack as kpack
from shafa_tpu.kernels import rle as krle

from corpus import edge_cases, incompressible, mixed, runs_heavy, text


def sample_blocks():
    cases = dict(edge_cases())
    cases["mixed"] = mixed(30000, 31)
    cases["text"] = text(20000, 32)
    cases["rand"] = incompressible(8192, 33)
    cases["runs"] = runs_heavy(50000, 34)
    cases["tiny"] = b"abcd"
    cases["one"] = b"Q"
    return {k: np.frombuffer(v, np.uint8) for k, v in cases.items()}


BLOCKS = sample_blocks()


def test_histogram_batch():
    blocks = list(BLOCKS.values())
    stacked, lens = _stack_blocks(blocks)
    h = np.asarray(khist.histogram_batch(stacked, lens))
    for i, b in enumerate(blocks):
        assert (h[i] == oracle.histogram(b)).all(), i


def test_rle_encode_batch():
    blocks = list(BLOCKS.values())
    stacked, lens = _stack_blocks(blocks)
    enc, out_len = krle.rle_encode_batch(stacked, lens)
    enc, out_len = np.asarray(enc), np.asarray(out_len)
    for i, b in enumerate(blocks):
        ref = oracle.rle_encode(b)
        assert out_len[i] == ref.size, list(BLOCKS)[i]
        assert (enc[i, : ref.size] == ref).all(), list(BLOCKS)[i]


def test_rle_expand_batch():
    blocks = [oracle.rle_encode(b) for b in BLOCKS.values()]
    stacked, lens = _stack_blocks(blocks)
    sizes = np.asarray(krle.rle_expand_sizes(stacked, lens))
    out_p = 1 << int(np.ceil(np.log2(max(1, sizes.max()))))
    ex, ex_len = krle.rle_expand_batch(stacked, lens, out_p)
    ex, ex_len = np.asarray(ex), np.asarray(ex_len)
    for i, orig in enumerate(BLOCKS.values()):
        assert sizes[i] == orig.size
        assert ex_len[i] == orig.size
        assert (ex[i, : orig.size] == orig).all(), list(BLOCKS)[i]


def test_pack_batch():
    blocks, lut_l, lut_v, codes_all = [], [], [], []
    for b in BLOCKS.values():
        stream = oracle.rle_encode(b)
        cs = codes_mod.build_codes(oracle.histogram(stream))
        try:
            ln, va = codes_mod.code_table_arrays(cs, width=32)
        except OverflowError:
            continue
        blocks.append(stream)
        lut_l.append(ln)
        lut_v.append(va)
        codes_all.append(cs)
    stacked, lens = _stack_blocks(blocks)
    packed, plen = kpack.pack_batch(stacked, lens, np.stack(lut_l),
                                    np.stack(lut_v))
    packed, plen = np.asarray(packed), np.asarray(plen)
    for i, (stream, cs) in enumerate(zip(blocks, codes_all)):
        ref = oracle.slow_pack(stream.tobytes(), cs)
        assert plen[i] == len(ref)
        assert packed[i, : len(ref)].tobytes() == ref


def test_decode_batch():
    payloads, tables, counts, expected = [], [], [], []
    for b in BLOCKS.values():
        stream = oracle.rle_encode(b)
        cs = codes_mod.build_codes(oracle.histogram(stream))
        try:
            tables.append(kdecode.decode_tables_u32(cs))
        except (OverflowError, ValueError):
            continue
        ln, va = codes_mod.code_table_arrays(cs, width=64)
        payloads.append(np.frombuffer(oracle.pack(stream, ln, va), np.uint8))
        counts.append(stream.size)
        expected.append(stream)
    stacked, plens = _stack_blocks(payloads)
    tab = kdecode.stack_decode_tables(tables)
    out_p = 1 << int(np.ceil(np.log2(max(counts))))
    out, underrun = kdecode.decode_batch(
        stacked, plens, tab, np.array(counts, np.int32), out_p)
    out = np.asarray(out)
    assert not np.asarray(underrun).any()
    for i, exp in enumerate(expected):
        assert (out[i, : exp.size] == exp).all(), i


def test_decode_underrun_flag():
    cs = [""] * 256
    cs[65], cs[66] = "0", "1"
    tab = kdecode.stack_decode_tables([kdecode.decode_tables_u32(cs)])
    payload = np.zeros((1, 256), np.uint8)
    # 8 valid bits but ask for 100 symbols
    out, underrun = kdecode.decode_batch(
        payload, np.array([1], np.int32), tab, np.array([100], np.int32), 128)
    assert bool(np.asarray(underrun)[0])


@pytest.mark.parametrize("seed", [41, 42, 43])
def test_backend_end_to_end(seed):
    """Full JaxBackend F->T->C->D round-trip vs NumpyBackend outputs."""
    from shafa_tpu.pipeline import NumpyBackend
    data = mixed(150_000, seed)
    blocks = [np.frombuffer(data[i:i + 65536], np.uint8)
              for i in range(0, len(data), 65536)]
    jb, nb = JaxBackend(), NumpyBackend()

    rle_j = jb.rle_encode(blocks)
    rle_n = nb.rle_encode(blocks)
    for a, b in zip(rle_j, rle_n):
        assert (a == b).all()

    h_j = jb.histogram(rle_j)
    h_n = nb.histogram(rle_n)
    for a, b in zip(h_j, h_n):
        assert (a == b).all()

    tables = codes_mod.build_code_tables(np.stack(h_j))
    p_j = jb.pack(rle_j, tables)
    p_n = nb.pack(rle_n, tables)
    assert p_j == p_n

    d_j = jb.unpack(p_j, tables, [b.size for b in rle_j])
    for a, b in zip(d_j, rle_j):
        assert (a == b).all()

    e_j = jb.rle_expand(d_j)
    assert b"".join(e.tobytes() for e in e_j) == data
