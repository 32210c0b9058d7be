"""Differential tests: native C++ runtime vs the pure-Python spec.

The native library (shafa_tpu/runtime/runtime.cpp) re-implements module T's
code construction and the sidecar codecs; these tests pin it bit-for-bit to
codes.py / formats.py on randomized and adversarial inputs. If the library
can't build in this environment the wrappers return None and the suite
skips (the Python paths are covered by the other test files).
"""

import io

import numpy as np
import pytest

from shafa_tpu import codes as codes_mod
from shafa_tpu import formats, runtime

pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native runtime unavailable")


def _random_freqs(rng, n):
    """Histogram-like rows with the edge cases the formats care about:
    zero runs (elision), equal-frequency runs, single-symbol, skew."""
    rows = []
    for _ in range(n):
        kind = rng.integers(0, 5)
        f = np.zeros(256, np.int64)
        if kind == 0:
            f[:] = rng.integers(0, 10_000, 256)
        elif kind == 1:  # sparse
            idx = rng.choice(256, rng.integers(1, 10), replace=False)
            f[idx] = rng.integers(1, 1000, idx.size)
        elif kind == 2:  # heavy ties
            f[:] = rng.integers(0, 4, 256) * 7
            f[0] = max(int(f[0]), 1)
        elif kind == 3:  # single distinct symbol
            f[rng.integers(0, 256)] = rng.integers(1, 65536)
        else:  # exponential skew (deep codes)
            k = int(rng.integers(2, 40))
            f[:k] = (1 << np.arange(k, dtype=np.int64))[::-1]
        rows.append(f)
    return np.stack(rows)


def test_build_codes_matches_python():
    rng = np.random.default_rng(0)
    freqs = _random_freqs(rng, 200)
    native = runtime.build_codes(freqs)
    assert native is not None
    lens, vals = native
    for i in range(freqs.shape[0]):
        py = codes_mod.build_codes(freqs[i])
        for s in range(256):
            assert lens[i, s] == len(py[s]), (i, s)
            if py[s]:
                assert int(vals[i, s]) >> (64 - len(py[s])) == int(py[s], 2)


def test_freq_roundtrip_matches_python_bytes():
    rng = np.random.default_rng(1)
    freqs = _random_freqs(rng, 50)
    sizes = rng.integers(1, 1 << 20, 50).astype(np.int64)
    for mode in "RN":
        native = runtime.write_freq(mode, sizes, freqs)
        buf = io.BytesIO()
        formats.write_freq(buf, mode, sizes.tolist(), freqs.tolist())
        assert native == buf.getvalue()
        # native parse of python bytes and vice versa
        parsed = runtime.parse_freq(buf.getvalue())
        assert parsed is not None
        pm, ps, pf = parsed
        assert pm == mode and (ps == sizes).all() and (pf == freqs).all()
        ff = formats.parse_freq(native)
        assert ff.mode == mode and ff.block_sizes == sizes.tolist()
        assert np.array_equal(np.asarray(ff.freqs), freqs)


def test_cod_roundtrip_matches_python_bytes():
    rng = np.random.default_rng(2)
    freqs = _random_freqs(rng, 50)
    tables = codes_mod.build_code_tables(freqs)
    sizes = rng.integers(1, 1 << 20, 50).astype(np.int64)
    native = runtime.write_cod("R", sizes, tables.lens, tables.vals)
    buf = io.BytesIO()
    formats.write_cod(buf, "R", sizes.tolist(), tables.to_strings())
    assert native == buf.getvalue()
    parsed = runtime.parse_cod(native)
    assert parsed is not None
    pm, ps, pl, pv = parsed
    assert pm == "R" and (ps == sizes).all()
    assert (pl == tables.lens).all() and (pv == tables.vals).all()


def test_parse_rejects_malformed():
    bad = [b"", b"@", b"@X@2", b"@R@", b"@R@1@5", b"@R@1@5@1;2", b"nope"]
    for b in bad:
        assert runtime.parse_freq(b) is None
        assert runtime.parse_cod(b) is None
    # good freq but wrong trailer
    buf = io.BytesIO()
    formats.write_freq(buf, "R", [3], [[1] * 256])
    good = buf.getvalue()
    assert runtime.parse_freq(good) is not None
    assert runtime.parse_freq(good[:-1]) is None
    assert runtime.parse_freq(good + b"x") is None


def test_parse_shaf_frames():
    payloads = [b"\x00\x01@@\xff", b"", b"@7@"]
    buf = io.BytesIO()
    formats.write_shaf_header(buf, len(payloads))
    for p in payloads:
        formats.write_shaf_block(buf, p)
    data = buf.getvalue()
    out = runtime.parse_shaf(data)
    assert out is not None
    offs, sizes = out
    got = [data[int(o):int(o) + int(s)] for o, s in zip(offs, sizes)]
    assert got == payloads
    assert runtime.parse_shaf(data + b"x") is None
    assert runtime.parse_shaf(data[:-1]) is None


def test_code_tables_row_strings_roundtrip():
    rng = np.random.default_rng(3)
    freqs = _random_freqs(rng, 20)
    tables = codes_mod.build_code_tables(freqs)
    for i in range(20):
        assert tables.row_strings(i) == codes_mod.build_codes(freqs[i])
    rebuilt = codes_mod.CodeTables.from_strings(tables.to_strings())
    assert (rebuilt.lens == tables.lens).all()
    assert (rebuilt.vals == tables.vals).all()
