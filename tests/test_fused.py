"""Fused device-resident chain vs sequential modules: byte-identical files.

compress_pipeline/fused_decode must produce exactly the bytes of module_f ->
module_t -> module_c (and module_d with the per-stage backend API); the
fused path only changes where intermediate streams live (device HBM vs
host), never the output (SURVEY.md §2.1 contract).
"""

import os

import numpy as np
import pytest

from shafa_tpu import pipeline
from shafa_tpu.device import JaxBackend
from shafa_tpu.pipeline import NumpyBackend

from corpus import mixed


def _files(d):
    return sorted(os.listdir(d))


def _run_compress(tmp, name, data, backend, fused, force_rle=False,
                  force_freq=False):
    sub = tmp / name
    sub.mkdir()
    path = str(sub / "data.bin")
    with open(path, "wb") as fp:
        fp.write(data)
    if fused:
        pipeline.compress_pipeline(path, force_rle, force_freq, 64 << 10,
                                   backend)
    else:
        p, _ = pipeline.module_f(path, force_rle, force_freq, 64 << 10,
                                 backend)
        p, _ = pipeline.module_t(p)
        pipeline.module_c(p, backend)
    return sub


@pytest.mark.parametrize("force_flags", [(False, False), (True, True)])
def test_fused_compress_matches_sequential(tmp_path, force_flags):
    data = mixed(300_000, seed=11)
    jb = JaxBackend()
    assert jb.supports_fused
    a = _run_compress(tmp_path, "fused", data, jb, True, *force_flags)
    b = _run_compress(tmp_path, "seq", data, NumpyBackend(), False,
                      *force_flags)
    assert _files(a) == _files(b)
    for f in _files(a):
        with open(a / f, "rb") as fa, open(b / f, "rb") as fb:
            assert fa.read() == fb.read(), f


def test_fused_compress_incompressible(tmp_path):
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, 200_000).astype(np.uint8).tobytes()
    a = _run_compress(tmp_path, "fused", data, JaxBackend(), True)
    b = _run_compress(tmp_path, "seq", data, NumpyBackend(), False)
    assert _files(a) == _files(b)  # N-mode: .freq + .cod + .shaf, no .rle
    for f in _files(a):
        with open(a / f, "rb") as fa, open(b / f, "rb") as fb:
            assert fa.read() == fb.read(), f


def test_fused_decode_roundtrip(tmp_path):
    data = mixed(400_000, seed=12)
    jb = JaxBackend()
    sub = _run_compress(tmp_path, "rt", data, jb, True)
    shaf = next(f for f in _files(sub) if f.endswith(".shaf"))
    out, _ = pipeline.module_d_shafa(str(sub / shaf),
                                     rle_decompression=".rle." in shaf,
                                     backend=jb)
    with open(out, "rb") as fp:
        assert fp.read() == data
