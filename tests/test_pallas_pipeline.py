"""Production Pallas emission path, cross-verified on CPU (interpret mode).

The TPU production pipeline routes RLE and pack emission through the Mosaic
kernel (kernels/emit_pallas.py). On CPU that path is normally disabled
(kernels/dispatch.py); these tests force it via SHAFA_TPU_EMIT=pallas in a
SUBPROCESS (the dispatch is cached per process) and check the produced
sidecars byte-identical to the default XLA path — the VERDICT-r2 gap of the
fused production chain having no cross-verification off-chip.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from corpus import mixed

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(path, env_emit, block="-b", bk="K"):
    env = dict(os.environ)
    env["SHAFA_TPU_EMIT"] = env_emit
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    r = subprocess.run(
        [sys.executable, "-m", "shafa_tpu", path, block, bk],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600)
    assert r.returncode == 0, r.stderr


@pytest.mark.parametrize("seed,size", [(11, 70_000), (12, 400_000)])
def test_pallas_vs_xla_sidecars(tmp_path, seed, size):
    data = mixed(size, seed=seed)
    pa = str(tmp_path / "a.bin")
    pb = str(tmp_path / "b.bin")
    for p in (pa, pb):
        with open(p, "wb") as fp:
            fp.write(data)
    _run(pa, "pallas")
    _run(pb, "xla")
    exts = [".rle", ".rle.freq", ".rle.cod", ".rle.shaf"]
    if not os.path.exists(pa + ".rle"):
        exts = [".freq", ".cod", ".shaf"]
    for ext in exts:
        with open(pa + ext, "rb") as fa, open(pb + ext, "rb") as fb:
            assert fa.read() == fb.read(), f"{ext} differs pallas vs xla"


def test_pallas_roundtrip(tmp_path):
    data = mixed(200_000, seed=13)
    p = str(tmp_path / "f.bin")
    with open(p, "wb") as fp:
        fp.write(data)
    _run(p, "pallas")
    shaf = next(str(tmp_path / f) for f in os.listdir(tmp_path)
                if f.endswith(".shaf"))
    os.rename(p, p + ".orig")
    _run(shaf, "pallas")
    with open(p, "rb") as fp:
        assert fp.read() == data
