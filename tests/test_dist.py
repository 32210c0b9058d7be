"""Multi-device sharding tests over the 8-device virtual CPU mesh.

The cross-device invariant (SURVEY.md §4 'Distributed level'): the same
archive bytes must be produced for 1 device and N devices — block ordering
is deterministic from the sharding, matching the reference's ordered-write
guarantee (multithread.c:79).
"""

import numpy as np
import pytest

import jax

from shafa_tpu import codes as codes_mod
from shafa_tpu.device import JaxBackend
from shafa_tpu.dist import block_mesh

from corpus import mixed

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device (virtual CPU mesh)")


def _blocks(n=20, bs=4096, seed=7):
    data = mixed(n * bs - 1234, seed)
    return [np.frombuffer(data[i:i + bs], np.uint8)
            for i in range(0, len(data), bs)]


def test_sharded_matches_single_device():
    blocks = _blocks()
    single = JaxBackend()
    multi = JaxBackend(mesh=block_mesh())

    r1 = single.rle_encode(blocks)
    r2 = multi.rle_encode(blocks)
    for a, b in zip(r1, r2):
        assert (a == b).all()

    h1 = single.histogram(r1)
    h2 = multi.histogram(r2)
    for a, b in zip(h1, h2):
        assert (a == b).all()

    tables = codes_mod.build_code_tables(np.stack(h1))
    p1 = single.pack(r1, tables)
    p2 = multi.pack(r2, tables)
    assert p1 == p2

    d2 = multi.unpack(p2, tables, [b.size for b in r1])
    for a, b in zip(d2, r1):
        assert (a == b).all()

    e2 = multi.rle_expand(d2)
    assert b"".join(e.tobytes() for e in e2) == b"".join(
        b.tobytes() for b in blocks)


def test_mesh_fused_pipeline_matches_single(tmp_path):
    """The FUSED mesh path (fused_encode/fused_pack with per-shard
    compaction) must produce byte-identical sidecars vs single-device."""
    import os

    from shafa_tpu import pipeline
    data = mixed(300_000, seed=9)
    pa = str(tmp_path / "mesh.bin")
    pb = str(tmp_path / "single.bin")
    for p in (pa, pb):
        with open(p, "wb") as fp:
            fp.write(data)
    shaf_a, _ = pipeline.compress_pipeline(
        pa, False, False, 16 << 10, JaxBackend(mesh=block_mesh()))
    shaf_b, _ = pipeline.compress_pipeline(
        pb, False, False, 16 << 10, JaxBackend())
    for ext in (".rle", ".rle.freq", ".rle.cod", ".rle.shaf"):
        with open(pa + ext, "rb") as fa, open(pb + ext, "rb") as fb:
            assert fa.read() == fb.read(), f"{ext}: mesh != single"
    # roundtrip through the mesh decoder
    os.rename(pa, pa + ".orig")
    out, _ = pipeline.module_d_shafa(shaf_a, rle_decompression=True,
                                     backend=JaxBackend(mesh=block_mesh()))
    with open(out, "rb") as fp:
        assert fp.read() == data


def test_sharded_nondivisible_block_count():
    """B not divisible by mesh size exercises the padding rows."""
    blocks = _blocks(n=11)
    multi = JaxBackend(mesh=block_mesh())
    single = JaxBackend()
    h1 = single.histogram(blocks)
    h2 = multi.histogram(blocks)
    for a, b in zip(h1, h2):
        assert (a == b).all()
    tables = codes_mod.build_code_tables(np.stack(h1))
    assert single.pack(blocks, tables) == multi.pack(blocks, tables)
