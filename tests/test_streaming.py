"""Streaming (bounded-RSS) fused pipeline: byte-identity vs the resident
path, both RLE and N modes, ragged tails, and resumable sidecars."""

import os

import numpy as np
import pytest

from corpus import mixed

from shafa_tpu import pipeline
from shafa_tpu.device import JaxBackend


def _write(tmp, name, data):
    p = str(tmp / name)
    with open(p, "wb") as fp:
        fp.write(data)
    return p


@pytest.mark.parametrize("seed,size,force_freq", [
    (31, 700_000, False),        # R mode, ragged tail
    (32, 512 * 1024, True),      # exact block multiple + -c f
])
def test_streaming_matches_resident(tmp_path, monkeypatch, seed, size,
                                    force_freq):
    data = mixed(size, seed=seed)
    pa = _write(tmp_path, "stream.bin", data)
    pb = _write(tmp_path, "resident.bin", data)
    backend = JaxBackend()
    block = 64 << 10

    monkeypatch.setattr(pipeline, "STREAM_THRESHOLD", 100_000)
    shaf_a, reps = pipeline.compress_pipeline(pa, False, force_freq, block,
                                              backend)
    assert reps[0].extra.get("streaming") is True
    monkeypatch.setattr(pipeline, "STREAM_THRESHOLD", 1 << 60)
    shaf_b, _ = pipeline.compress_pipeline(pb, False, force_freq, block,
                                           backend)

    exts = sorted(f.split("stream.bin")[1] for f in os.listdir(tmp_path)
                  if f.startswith("stream.bin") and f != "stream.bin")
    assert exts == sorted(f.split("resident.bin")[1]
                          for f in os.listdir(tmp_path)
                          if f.startswith("resident.bin")
                          and f != "resident.bin")
    for ext in exts:
        with open(pa + ext, "rb") as fa, open(pb + ext, "rb") as fb:
            assert fa.read() == fb.read(), f"{ext}: streaming != resident"

    # roundtrip through the normal decoder
    os.rename(pa, pa + ".orig")
    out, _ = pipeline.module_d_shafa(shaf_a,
                                     rle_decompression=".rle." in shaf_a,
                                     backend=backend)
    with open(out, "rb") as fp:
        assert fp.read() == data


@pytest.mark.parametrize("seed,size,rle", [
    (41, 700_000, True),         # R mode: decode + expand, ragged tail
    (42, 512 * 1024, True),      # exact block multiple
])
def test_streaming_decode_matches_resident(tmp_path, monkeypatch, seed,
                                           size, rle):
    data = mixed(size, seed=seed)
    p = _write(tmp_path, "data.bin", data)
    backend = JaxBackend()
    shaf, _ = pipeline.compress_pipeline(p, rle, False, 64 << 10, backend)
    os.rename(p, p + ".orig")

    # resident decode
    monkeypatch.setattr(pipeline, "STREAM_THRESHOLD", 1 << 60)
    out, rep = pipeline.module_d_shafa(shaf, rle_decompression=rle,
                                       backend=backend)
    assert "streaming" not in rep.extra
    with open(out, "rb") as fp:
        assert fp.read() == data
    os.unlink(out)

    # streaming decode (threshold forced below the archive size; batch
    # size shrunk so the loop really iterates)
    from shafa_tpu import device
    monkeypatch.setattr(pipeline, "STREAM_THRESHOLD", 1024)
    monkeypatch.setattr(device, "MAX_BATCH_ELEMS", (64 << 10) * 8 * 2)
    out2, rep2 = pipeline.module_d_shafa(shaf, rle_decompression=rle,
                                         backend=backend)
    assert rep2.extra.get("streaming") is True
    assert rep2.sizes_after == rep.sizes_after
    with open(out2, "rb") as fp:
        assert fp.read() == data


def test_streaming_rle_only_decode(tmp_path, monkeypatch):
    # RLE-only decode (-d r): the bounded streaming path must match the
    # resident path byte-for-byte (reference one-block-resident d.c:322-352)
    data = mixed(700_000, seed=47)
    p = _write(tmp_path, "ronly.bin", data)
    backend = JaxBackend()
    pipeline.module_f(p, True, False, 64 << 10, backend)  # -c r: .rle+.freq
    rle_path = p + ".rle"

    monkeypatch.setattr(pipeline, "STREAM_THRESHOLD", 1 << 60)
    out, rep = pipeline.module_d_rle(rle_path, backend)
    assert "streaming" not in rep.extra
    with open(out, "rb") as fp:
        assert fp.read() == data
    os.unlink(out)

    from shafa_tpu import device
    monkeypatch.setattr(pipeline, "STREAM_THRESHOLD", 1024)
    monkeypatch.setattr(device, "MAX_BATCH_ELEMS", (64 << 10) * 8 * 2)
    out2, rep2 = pipeline.module_d_rle(rle_path, backend)
    assert rep2.extra.get("streaming") is True
    assert rep2.sizes_after == rep.sizes_after
    with open(out2, "rb") as fp:
        assert fp.read() == data


def test_streaming_decode_frame_count_mismatch(tmp_path, monkeypatch):
    data = mixed(300_000, seed=43)
    p = _write(tmp_path, "data.bin", data)
    backend = JaxBackend()
    shaf, _ = pipeline.compress_pipeline(p, True, False, 64 << 10, backend)
    os.rename(p, p + ".orig")
    # append a forged extra frame: streaming decode must reject it
    with open(shaf, "ab") as fp:
        fp.write(b"@3@xyz")
    monkeypatch.setattr(pipeline, "STREAM_THRESHOLD", 1024)
    from shafa_tpu.errors import FileUnrecognizableError
    with pytest.raises(FileUnrecognizableError):
        pipeline.module_d_shafa(shaf, rle_decompression=True,
                                backend=backend)


def test_streaming_resume_after_crash(tmp_path, monkeypatch):
    """Block-level restart (SURVEY §5.3): kill the run mid-stream, rerun,
    and get byte-identical outputs without re-encoding completed batches."""
    data = mixed(700_000, seed=51)
    pa = _write(tmp_path, "crash.bin", data)
    pb = _write(tmp_path, "clean.bin", data)
    block = 64 << 10
    monkeypatch.setattr(pipeline, "STREAM_THRESHOLD", 1024)
    from shafa_tpu import device
    monkeypatch.setattr(device, "MAX_BATCH_ELEMS", block * 2)

    class Crashing(JaxBackend):
        calls = 0

        def fused_encode(self, blocks):
            Crashing.calls += 1
            if Crashing.calls == 3:
                raise RuntimeError("injected crash")
            return super().fused_encode(blocks)

    with pytest.raises(RuntimeError, match="injected crash"):
        pipeline.compress_pipeline(pa, False, False, block, Crashing())
    assert os.path.exists(pa + ".rle.progress")  # restart state retained

    encoded = []

    class Counting(JaxBackend):
        def fused_encode(self, blocks):
            encoded.append(len(blocks))
            return super().fused_encode(blocks)

    shaf_a, _ = pipeline.compress_pipeline(pa, False, False, block,
                                           Counting())
    resumed_batches = len(encoded)
    shaf_b, _ = pipeline.compress_pipeline(pb, False, False, block,
                                           JaxBackend())
    assert not os.path.exists(pa + ".rle.progress")  # cleared on success
    for ext in (".rle", ".rle.freq", ".rle.cod", ".rle.shaf"):
        with open(pa + ext, "rb") as fa, open(pb + ext, "rb") as fb:
            assert fa.read() == fb.read(), f"{ext}: resumed != clean"
    # the resumed run skipped the 2 durably-completed batches
    n_batches = -(-pipeline.geometry.geometry_for_file(
        pb, block).n_blocks // 2)
    assert resumed_batches == n_batches - 2


def test_streaming_incompressible_n_mode(tmp_path, monkeypatch):
    rng = np.random.default_rng(33)
    data = rng.integers(0, 256, 300_000, dtype=np.uint8).tobytes()
    p = _write(tmp_path, "noise.bin", data)
    backend = JaxBackend()
    monkeypatch.setattr(pipeline, "STREAM_THRESHOLD", 100_000)
    shaf, reps = pipeline.compress_pipeline(p, False, False, 64 << 10,
                                            backend)
    assert not reps[0].extra["compress_rle"]
    assert not os.path.exists(p + ".rle")
    os.rename(p, p + ".orig")
    out, _ = pipeline.module_d_shafa(shaf, rle_decompression=False,
                                     backend=backend)
    with open(out, "rb") as fp:
        assert fp.read() == data
