"""Foreign (hand-edited) .cod robustness: the rank decoder assumes a
COMPLETE code set; incomplete tables must take the trie-semantics slow
path — decoding correctly when the stream avoids the gaps and failing
loudly (like the reference's NULL-child check, d.c:534) when it hits one —
never silently emitting garbage."""

import io
import os

import numpy as np
import pytest

from shafa_tpu import formats, pipeline
from shafa_tpu.device import JaxBackend, _kraft_complete
from shafa_tpu.errors import FileUnrecognizableError


def _incomplete_codes():
    """Codes {A: '00', B: '01'} — Kraft sum 1/2; windows starting '1' are
    a gap."""
    codes = [""] * 256
    codes[ord("A")] = "00"
    codes[ord("B")] = "01"
    return codes


def _pack_bits(bits: str) -> bytes:
    out = bytearray()
    for i in range(0, len(bits), 8):
        byte = bits[i:i + 8].ljust(8, "0")
        out.append(int(byte, 2))
    return bytes(out)


def _write_archive(tmp_path, codes, payload_bits, out_count):
    base = str(tmp_path / "f.bin")
    cod = base + ".cod"
    shaf = base + ".shaf"
    with open(cod, "wb") as fp:
        formats.write_cod(fp, "N", [out_count], [codes])
    payload = _pack_bits(payload_bits)
    with open(shaf, "wb") as fp:
        formats.write_shaf_header(fp, 1)
        formats.write_shaf_block(fp, payload)
    return shaf


def test_kraft_helper():
    lens = np.zeros((3, 256), np.uint8)
    lens[0, 0] = 1
    lens[0, 1] = 1                      # {0,1}: complete
    lens[1, 0] = 2
    lens[1, 1] = 2                      # kraft 1/2: incomplete
    lens[2, 0] = 1
    lens[2, 1] = 2
    lens[2, 2] = 2                      # 1/2+1/4+1/4: complete
    assert list(_kraft_complete(lens)) == [True, False, True]


def test_incomplete_cod_consistent_stream_decodes(tmp_path):
    # stream 'AABB' = 00 00 01 01 — never enters the gap
    shaf = _write_archive(tmp_path, _incomplete_codes(), "00000101", 4)
    out, rep = pipeline.module_d_shafa(shaf, rle_decompression=False,
                                       backend=JaxBackend())
    with open(out, "rb") as fp:
        assert fp.read() == b"AABB"


def test_incomplete_cod_gap_fails_loudly(tmp_path):
    # third code starts '1' — a trie NULL child; the reference errors with
    # _FILE_UNRECOGNIZABLE (d.c:534). Must NOT silently decode garbage.
    shaf = _write_archive(tmp_path, _incomplete_codes(), "00011", 3)
    with pytest.raises(FileUnrecognizableError):
        pipeline.module_d_shafa(shaf, rle_decompression=False,
                                backend=JaxBackend())
