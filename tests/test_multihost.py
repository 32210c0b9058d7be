"""Multi-host partition/splice machinery, simulated in one process.

Each simulated host runs compress_multihost / decompress_multihost in its
own thread with a barrier-backed Comm — the very code path a pod process
runs, with the DCN allgather replaced by a thread rendezvous. The invariant
(SURVEY.md §4 'Distributed level'): output files are byte-identical to the
single-host pipeline for every host count.
"""

import os
import threading

import numpy as np
import pytest

from shafa_tpu import multihost, pipeline
from shafa_tpu.device import JaxBackend

from corpus import mixed


class ThreadComm(multihost.Comm):
    """N simulated hosts in one process; allgather = barrier + concat."""

    def __init__(self, state, index):
        self._state = state
        self._index = index

    @property
    def index(self):
        return self._index

    @property
    def count(self):
        return self._state["count"]

    def allgather(self, local):
        st = self._state
        st["slots"][self._index] = np.asarray(local)
        st["barrier"].wait()
        out = np.concatenate(st["slots"], axis=0)
        st["barrier"].wait()  # don't reuse slots before everyone read
        return out


def _run_hosts(hosts, fn):
    state = {"count": hosts, "slots": [None] * hosts,
             "barrier": threading.Barrier(hosts)}
    errs = []

    def run(pi):
        try:
            fn(ThreadComm(state, pi))
        except BaseException as e:  # noqa: BLE001 - surface to main thread
            errs.append(e)
            state["barrier"].abort()

    threads = [threading.Thread(target=run, args=(pi,))
               for pi in range(hosts)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errs:
        raise errs[0]


def _compress_single(tmp, data, block_size):
    sub = tmp / "single"
    sub.mkdir()
    path = str(sub / "data.bin")
    with open(path, "wb") as fp:
        fp.write(data)
    pipeline.compress_pipeline(path, False, False, block_size, JaxBackend())
    return sub


def _compress_multi(tmp, data, block_size, hosts):
    sub = tmp / f"multi{hosts}"
    sub.mkdir()
    path = str(sub / "data.bin")
    with open(path, "wb") as fp:
        fp.write(data)
    backend = JaxBackend()
    _run_hosts(hosts, lambda comm: multihost.compress_multihost(
        path, block_size, backend, comm=comm))
    return sub


def _assert_same_files(a, b):
    files = sorted(os.listdir(a))
    assert sorted(os.listdir(b)) == files
    for f in files:
        with open(a / f, "rb") as fa, open(b / f, "rb") as fb:
            assert fa.read() == fb.read(), f


@pytest.mark.parametrize("hosts", [1, 2, 3])
def test_multihost_compress_matches_single(tmp_path, hosts):
    data = mixed(300_000, seed=21)
    bs = 32 << 10  # 10 blocks
    a = _compress_single(tmp_path, data, bs)
    b = _compress_multi(tmp_path, data, bs, hosts)
    _assert_same_files(a, b)


@pytest.mark.parametrize("hosts", [2, 4])
def test_multihost_roundtrip(tmp_path, hosts):
    data = mixed(250_000, seed=22)
    sub = _compress_multi(tmp_path, data, 32 << 10, hosts)
    shaf = next(f for f in sorted(os.listdir(sub)) if f.endswith(".shaf"))
    backend = JaxBackend()
    outs = []
    _run_hosts(hosts, lambda comm: outs.append(
        multihost.decompress_multihost(str(sub / shaf), backend, comm=comm)))
    with open(outs[0], "rb") as fp:
        assert fp.read() == data


def test_multihost_incompressible_n_mode(tmp_path):
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, 150_000).astype(np.uint8).tobytes()
    a = _compress_single(tmp_path, data, 32 << 10)
    b = _compress_multi(tmp_path, data, 32 << 10, 2)
    _assert_same_files(a, b)


def test_partition_properties():
    for n in (1, 7, 64, 1000):
        for h in (1, 2, 5, 16):
            ranges = [multihost.partition_blocks(n, h, i) for i in range(h)]
            assert ranges[0].lo == 0 and ranges[-1].hi == n
            for a, b in zip(ranges, ranges[1:]):
                assert a.hi == b.lo  # contiguous, ordered
            assert max(r.n for r in ranges) - min(r.n for r in ranges) <= 1


def test_stale_file_truncated(tmp_path):
    data = mixed(200_000, seed=23)
    sub = _compress_multi(tmp_path, data, 32 << 10, 2)
    shaf = next(f for f in sorted(os.listdir(sub)) if f.endswith(".shaf"))
    good = (sub / shaf).read_bytes()
    # corrupt with trailing garbage, recompress: must be truncated back
    with open(sub / shaf, "ab") as fp:
        fp.write(b"garbage")
    backend = JaxBackend()
    _run_hosts(2, lambda comm: multihost.compress_multihost(
        str(sub / "data.bin"), 32 << 10, backend, comm=comm))
    assert (sub / shaf).read_bytes() == good


def test_scan_shaf_offsets_many_frames(tmp_path):
    # Buffered header scan: thousands of frames spanning chunk boundaries,
    # plus one frame larger than the scan chunk (header-sized refill path).
    rng = np.random.default_rng(29)
    n = 3000
    sizes = rng.integers(1, 900, n).astype(np.int64)
    sizes[1234] = (1 << 20) + 7777  # > _SCAN_CHUNK
    path = str(tmp_path / "many.shaf")
    offs_true = np.zeros(n, np.int64)
    with open(path, "wb") as fp:
        fp.write(f"@{n}".encode())
        for i, s in enumerate(sizes):
            fp.write(f"@{int(s)}@".encode())
            offs_true[i] = fp.tell()
            fp.write(b"\xab" * int(s))
    offs, got_sizes, got_n = multihost.scan_shaf_offsets(path)
    assert got_n == n
    np.testing.assert_array_equal(got_sizes, sizes)
    np.testing.assert_array_equal(offs, offs_true)
