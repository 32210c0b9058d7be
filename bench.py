"""Benchmark: compress throughput (modules F+T+C) on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric: **device-path encode throughput** — input blocks resident
in HBM, through RLE -> histogram -> (host) Shannon-Fano codes -> bit-pack ->
on-device compaction, output payload resident in HBM; the per-block
histograms/sizes coming to host and the code LUTs going to device (KB-scale)
are included, as is every device execution. This is the number that
scales with chips and is comparable with the reference's per-core compute
throughput (BASELINE.md: C ref compresses 100 MB in 1.204 s => 83.1 MB/s
e2e on 2 vCPUs); it is also what the >=1 GB/s/chip north star constrains.

The dev harness reaches its single TPU chip through a network relay whose
device->host link measures ~25-30 MB/s — two orders of magnitude below the
PCIe/DMA path of a production TPU host, and slower than the codec itself.
The full end-to-end wall time (file in, sidecar files out, through that
relay) is therefore reported on stderr, not as the headline.

A full pipeline round trip (compress + decompress + bit-compare) guards
correctness on every run.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import signal
import sys
import tempfile
import time

import numpy as np

def _enable_compile_cache() -> None:
    """Point jax's persistent compilation cache at the repo-local dir.

    Env vars are NOT enough here: the dev harness preloads jax from a
    sitecustomize before this file runs, so jax.config snapshots its env
    before we could set it. config.update works post-import. Every compile
    through the remote helper costs minutes; the cache turns reruns into
    local file reads."""
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


_enable_compile_cache()

BASELINE_MBPS = 83.1
SIZE = int(os.environ.get("SHAFA_BENCH_SIZE", 100 * 1000 * 1000))
#: decode corpus: throughput is batch-shape-independent, so a small corpus
#: measures the same number while keeping warm-up compiles inside the driver
#: budget (BENCH_r03/r04 timed out compiling against a 100 MB corpus)
DECODE_SIZE = int(os.environ.get("SHAFA_BENCH_DECODE_SIZE", 64 * 1000 * 1000))
BLOCK_SIZE = int(os.environ.get("SHAFA_BENCH_BLOCK", 8 << 20))
REPS = int(os.environ.get("SHAFA_BENCH_REPS", 3))
#: wall-clock budget: sections are skipped once exceeded so the JSON always
#: lands (the driver kills the process at an unknown deadline; rc=124 in
#: rounds 3 and 4 lost the decode number both times)
BUDGET = float(os.environ.get("SHAFA_BENCH_BUDGET", 1100))
_T0 = time.monotonic()


class SectionTimeout(Exception):
    pass


def _remaining() -> float:
    return BUDGET - (time.monotonic() - _T0)


@contextlib.contextmanager
def time_box(seconds: float, name: str):
    """SIGALRM-based box: a section that overruns raises SectionTimeout
    (caught by the caller) instead of eating the whole driver budget."""
    def handler(sig, frm):
        raise SectionTimeout(name)
    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(max(1, int(seconds)))
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def device_sync(x) -> None:
    """Force completion of a device value WITHOUT downloading it.

    Through the dev relay, jax.block_until_ready can return before the
    producing computation has actually run (observed: a (8, 8Mi) kernel
    "ready" in 0 ms whose 8 KB dependent download then took minutes). A
    4-byte dependent slice download is the reliable fence.
    """
    for leaf in __import__("jax").tree_util.tree_leaves(x):
        np.asarray(leaf.ravel()[:1] if hasattr(leaf, "ravel") else leaf)


def synthetic(n: int, seed: int = 0) -> bytes:
    """Mixed-entropy corpus: interleaved runs, text-ish bytes, noise."""
    rng = np.random.default_rng(seed)
    parts = []
    total = 0
    while total < n:
        kind = rng.integers(0, 3)
        ln = int(rng.integers(2000, 60000))
        if kind == 0:
            parts.append(np.full(ln, rng.integers(0, 256), np.uint8))
        elif kind == 1:
            parts.append(rng.integers(32, 127, ln).astype(np.uint8))
        else:
            parts.append(rng.integers(0, 256, ln).astype(np.uint8))
        total += ln
    return np.concatenate(parts)[:n].tobytes()


def e2e_roundtrip_check(data: bytes) -> float:
    """Full file->file compress via the real pipeline + decode + compare.
    Returns the e2e compress seconds (through the dev relay)."""
    from shafa_tpu import pipeline
    from shafa_tpu.device import JaxBackend
    backend = JaxBackend()
    work = tempfile.mkdtemp(prefix="shafa_bench_")
    try:
        path = os.path.join(work, "data.bin")
        with open(path, "wb") as fp:
            fp.write(data)
        t0 = time.perf_counter()
        shaf, (rf, rt, rc) = pipeline.compress_pipeline(
            path, False, False, BLOCK_SIZE, backend)
        dt = time.perf_counter() - t0
        print(f"e2e stages: F={rf.runtime_ms:.0f}ms T={rt.runtime_ms:.0f}ms "
              f"C={rc.runtime_ms:.0f}ms  e2e={dt:.2f}s "
              f"({len(data) / 1e6 / dt:.1f} MB/s through dev relay)",
              file=sys.stderr)
        os.rename(path, path + ".orig")
        out, _ = pipeline.module_d_shafa(shaf,
                                         rle_decompression=".rle." in shaf,
                                         backend=backend)
        with open(out, "rb") as fp:
            assert fp.read() == data, "round trip mismatch"
        print("round trip bit-exact", file=sys.stderr)
        return dt
    finally:
        shutil.rmtree(work, ignore_errors=True)


def device_encode_seconds(data: bytes) -> float:
    """Device-path F+T+C: blocks in HBM -> compacted .shaf payload in HBM.

    Emission runs through the production dispatch (kernels/dispatch.py):
    the Pallas/Mosaic kernel on TPU, XLA gathers elsewhere."""
    import jax
    import jax.numpy as jnp

    from shafa_tpu import codes as codes_mod
    from shafa_tpu import geometry
    from shafa_tpu.device import _bucket, _dl_bucket, \
        _row_bucket, _stack_blocks, MAX_BATCH_ELEMS
    from shafa_tpu.kernels import emit_pallas as kemit
    from shafa_tpu.kernels import histogram as khist
    from shafa_tpu.kernels import pack as kpack
    from shafa_tpu.kernels import rle as krle
    from shafa_tpu.kernels.dispatch import use_pallas_emit

    geo = geometry.geometry_for_size(len(data), BLOCK_SIZE)
    sizes = geo.sizes()
    raw = np.frombuffer(data, np.uint8)
    blocks, pos = [], 0
    for s in sizes:
        blocks.append(raw[pos:pos + s])
        pos += s
    p = _bucket(max(b.size for b in blocks))
    bsz = max(1, MAX_BATCH_ELEMS // p)
    batches = []
    for lo in range(0, len(blocks), bsz):
        rows = blocks[lo:lo + bsz]
        stacked, lens = _stack_blocks(rows, _row_bucket(len(rows), bsz))
        batches.append((jax.block_until_ready(jnp.asarray(stacked)),
                        jnp.asarray(lens), len(rows)))

    def run_once():
        outs = []
        for x, lens, n in batches:
            enc, enc_len = krle.rle_encode_batch(x, lens)
            hist = khist.histogram_batch(enc, enc_len)
            hists = np.asarray(hist)[:n].astype(np.int64)  # tiny download
            tables = codes_mod.build_code_tables(hists)    # host, native C++
            rows = x.shape[0]
            cl = np.zeros((rows, 256), np.int32)
            cv = np.zeros((rows, 256), np.uint32)
            assert int(tables.lens.max()) <= 32, \
                "code length > 32 bits: bench corpus must stay on fast path"
            cl[:n] = tables.lens.astype(np.int32)
            cv[:n] = (tables.vals >> np.uint64(32)).astype(np.uint32)
            if use_pallas_emit():
                full_hists = np.zeros((rows, 256), np.int64)
                full_hists[:n] = hists
                byte_lens = kpack.pack_byte_lens(full_hists, cl)
                woff, need = kemit.aligned_offsets(byte_lens)
                out_words = _dl_bucket(4 * need) // 4
                flat = kpack.pack_batch_pallas(
                    enc, enc_len, cl, cv, out_words, woff)
            else:
                flat, _plen = kpack.pack_batch_compact(
                    enc, enc_len, jnp.asarray(cl), jnp.asarray(cv),
                    _dl_bucket)
            outs.append(flat)
        device_sync(outs)
        return outs

    run_once()  # warm (compile)
    t0 = time.perf_counter()
    for _ in range(REPS):
        run_once()
    return (time.perf_counter() - t0) / REPS


def device_decode_seconds(data: bytes, on_rep=None) -> tuple[float, int]:
    """Device-path D: .shaf payloads in HBM -> decompressed bytes in HBM.

    Covers the full decode chain (SF prefix decode + RLE expand + compacted
    output; reference hot loops d.c:514-551 + d.c:116-197). Returns
    (seconds per run, decompressed output bytes). on_rep(secs) is called
    after EVERY timed rep so the first measurement survives a timeout."""
    import jax
    import jax.numpy as jnp

    from shafa_tpu import codes as codes_mod, geometry, oracle
    from shafa_tpu.device import _bucket, _dl_bucket, \
        _row_bucket, _stack_blocks, MAX_BATCH_ELEMS
    from shafa_tpu.kernels import decode as kdecode
    from shafa_tpu.kernels import rle as krle

    # produce the archive on HOST (numpy oracle — byte-identical to the
    # device encoder per the golden tests): keeps the decode section's
    # compile surface to the decode kernels only, which matters through
    # the remote compile helper (minutes per program on bad days)
    geo = geometry.geometry_for_size(len(data), BLOCK_SIZE)
    raw = np.frombuffer(data, np.uint8)
    blocks, pos = [], 0
    for s in geo.sizes():
        blocks.append(raw[pos:pos + s])
        pos += s
    import concurrent.futures as cf
    with cf.ThreadPoolExecutor() as ex:  # numpy releases the GIL
        enc_blocks = list(ex.map(oracle.rle_encode, blocks))
        hists = np.stack(list(ex.map(oracle.histogram, enc_blocks))) \
            .astype(np.int64)
        tables = codes_mod.build_code_tables(hists)
        payloads = list(ex.map(
            lambda ie: oracle.pack(ie[1], tables.lens[ie[0]],
                                   tables.vals[ie[0]]),
            enumerate(enc_blocks)))
    counts = [e.size for e in enc_blocks]

    pblocks = [np.frombuffer(p, np.uint8) for p in payloads]
    p = _bucket(max(b.size for b in pblocks), minimum=1024)
    bsz = max(1, MAX_BATCH_ELEMS // (p * 2))  # match device.py's decode cap
    max_len = int(tables.lens.max())  # real FSM state count, not 32
    tab_all = kdecode.decode_tables_batch(tables.lens, tables.vals)
    batches = []
    for lo in range(0, len(pblocks), bsz):
        rows = pblocks[lo:lo + bsz]
        nb = len(rows)
        b_rows = _row_bucket(nb, bsz)
        stacked, plens = _stack_blocks(rows, b_rows)
        cts = np.zeros(b_rows, np.int32)
        cts[:nb] = counts[lo:lo + nb]
        tab = {}
        for k, v in tab_all.items():
            pad = np.zeros((b_rows,) + v.shape[1:], v.dtype)
            pad[:nb] = v[lo:lo + nb]
            if b_rows > nb:
                pad[nb:] = v[lo:lo + 1]
            tab[k] = pad
        batches.append((jax.block_until_ready(jnp.asarray(stacked)),
                        jnp.asarray(plens), tab, jnp.asarray(cts), nb))
    out_p = _bucket(max(counts))

    from shafa_tpu.kernels import expand_pallas as kexpand
    from shafa_tpu.kernels.dispatch import use_pallas_emit

    def run_once():
        outs = []
        for stacked, plens, tab, cts, nb in batches:
            dec, _under = kdecode.decode_batch(stacked, plens, tab, cts,
                                               out_p=out_p, max_len=max_len)
            if use_pallas_emit():
                prep = kexpand.rle_expand_prep(dec, cts)
                sizes = np.asarray(prep["out_len"]).copy()
                sizes[nb:] = 0
                flat = krle.rle_expand_compact_prepped(
                    prep, out_sz=_dl_bucket(int(sizes.sum())),
                    out_p=_bucket(int(max(sizes.max(), 1)), minimum=2048))
            else:
                sizes = np.asarray(krle.rle_expand_sizes(dec, cts)).copy()
                sizes[nb:] = 0
                flat = krle.rle_expand_compact(
                    dec, cts, out_sz=_dl_bucket(int(sizes.sum())),
                    out_p=_bucket(int(max(sizes.max(), 1)), minimum=2048))
            outs.append(flat)
        device_sync(outs)
        return outs

    run_once()  # warm (compile)
    best = None
    for _ in range(REPS):
        t0 = time.perf_counter()
        run_once()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        if on_rep is not None:
            on_rep(best)
    return best, len(data)


def emit_json(mbps: float, extra: dict) -> None:
    """The driver-parsed line. Printed right after the encode measurement
    and RE-printed (a superset) after each later section, so the headline
    survives even if a later section hangs or is killed (BENCH_r03 recorded
    nothing because the JSON only printed at the very end)."""
    print(json.dumps({
        "metric": "encode_throughput_device",
        "value": round(mbps, 2),
        "unit": "MB/s",
        "vs_baseline": round(mbps / BASELINE_MBPS, 2),
        **extra,
    }), flush=True)


def main() -> None:
    data = synthetic(SIZE)
    extra = {}
    # virtual-mesh scaling table recorded by bench_scaling.py (sharding-
    # overhead validation on the CPU substrate — docs/SCALING_r05.json);
    # carried into the bench JSON so the evidence lands with the numbers.
    rec = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "docs", "SCALING_r05.json")
    if os.path.isfile(rec):
        try:
            with open(rec) as fp:
                extra["scaling_recorded"] = json.load(fp)
        except Exception:
            pass

    # 1. headline FIRST — everything else is additive
    dt = device_encode_seconds(data)
    mbps = SIZE / 1e6 / dt
    print(f"device encode: {dt:.3f}s = {mbps:.1f} MB/s", file=sys.stderr)
    emit_json(mbps, extra)

    # 2. device decode throughput (time-boxed; the first rep's number is
    # emitted immediately and refined by later reps)
    if os.environ.get("SHAFA_BENCH_DECODE", "1") != "0" and _remaining() > 30:
        ddata = data[:DECODE_SIZE]

        def on_rep(secs):
            dmbps = len(ddata) / 1e6 / secs
            extra["decode_mb_s"] = round(dmbps, 2)
            extra["decode_vs_c_ref"] = round(dmbps / 86.0, 2)
            emit_json(mbps, extra)

        try:
            with time_box(_remaining() - 20, "decode"):
                ddt, out_bytes = device_decode_seconds(ddata, on_rep)
            print(f"device decode: {ddt:.3f}s = "
                  f"{out_bytes / 1e6 / ddt:.1f} MB/s out "
                  f"(C ref: 86 MB/s)", file=sys.stderr)
        except SectionTimeout:
            print("decode section timed out; keeping best rep so far",
                  file=sys.stderr)

    # 3. correctness guard: full file->file round trip through the CLI
    # pipeline (includes the slow dev-relay transfers, so a smaller corpus)
    e2e_size = int(os.environ.get("SHAFA_BENCH_E2E_SIZE",
                                  min(SIZE, 16 * 1000 * 1000)))
    if _remaining() > 60:
        try:
            with time_box(_remaining() - 15, "e2e"):
                t0 = time.perf_counter()
                e2e_roundtrip_check(data[:e2e_size])
                print(f"e2e+roundtrip ({e2e_size / 1e6:.0f} MB): "
                      f"{time.perf_counter() - t0:.2f}s", file=sys.stderr)
                extra["roundtrip_bit_exact"] = True
                emit_json(mbps, extra)
        except SectionTimeout:
            print("e2e section timed out (dev-relay transfers)",
                  file=sys.stderr)

    # 3.5 streaming-overlap ratio: bounded-RSS streaming compress (file ->
    # .rle/.freq/.cod/.shaf on disk, read-ahead/write-behind) vs the pure
    # device encode rate measured in section 1. Page-cached input file, so
    # the ratio isolates pipeline/IO overlap quality, not disk speed.
    if os.environ.get("SHAFA_BENCH_STREAM", "1") != "0" and _remaining() > 60:
        try:
            with time_box(_remaining() - 15, "streaming"):
                from shafa_tpu import pipeline
                from shafa_tpu.device import JaxBackend
                work = tempfile.mkdtemp(prefix="shafa_stream_")
                try:
                    spath = os.path.join(work, "s.bin")
                    with open(spath, "wb") as fp:
                        fp.write(data)
                    backend = JaxBackend()
                    old_thr = pipeline.STREAM_THRESHOLD
                    pipeline.STREAM_THRESHOLD = 1  # force streaming tier
                    try:
                        t0 = time.perf_counter()
                        pipeline.compress_pipeline_streaming(
                            spath, False, False, BLOCK_SIZE, backend)
                        sdt = time.perf_counter() - t0
                    finally:
                        pipeline.STREAM_THRESHOLD = old_thr
                    smbps = SIZE / 1e6 / sdt
                    extra["streaming_e2e_mb_s"] = round(smbps, 2)
                    extra["streaming_vs_device"] = round(smbps / mbps, 2)
                    # context for the ratio: streaming writes sidecar BYTES
                    # through the dev harness's ~25-30 MB/s device->host
                    # relay; a production host-attached chip has a PCIe/DMA
                    # path two orders faster, where the >=70% overlap
                    # criterion applies (pipeline.py _Overlap).
                    extra["streaming_note"] = "dev-relay downlink bound"
                    print(f"streaming e2e: {sdt:.2f}s = {smbps:.1f} MB/s "
                          f"({100 * smbps / mbps:.0f}% of device rate)",
                          file=sys.stderr)
                finally:
                    shutil.rmtree(work, ignore_errors=True)
                emit_json(mbps, extra)
        except SectionTimeout:
            print("streaming section timed out", file=sys.stderr)

    # 4. scaling harness: opt-in only (costs minutes of subprocess compiles
    # on a virtual-CPU substrate — validates sharding overhead, not speed)
    if os.environ.get("SHAFA_BENCH_SCALING", "0") != "0" and _remaining() > 60:
        try:
            with time_box(_remaining() - 15, "scaling"):
                import bench_scaling
                extra["scaling"] = bench_scaling.parent()
                print(f"scaling: {extra['scaling']}", file=sys.stderr)
        except SectionTimeout:
            print("scaling harness timed out", file=sys.stderr)
        except Exception as e:  # never fail the headline on the harness
            print(f"scaling harness failed: {e}", file=sys.stderr)
        emit_json(mbps, extra)


if __name__ == "__main__":
    main()
