"""Decode-chain microbenchmark: where do the 27 s of device decode go?

Times each stage of the decode path (stage1 rank, stage2 FSM scan + Pallas
emission, RLE expand sizes, expand compact) plus targeted microbenches
(gather rate, FSM scan alone) with device-resident inputs. Run on the real
chip:

    python bench_decode_stages.py [total_bytes] [block_bytes]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

# env vars alone don't work here: the dev harness preloads jax via a
# sitecustomize before this file runs (see bench.py), so set via config too
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 64 << 20
BLOCK = int(sys.argv[2]) if len(sys.argv) > 2 else 8 << 20
REPS = int(os.environ.get("SHAFA_BENCH_REPS", 3))


def synthetic(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    parts, total = [], 0
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
    return np.concatenate(parts)[:n]


def timeit(name: str, fn, nbytes: int, reps: int = REPS):
    import jax

    def force(out):
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])

    t0 = time.perf_counter()
    force(fn())  # warm/compile
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        force(fn())
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt * 1e3:9.2f} ms   {nbytes / dt / 1e9:8.2f} GB/s"
          f"   (compile+first {tc:.1f}s)", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from shafa_tpu import codes as codes_mod
    from shafa_tpu.device import _bucket, _dl_bucket, _stack_blocks
    from shafa_tpu.kernels import decode as kdecode
    from shafa_tpu.kernels import histogram as khist
    from shafa_tpu.kernels import pack as kpack
    from shafa_tpu.kernels import rle as krle

    print(f"devices: {jax.devices()}", flush=True)
    raw = synthetic(SIZE)
    blocks = [raw[i:i + BLOCK] for i in range(0, SIZE, BLOCK)]
    stacked, lens = _stack_blocks(blocks)
    b, p = stacked.shape
    print(f"batch: {b} blocks x {p} bytes padded ({SIZE / 1e6:.0f} MB)",
          flush=True)

    # (gather rate measured once: 16M random i32 gathers = 202 ms = 83
    # Melem/s on v5e — the per-output-byte searchsorted emission's cost model)

    # --- build the decode inputs on HOST (numpy oracle): skips ~25 min of
    # encode-kernel compiles through the remote compile helper --------------
    from shafa_tpu import oracle
    enc_blocks = [oracle.rle_encode(blk) for blk in blocks]
    hist = np.stack([oracle.histogram(e) for e in enc_blocks]).astype(np.int64)
    tables = codes_mod.build_code_tables(hist)
    max_len = int(tables.lens.max())
    print(f"max code len: {max_len}", flush=True)
    payloads = [np.frombuffer(
        oracle.pack(e, tables.lens[i], tables.vals[i]), np.uint8)
        for i, e in enumerate(enc_blocks)]
    enc_len = np.array([e.size for e in enc_blocks], np.int32)
    packed_bytes = sum(p.size for p in payloads)
    enc_bytes = int(enc_len.sum())
    print(f"rle {enc_bytes / 1e6:.1f} MB -> packed {packed_bytes / 1e6:.1f} MB",
          flush=True)
    pstacked, plens2 = _stack_blocks(payloads)
    py = jax.block_until_ready(jnp.asarray(pstacked))
    pl2 = jnp.asarray(plens2)
    counts = np.asarray(enc_len, np.int32)
    ctsj = jnp.asarray(counts)
    tab = kdecode.decode_tables_batch(tables.lens, tables.vals)
    tabj = {k: jax.block_until_ready(jnp.asarray(v)) for k, v in tab.items()}
    out_p = _bucket(int(counts.max()))

    s_real = 8 if max_len <= 8 else (16 if max_len <= 16 else 32)
    stride_bytes = max(out_p, 512)
    if os.environ.get("SHAFA_BENCH_V3", "0") != "0":
        # legacy XLA stage1 + v3 scan (the >16-bit-code fallback path)
        timeit("decode_stage1 (xla)", lambda: kdecode._stage1_jit(py, tabj),
               packed_bytes)
        ln_, sym_ = kdecode._stage1_jit(py, tabj)
        jax.block_until_ready(ln_)
        for s in sorted({s_real, 32}):
            timeit(f"decode_stage2_scan S={s}",
                   lambda s=s: kdecode._stage2_scan_jit(
                       ln_, sym_, pl2, ctsj,
                       stride_words=stride_bytes // 4, s_states=s),
                   enc_bytes)

    # production decoded output for the expand stages below
    from shafa_tpu.device import _decode_step
    dec, _u = _decode_step()(py, pl2, tabj, ctsj, out_p=out_p,
                             max_len=max_len)
    jax.block_until_ready(dec)

    # --- fused v4 chain stages (production path for <=16-bit codes) --------
    if max_len <= 16 and pstacked.shape[1] % 1024 == 0:
        b2, p2 = pstacked.shape
        s_real2 = 8 if max_len <= 8 else 16
        piv16, ncodes, ftab = kdecode.rank_tables(tab)
        pivj = jnp.asarray(piv16)
        ncj = jnp.asarray(ncodes)
        ftj = jnp.asarray(ftab)
        timeit("windows32 (xla)",
               lambda: kdecode.windows32_bytes(py), packed_bytes)
        w32 = jax.block_until_ready(kdecode.windows32_bytes(py))
        timeit("rank_planes (pallas)",
               lambda: kdecode.rank_planes_pallas(w32, pivj, ncj, ftj),
               packed_bytes)
        ls8 = jax.block_until_ready(
            kdecode.rank_planes_pallas(w32, pivj, ncj, ftj))

        import functools

        @functools.partial(jax.jit, static_argnames=("s_states",))
        def fsm_only(ls, plens, cts, s_states):
            return kdecode._stage2_chain_ls(ls, b2, p2, plens, cts, s_states)

        timeit(f"fsm_v4 (pallas) S={s_real2}",
               lambda: fsm_only(ls8, pl2, ctsj, s_states=s_real2),
               packed_bytes)
        v1, v2, l1, l2, _u = [jax.block_until_ready(x) for x in
                              fsm_only(ls8, pl2, ctsj, s_states=s_real2)]

        @functools.partial(jax.jit, static_argnames=("stride_words",))
        def emit_only(a, bb, c, d, plens, stride_words):
            return kdecode._emit_packs(a, bb, c, d, plens, stride_words,
                                       False)

        timeit("emit_packs (pallas)",
               lambda: emit_only(v1, v2, l1, l2, pl2,
                                 stride_words=stride_bytes // 4),
               enc_bytes)
        timeit("fused v4 chain (all)",
               lambda: kdecode._decode_fused_tpu(
                   py, pl2, pivj, ncj, ftj, ctsj, s_states=s_real2,
                   stride_words=stride_bytes // 4),
               packed_bytes)

    # --- RLE expand --------------------------------------------------------
    timeit("expand_sizes", lambda: krle.rle_expand_sizes(dec, ctsj),
           enc_bytes)
    sizes = np.asarray(krle.rle_expand_sizes(dec, ctsj))
    total = int(sizes.sum())
    print(f"expanded: {total / 1e6:.1f} MB", flush=True)
    ex_p = _bucket(int(sizes.max()), minimum=2048)
    from shafa_tpu.kernels.expand_pallas import rle_expand_pages
    timeit("expand_pages (pallas)",
           lambda: rle_expand_pages(dec, ctsj, ex_p), total)
    timeit("expand_compact (pallas)",
           lambda: krle.rle_expand_compact_pallas(
               dec, ctsj, _dl_bucket(total), ex_p), total)
    # correctness spot-check vs the XLA formulation on a slice
    a = np.asarray(krle.rle_expand_compact_pallas(
        dec, ctsj, _dl_bucket(total), ex_p))[:total]
    bx = np.asarray(krle.rle_expand_compact_xla(
        dec, ctsj, _dl_bucket(total)))[:total]
    print(f"pallas-vs-xla expand identical: {np.array_equal(a, bx)}",
          flush=True)
    if os.environ.get("SHAFA_BENCH_XLA_EXPAND", "0") != "0":
        timeit("rle_expand_compact (xla)",
               lambda: krle.rle_expand_compact_xla(
                   dec, ctsj, out_sz=_dl_bucket(total)), total)


if __name__ == "__main__":
    main()
