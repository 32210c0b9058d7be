"""Per-stage device microbenchmark — where does the encode/decode time go?

Times every jit stage of the fused paths with device-resident inputs
(block_until_ready around a REPS loop), printing ms and effective GB/s per
stage. This is the tuning harness behind bench.py's headline number; run on
the real chip:

    python bench_stages.py [total_bytes] [block_bytes]

Stage list mirrors device.py's fused dispatch: RLE encode, histogram,
pack stage1/stage2, compact, decode stage1/stage2, RLE expand.
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

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 64 << 20
BLOCK = int(sys.argv[2]) if len(sys.argv) > 2 else 8 << 20
REPS = int(os.environ.get("SHAFA_BENCH_REPS", 5))


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
        # tiny readback per rep: guards against block_until_ready returning
        # early on the remote (relay) platform
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])

    force(fn())  # warm/compile
    t0 = time.perf_counter()
    for _ in range(reps):
        force(fn())
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt * 1e3:9.2f} ms   {nbytes / dt / 1e9:8.2f} GB/s")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from shafa_tpu import codes as codes_mod
    from shafa_tpu.device import _bucket, _compact_step, _dl_bucket, \
        _stack_blocks
    from shafa_tpu.kernels import decode as kdecode
    from shafa_tpu.kernels import histogram as khist
    from shafa_tpu.kernels import pack as kpack
    from shafa_tpu.kernels import rle as krle

    print(f"devices: {jax.devices()}")
    raw = synthetic(SIZE)
    blocks = [raw[i:i + BLOCK] for i in range(0, SIZE, BLOCK)]
    stacked, lens = _stack_blocks(blocks)
    b, p = stacked.shape
    print(f"batch: {b} blocks x {p} bytes padded ({SIZE / 1e6:.0f} MB)")

    x = jax.block_until_ready(jnp.asarray(stacked))
    ld = jnp.asarray(lens)

    # --- encode chain ------------------------------------------------------
    timeit("rle_encode", lambda: krle.rle_encode_batch(x, ld), SIZE)
    enc, enc_len = krle.rle_encode_batch(x, ld)
    jax.block_until_ready(enc)
    enc_bytes = int(np.asarray(enc_len).sum())
    print(f"  rle out: {enc_bytes / 1e6:.1f} MB")

    timeit("histogram(rle)", lambda: khist.histogram_batch(enc, enc_len),
           enc_bytes)
    hist = np.asarray(khist.histogram_batch(enc, enc_len)).astype(np.int64)

    t0 = time.perf_counter()
    tables = codes_mod.build_code_tables(hist)
    print(f"{'codes (host, C++)':28s} {(time.perf_counter() - t0) * 1e3:9.2f} ms")

    assert int(tables.lens.max()) <= 32, \
        "code length > 32 bits: bench corpus must stay on the fast path"
    cl = jnp.asarray(tables.lens.astype(np.int32))
    cv = jnp.asarray((tables.vals >> np.uint64(32)).astype(np.uint32))

    timeit("pack_stage1",
           lambda: kpack._stage1_jit(enc, enc_len, cl, cv), enc_bytes)
    off, val, bit_total, out_len = kpack._stage1_jit(enc, enc_len, cl, cv)
    jax.block_until_ready(off)
    timeit("pack_stage2(padded)",
           lambda: kpack._stage2_jit(off, val, bit_total), enc_bytes)
    packed, plen = kpack.pack_batch(enc, enc_len, cl, cv)
    jax.block_until_ready(packed)
    plen_np = np.asarray(plen)
    packed_bytes = int(plen_np.sum())
    print(f"  packed: {packed_bytes / 1e6:.1f} MB")

    out_sz = _dl_bucket(packed_bytes)
    timeit("pack_compact(fused)",
           lambda: kpack._compact_jit(off, val, bit_total, plen,
                                      out_sz=out_sz), packed_bytes)
    compact = _compact_step()
    timeit("compact(packed)",
           lambda: compact(packed, plen_np, out_sz=out_sz), packed_bytes)

    # --- decode chain ------------------------------------------------------
    payloads = [np.asarray(packed[i, :plen_np[i]]) for i in range(b)]
    pstacked, plens2 = _stack_blocks(payloads)
    py = jax.block_until_ready(jnp.asarray(pstacked))
    pl2 = jnp.asarray(plens2)
    counts = np.asarray(enc_len, np.int32)
    tab = kdecode.decode_tables_batch(tables.lens, tables.vals)
    tabj = {k: jax.block_until_ready(jnp.asarray(v)) for k, v in tab.items()}
    out_p = _bucket(int(counts.max()))

    timeit("decode_stage1", lambda: kdecode._stage1_jit(py, tabj),
           packed_bytes)
    ln_, sym_ = kdecode._stage1_jit(py, tabj)
    jax.block_until_ready(ln_)
    timeit("decode_stage2",
           lambda: kdecode._stage2_jit(ln_, sym_, pl2,
                                       jnp.asarray(counts), out_p=out_p),
           enc_bytes)
    dec, _ = kdecode._stage2_jit(ln_, sym_, pl2, jnp.asarray(counts),
                                 out_p=out_p)
    jax.block_until_ready(dec)

    timeit("expand_sizes",
           lambda: krle.rle_expand_sizes(dec, jnp.asarray(counts)), enc_bytes)
    sizes = np.asarray(krle.rle_expand_sizes(dec, jnp.asarray(counts)))
    ex_p = _bucket(int(sizes.max()))
    timeit("rle_expand",
           lambda: krle.rle_expand_batch(dec, jnp.asarray(counts), ex_p),
           SIZE)


if __name__ == "__main__":
    main()
