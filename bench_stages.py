"""Per-stage device microbenchmark — where does the encode/decode time go?

Times every jit stage of the fused paths with device-resident inputs
(block_until_ready around a REPS loop), printing ms and effective GB/s per
stage. This is the tuning harness behind bench.py's headline number; run on
the real chip:

    python bench_stages.py [total_bytes] [block_bytes]

Stage list mirrors the fused encode dispatch: RLE encode, histogram,
code build, production pack (words), word compaction — each with an
analytic roofline line attributing its gap (HBM / VPU / MXU bound).
Decode stages live in bench_decode_stages.py.
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


# --- roofline model (v5e, per chip) ----------------------------------------
# HBM ~819 GB/s; VPU ~4 Tops/s elementwise int32 (8x128 lanes x ~4 ALUs at
# 940 MHz); MXU 197 TFLOPS bf16 / ~49 TFLOPS f32-highest. Analytic per-stage
# costs below are descriptive estimates (counted from the kernel formulas)
# used to attribute each stage's gap: a stage near its HBM bound needs
# fusion/layout work; near its VPU bound needs an algorithmic change.
HBM_BPS = 819e9
VPU_OPS = 4e12
MXU_BF16 = 197e12
MXU_F32 = 49e12


def roofline(name: str, dt: float, hbm_bytes: float, vpu_ops: float = 0,
             mxu_macs: float = 0, mxu_f32: bool = False):
    t_hbm = hbm_bytes / HBM_BPS
    t_vpu = vpu_ops / VPU_OPS
    t_mxu = mxu_macs / (MXU_F32 if mxu_f32 else MXU_BF16)
    bound = max(t_hbm, t_vpu, t_mxu)
    which = ("HBM" if bound == t_hbm else
             "VPU" if bound == t_vpu else "MXU")
    print(f"  roofline[{name}]: ideal {bound * 1e3:8.2f} ms ({which}-bound:"
          f" hbm {t_hbm * 1e3:.1f} vpu {t_vpu * 1e3:.1f}"
          f" mxu {t_mxu * 1e3:.1f})  attained {bound / dt * 100:5.1f}%")


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
    from shafa_tpu.device import _bucket, _dl_bucket, _stack_blocks
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
    n_el = b * p  # padded elements
    dt = timeit("rle_encode", lambda: krle.rle_encode_batch(x, ld), SIZE)
    # analysis: ~8 elementwise/scan passes over (B,P) i32 + emit kernel:
    # per lane ~40 VPU ops (cumsum+shift) + per SUB_LANES chunk a (130,128)
    # one-hot build (~2 ops/cell) + f32 placement matmul
    roofline("rle_encode", dt,
             hbm_bytes=n_el * (1 + 2 * 4 * 8) + 2 * n_el,
             vpu_ops=n_el * (8 * 4 + 40 + 2 * 130),
             mxu_macs=n_el * 4 * 130, mxu_f32=True)
    enc, enc_len = krle.rle_encode_batch(x, ld)
    jax.block_until_ready(enc)
    enc_bytes = int(np.asarray(enc_len).sum())
    print(f"  rle out: {enc_bytes / 1e6:.1f} MB")

    dt = timeit("histogram(rle)",
                lambda: khist.histogram_batch(enc, enc_len), enc_bytes)
    roofline("histogram", dt, hbm_bytes=2 * n_el,
             vpu_ops=n_el * 8, mxu_macs=n_el * 32)
    hist = np.asarray(khist.histogram_batch(enc, enc_len)).astype(np.int64)

    t0 = time.perf_counter()
    tables = codes_mod.build_code_tables(hist)
    print(f"{'codes (host, C++)':28s} {(time.perf_counter() - t0) * 1e3:9.2f} ms")

    assert int(tables.lens.max()) <= 32, \
        "code length > 32 bits: bench corpus must stay on the fast path"
    cl = jnp.asarray(tables.lens.astype(np.int32))
    cv = jnp.asarray((tables.vals >> np.uint64(32)).astype(np.uint32))

    # production pack dispatch (Pallas emit_coded_words on TPU)
    n_enc = enc.shape[0] * enc.shape[1]
    dt = timeit("pack_words(production)",
                lambda: kpack.pack_batch_words(enc, enc_len, cl, cv),
                enc_bytes)
    # per lane: 256-LUT (2 nibble one-hots ~64 ops + 3x16 MACs/lane) +
    # cumsum/shift ~40 + placement build ~130; MXU: LUT 3*256 + place 4*130
    roofline("pack_words", dt,
             hbm_bytes=2 * n_enc + n_enc,
             vpu_ops=n_enc * (64 + 40 + 130),
             mxu_macs=n_enc * (3 * 256 + 4 * 130), mxu_f32=True)
    words, plen = kpack.pack_batch_words(enc, enc_len, cl, cv)
    jax.block_until_ready(words)
    plen_np = np.asarray(plen)
    packed_bytes = int(plen_np.sum())
    print(f"  packed: {packed_bytes / 1e6:.1f} MB")

    out_sz = _dl_bucket(packed_bytes)
    from shafa_tpu.kernels import ops as kops
    dt = timeit("compact_words",
                lambda: kops.compact_words(words, plen, out_sz),
                packed_bytes)
    roofline("compact_words", dt,
             hbm_bytes=4 * words.shape[0] * words.shape[1] + out_sz,
             vpu_ops=words.shape[0] * words.shape[1] * (40 + 130),
             mxu_macs=words.shape[0] * words.shape[1] * 4 * 130,
             mxu_f32=True)
    # (decode-side stages are profiled by bench_decode_stages.py, which
    # builds its inputs on host and exercises the production decode path.)


if __name__ == "__main__":
    main()
