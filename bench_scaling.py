"""Scaling harness: sharded encode over 1/2/4/8-device block meshes.

Measures the fused encode chain (RLE + histogram + pack — the production
kernels via kernels/dispatch) shard_mapped over an N-device mesh at fixed
total work, and reports per-N seconds + parallel efficiency
(t1 / (N * tN)).

On real multi-chip hardware this is the BASELINE.md >=85% scaling check.
This dev box has ONE TPU chip, so the harness runs on N VIRTUAL CPU
devices (xla_force_host_platform_device_count) sharing 2 physical cores:
there the number validates that sharding adds little overhead (wall time
should stay ~flat as N grows on a contended substrate), not hardware
speedup — the `substrate` field says which interpretation applies.

Usage:  python bench_scaling.py            # parent: spawns children, JSON
        python bench_scaling.py --child N  # one measurement (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SIZE = int(os.environ.get("SHAFA_SCALING_SIZE", 4 << 20))
BLOCK = int(os.environ.get("SHAFA_SCALING_BLOCK", 64 << 10))
DEVICE_COUNTS = (1, 2, 4, 8)


def child(n_devices: int) -> None:
    os.environ["JAX_PLATFORMS"] = os.environ.get("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import synthetic
    from shafa_tpu import codes as codes_mod
    from shafa_tpu.device import JaxBackend, _stack_blocks
    from shafa_tpu.dist import block_mesh

    import jax

    devs = jax.devices()[:n_devices]
    backend = JaxBackend(mesh=block_mesh(devs)) if n_devices > 1 \
        else JaxBackend()
    data = synthetic(SIZE)
    raw = np.frombuffer(data, np.uint8)
    blocks = [raw[i:i + BLOCK] for i in range(0, len(raw), BLOCK)]

    def run_once():
        handle = backend.fused_encode(blocks)
        hists = backend.fused_rle_hists(handle)
        tables = codes_mod.build_code_tables(hists)
        rle_sizes = backend.fused_rle_sizes(handle)
        rle_flat = backend.fused_rle_bytes(handle)
        offs = np.concatenate(([0], np.cumsum(rle_sizes)))
        payloads = backend.fused_pack(
            handle, tables, True, lambda i: rle_flat[offs[i]:offs[i + 1]])
        return sum(len(p) for p in payloads)

    run_once()  # warm/compile
    t0 = time.perf_counter()
    reps = 2
    for _ in range(reps):
        total = run_once()
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"devices": n_devices, "seconds": round(dt, 4),
                      "payload_bytes": total}))


def parent() -> dict:
    results = []
    for n in DEVICE_COUNTS:
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(n)],
            capture_output=True, text=True, env=env, timeout=900)
        if r.returncode != 0:
            print(f"scaling child {n} failed: {r.stderr[-800:]}",
                  file=sys.stderr)
            continue
        results.append(json.loads(r.stdout.strip().splitlines()[-1]))
    out = {"substrate": "virtual-cpu-mesh (2 physical cores)",
           "size_bytes": SIZE, "block_bytes": BLOCK, "runs": results}
    if results and results[0]["devices"] == 1:
        t1 = results[0]["seconds"]
        for row in results:
            row["speedup"] = round(t1 / row["seconds"], 3)
            row["efficiency"] = round(t1 / (row["devices"] * row["seconds"]),
                                      3)
    return out


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
    else:
        print(json.dumps(parent()))
