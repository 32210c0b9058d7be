"""CLI — flag-compatible with the reference (src/shafa.c:47-132, 150-259).

Flags: <file>  -m f|t|c|d (repeatable)  -b K|m|M  -c r|f  -d s|r
       --no-multithread (one block per device batch: the sequential oracle
       for the batched path, like the reference's flag for its thread pool)
Extra (TPU-side, not in the reference): --backend numpy|jax, --check
(cross-verify every device stage against the numpy oracle), --json PATH|-
(structured per-module metrics), --profile DIR (jax.profiler trace).

Defaulting (shafa.c:293-305): with no -m, a .shaf input runs D only, anything
else runs F+T+C; with no -b the block size is 64 KiB (the reference's code
default — its README says 640 KiB but the code disagrees; we follow the code).

Module-chain legality and error messages replicate execute_modules verbatim.
Exit status: 0 on success, 1 on any error (shafa.c:310-316).
"""

from __future__ import annotations

import dataclasses
import os
import sys

from . import formats, geometry, pipeline
from .errors import Code, ShafaError, error_msg
from .pipeline import StageReport

BANNER = [
    "shafa-tpu: TPU-native Shafa-format lossless codec",
    "JAX/XLA/Pallas implementation (reference: Fytex/Shafa-CD)",
]


@dataclasses.dataclass
class Options:
    block_size: int = 0
    module_f: bool = False
    module_t: bool = False
    module_c: bool = False
    module_d: bool = False
    f_force_rle: bool = False
    f_force_freq: bool = False
    d_shaf: bool = False
    d_rle: bool = False
    no_multithread: bool = False
    backend: str = "auto"
    check: bool = False
    json_path: str = ""
    profile_dir: str = ""


def parse(argv: list[str]) -> tuple[Options, str | None] | None:
    """Reference parse() semantics (shafa.c:47-132): returns None on syntax
    error; value flags must be separate argv entries of length 1."""
    opts = Options()
    file: str | None = None
    i = 0
    while i < len(argv):
        key = argv[i]
        if key == "--no-multithread":
            opts.no_multithread = True
        elif key == "--check":  # extension flag, not in the reference
            opts.check = True
        elif key == "--backend":  # extension flag, not in the reference
            i += 1
            if i >= len(argv) or argv[i] not in ("numpy", "jax", "auto"):
                return None
            opts.backend = argv[i]
        elif key == "--json":  # extension flag, not in the reference
            i += 1
            if i >= len(argv):
                return None
            opts.json_path = argv[i]
        elif key == "--profile":  # extension flag, not in the reference
            i += 1
            if i >= len(argv):
                return None
            opts.profile_dir = argv[i]
        elif not key.startswith("-"):
            if file is not None:
                return None
            file = key
        else:
            i += 1
            if i >= len(argv):
                return None
            value = argv[i]
            if len(key) != 2 or len(value) != 1:
                return None
            if key[1] == "m":
                if value == "f":
                    opts.module_f = True
                elif value == "t":
                    opts.module_t = True
                elif value == "c":
                    opts.module_c = True
                elif value == "d":
                    opts.module_d = True
                else:
                    return None
            elif key[1] == "b":
                if value not in geometry.BLOCK_SIZE_BY_FLAG:
                    return None
                opts.block_size = geometry.BLOCK_SIZE_BY_FLAG[value]
            elif key[1] == "c":
                if value == "r":
                    opts.f_force_rle = True
                elif value == "f":
                    opts.f_force_freq = True
                else:
                    return None
            elif key[1] == "d":
                if value == "s":
                    opts.d_shaf = True
                elif value == "r":
                    opts.d_rle = True
                else:
                    return None
            else:
                return None
        i += 1
    return opts, file


def _print_summary_f(r: StageReport) -> None:
    print("\n".join(BANNER))
    print("Module: f (calculation of symbol frequencies)")
    print(f"Number of blocks: {r.n_blocks}")
    print("Size of blocks analyzed in the original file: "
          + "/".join(map(str, r.sizes_before)))
    if r.extra.get("compress_rle"):
        size_f = r.extra["size_f"]
        size_rle = sum(r.sizes_after)
        ratio = (size_f - size_rle) / size_f * 100.0
        rle_path = r.generated[0]
        print(f"RLE Compression: {rle_path} ({ratio:f}% compression)")
        print("Size of blocks analyzed in the RLE file: "
              + "/".join(map(str, r.sizes_after)) + " bytes")
    print(f"Module runtime (milliseconds): {r.runtime_ms:f}")
    print("Generated files: " + ", ".join(r.generated))


def _print_summary_t(r: StageReport) -> None:
    print("\n".join(BANNER))
    print("Module: T (Calculation of symbol codes)")
    print(f"Number of blocks: {r.n_blocks}")
    print("Size of blocks analyzed in the symbol file: "
          + "/".join(map(str, r.sizes_before)) + " bytes")
    print(f"Module runtime (milliseconds): {r.runtime_ms:f}")
    print(f"Generated file {r.generated[0]}")


def _print_summary_c(r: StageReport) -> None:
    print("\n".join(BANNER))
    print("Module: C (Symbol codes' codification)")
    print(f"Number of blocks: {r.n_blocks}")
    for i, (a, b) in enumerate(zip(r.sizes_before, r.sizes_after)):
        pct = int(b / a * 100) if a else 0
        print(f"Size before/after & compression rate (Block {i}): {a}/{b} -> {pct}%")
    print(f"Module runtime (milliseconds): {r.runtime_ms:f}")
    print(f"Generated file {r.generated[0]}")


def _print_summary_d(r: StageReport) -> None:
    print("\n".join(BANNER))
    algo = r.extra.get("algo", "shafa")
    name = {"rle": "RLE decoding", "shafa": "SHAFA decoding",
            "shafa_rle": "SHAFA & RLE decoding"}[algo]
    print(f"Module: D ({name})")
    for i, (a, b) in enumerate(zip(r.sizes_before, r.sizes_after)):
        print(f"Size before/after generating file (block {i + 1}): {a}/{b}")
    print(f"Module runtime (in milliseconds): {r.runtime_ms:f}")
    print(f"Generated file {r.generated[0]}")


def _enable_compile_cache() -> None:
    """Persistent compilation cache (repo-local by default, or
    SHAFA_COMPILE_CACHE). Must be set via jax.config, not env: harnesses
    that preload jax (sitecustomize) snapshot env before we run. On the
    dev relay every fresh compile costs minutes; cached reruns are file
    reads."""
    import jax
    path = os.environ.get(
        "SHAFA_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass  # cache is an optimization, never a failure


def _make_backend(opts: Options):
    if opts.backend == "numpy":
        backend = pipeline.NumpyBackend()
    else:
        import jax

        from .device import JaxBackend  # deferred: importing jax is slow
        _enable_compile_cache()
        mesh = None
        if jax.local_device_count() > 1 and not opts.no_multithread:
            # Multi-chip host: shard the block axis over all local devices
            # (the reference exposes its thread parallelism by default,
            # shafa.c:55-56; ours likewise needs no flag).
            from .dist import block_mesh
            mesh = block_mesh(jax.local_devices())
        backend = JaxBackend(mesh=mesh, sequential=opts.no_multithread)
    if opts.check:
        backend = pipeline.CheckedBackend(backend)
    return backend


def _process_count() -> int:
    """Hosts in the jax.distributed runtime (1 when not initialized)."""
    if "jax" not in sys.modules and not os.environ.get("COORDINATOR_ADDRESS"):
        return 1  # don't pay the jax import just to learn we're single-host
    try:
        import jax
        return jax.process_count()
    except Exception:
        return 1


def execute_modules(opts: Options, path: str,
                    reports: list[StageReport] | None = None) -> int:
    """Mirror of execute_modules (shafa.c:150-259): same conflicts, same
    stderr lines, same chaining."""
    backend = _make_backend(opts)
    reports = reports if reports is not None else []
    decompressed = False

    # Multi-host (jax.distributed): the full chains route through the
    # DCN-scale driver (multihost.py) — contiguous per-host block ranges,
    # KB-scale metadata allgathers, offset-disjoint pwrites (SURVEY §5.8).
    if _process_count() > 1 and opts.backend != "numpy" and not opts.check:
        from . import multihost
        import time as _time
        if opts.module_f and opts.module_t and opts.module_c \
                and not opts.module_d:
            t0 = _time.perf_counter()
            try:
                out = multihost.compress_multihost(
                    path, opts.block_size, backend,
                    force_rle=opts.f_force_rle, force_freq=opts.f_force_freq)
            except ShafaError as e:
                print("Module f: Something went wrong while compressing with"
                      " RLE or creating frequencies' table...",
                      file=sys.stderr)
                return e.code
            import jax
            if jax.process_index() == 0:
                print(f"Multihost compress ({jax.process_count()} hosts): "
                      f"{out} in {(_time.perf_counter() - t0) * 1e3:.0f} ms")
            return Code.SUCCESS
        if opts.module_d and not (opts.module_f or opts.module_t
                                  or opts.module_c) \
                and formats.check_ext(path, formats.SHAFA_EXT) \
                and not opts.d_rle:
            t0 = _time.perf_counter()
            try:
                out = multihost.decompress_multihost(path, backend)
            except ShafaError as e:
                print("Module d: Something went wrong while decompressing...",
                      file=sys.stderr)
                return e.code
            import jax
            if jax.process_index() == 0:
                print(f"Multihost decompress ({jax.process_count()} hosts): "
                      f"{out} in {(_time.perf_counter() - t0) * 1e3:.0f} ms")
            return Code.SUCCESS
        # other module combinations fall through to the single-host path
        # on every process (correct but duplicated work).

    if opts.module_f and opts.module_t and opts.module_c:
        # Full compress chain: fused device-resident path (same files, same
        # bytes, same summaries as the sequential modules below).
        try:
            path, reps = pipeline.compress_pipeline(
                path, opts.f_force_rle, opts.f_force_freq, opts.block_size,
                backend)
        except ShafaError as e:
            stage = getattr(e, "stage", "f")
            if stage == "f":
                print("Module f: Something went wrong while compressing with"
                      " RLE or creating frequencies' table...",
                      file=sys.stderr)
            elif stage == "t":
                print("Module t: Something went wrong...", file=sys.stderr)
            else:
                print("Module c: Something went wrong...", file=sys.stderr)
            return e.code
        reports.extend(reps)
        _print_summary_f(reps[0])
        _print_summary_t(reps[1])
        _print_summary_c(reps[2])
        if not opts.module_d:
            return Code.SUCCESS
        opts = dataclasses.replace(opts, module_f=False, module_t=False,
                                   module_c=False)

    if opts.module_f:
        try:
            path, rep = pipeline.module_f(
                path, opts.f_force_rle, opts.f_force_freq, opts.block_size,
                backend)
        except ShafaError as e:
            print("Module f: Something went wrong while compressing with RLE"
                  " or creating frequencies' table...", file=sys.stderr)
            return e.code
        reports.append(rep)
        _print_summary_f(rep)

    if opts.module_t:
        if not opts.module_f:
            if formats.check_ext(path, formats.FREQ_EXT):
                path = formats.rm_ext(path)
            else:
                print(f"Module t: Wrong extension... Should end in "
                      f"{formats.FREQ_EXT}", file=sys.stderr)
                return Code.OUTSIDE_MODULE
        try:
            path, rep = pipeline.module_t(path)
        except ShafaError as e:
            print("Module t: Something went wrong...", file=sys.stderr)
            return e.code
        reports.append(rep)
        _print_summary_t(rep)

    if opts.module_c:
        if opts.module_f and not opts.module_t:
            print("Module c: Can't execute module 'c' after 'f' without"
                  " 't'...", file=sys.stderr)
            return Code.OUTSIDE_MODULE
        try:
            path, rep = pipeline.module_c(path, backend)
        except ShafaError as e:
            print("Module c: Something went wrong...", file=sys.stderr)
            return e.code
        reports.append(rep)
        _print_summary_c(rep)

    if opts.module_d:
        if ((opts.module_f and (not opts.module_t or not opts.module_c)
             and not formats.check_ext(path, formats.RLE_EXT))
                or (opts.module_t and not opts.module_c)):
            print("Module d: Can't execute module 'd' after 'f' without 't'"
                  " or 'c', nor execute it after 't'  without 'c'...",
                  file=sys.stderr)
            return Code.OUTSIDE_MODULE

        file_rle_shaf = False
        if opts.d_shaf or not opts.d_rle:
            if not formats.check_ext(path, formats.SHAFA_EXT):
                if opts.d_shaf:
                    print(f"Module d: Wrong extension... Should end in "
                          f"{formats.SHAFA_EXT}", file=sys.stderr)
                    return Code.OUTSIDE_MODULE
            else:
                if opts.d_rle:
                    if formats.check_ext(path, formats.RLE_EXT + formats.SHAFA_EXT):
                        file_rle_shaf = True
                    else:
                        print(f"Module d: Wrong extension... Should end in "
                              f"{formats.RLE_EXT + formats.SHAFA_EXT}",
                              file=sys.stderr)
                        return Code.OUTSIDE_MODULE
                rle = ((opts.d_rle or not opts.d_shaf)
                       and (file_rle_shaf
                            or formats.check_ext(
                                path, formats.RLE_EXT + formats.SHAFA_EXT)))
                try:
                    path, rep = pipeline.module_d_shafa(path, rle, backend)
                except ShafaError as e:
                    print("Module d: Something went wrong while"
                          " decompressing...", file=sys.stderr)
                    return e.code
                reports.append(rep)
                _print_summary_d(rep)
                decompressed = True

        if not decompressed and (opts.d_rle or not opts.d_shaf):
            if not formats.check_ext(path, formats.RLE_EXT):
                print(f"Module d: Wrong extension... Should end in "
                      f"{formats.RLE_EXT}", file=sys.stderr)
                return Code.OUTSIDE_MODULE
            try:
                path, rep = pipeline.module_d_rle(path, backend)
            except ShafaError as e:
                print("Module d: Something went wrong while decompressing...",
                      file=sys.stderr)
                return e.code
            reports.append(rep)
            _print_summary_d(rep)

    return Code.SUCCESS


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("No file input", file=sys.stderr)
        return 1
    parsed = parse(argv)
    if parsed is None:
        print("Wrong Options' syntax", file=sys.stderr)
        return 1
    opts, file = parsed
    if file is None:
        print("No file input", file=sys.stderr)
        return 1

    # Multi-host: join the jax.distributed runtime when the standard env
    # is present (COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID, or
    # SHAFA_MULTIHOST=1 for TPU-pod autodetection) — SURVEY §5.8.
    if opts.backend != "numpy" and (os.environ.get("COORDINATOR_ADDRESS")
                                    or os.environ.get("SHAFA_MULTIHOST")):
        from . import multihost
        multihost.init_from_env()

    # Defaulting (shafa.c:293-305).
    if not (opts.module_f or opts.module_t or opts.module_c or opts.module_d):
        if formats.check_ext(file, formats.SHAFA_EXT):
            opts.module_d = True
        else:
            opts.module_f = opts.module_t = opts.module_c = True
    if not opts.block_size:
        opts.block_size = geometry.CLI_DEFAULT_BLOCK_SIZE

    reports: list[StageReport] = []
    if opts.profile_dir:
        import jax
        with jax.profiler.trace(opts.profile_dir):
            error = execute_modules(opts, file, reports)
    else:
        error = execute_modules(opts, file, reports)
    if opts.json_path:
        _emit_json(opts.json_path, reports, error)
    if error:
        if error != Code.OUTSIDE_MODULE:
            print(error_msg(error), end="", file=sys.stderr)
        return 1
    return 0


def _emit_json(path: str, reports: list[StageReport], error: int) -> None:
    """Structured metrics (extension; SURVEY.md §5.5): per-module sizes,
    ratio, runtime, and throughput — machine-readable for GB/s and
    scaling-efficiency accounting."""
    import json
    out = {"error": int(error), "modules": []}
    for r in reports:
        before, after = sum(r.sizes_before), sum(r.sizes_after)
        out["modules"].append({
            "module": r.module,
            "n_blocks": r.n_blocks,
            "bytes_in": before,
            "bytes_out": after,
            "ratio": round(after / before, 6) if before else None,
            "runtime_ms": round(r.runtime_ms, 3),
            "throughput_mb_s": round(before / 1e3 / r.runtime_ms, 3)
            if r.runtime_ms else None,
            "generated": r.generated,
        })
    data = json.dumps(out, indent=2)
    if path == "-":
        print(data)
    else:
        with open(path, "w") as fp:
            fp.write(data)


if __name__ == "__main__":
    sys.exit(main())
