"""Emission-strategy dispatch: Pallas/Mosaic on TPU, XLA gathers elsewhere.

The variable-rate emission kernels exist in two formulations:

  * ``pallas`` — the Mosaic kernel (emit_pallas.py): sequential-grid bit
    concatenation with MXU one-hot placement. The production TPU path —
    XLA's scatter lowers to a serialized update loop and the gather
    formulation's binary-search probes serialize too (0.47 MB/s measured
    end-to-end on v5e, BENCH_r02).
  * ``xla`` — output-centric binary-search gathers (ops.searchsorted):
    portable, used on CPU (tests, virtual meshes) where Mosaic would need
    interpret mode.

Override with SHAFA_TPU_EMIT=pallas|xla (testing/debugging only).
"""

from __future__ import annotations

import functools
import os


@functools.cache
def use_pallas_emit() -> bool:
    forced = os.environ.get("SHAFA_TPU_EMIT", "")
    if forced == "pallas":
        return True
    if forced == "xla":
        return False
    import jax
    return jax.default_backend() == "tpu"


@functools.cache
def pallas_interpret() -> bool:
    """Interpret mode when the Pallas path is forced onto a non-TPU backend
    (CPU tests of the production emission path)."""
    import jax
    return jax.default_backend() != "tpu"
