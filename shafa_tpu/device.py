"""JAX device backend: batches blocks into padded arrays, runs the kernels.

Placeholder in this commit: falls back to the NumPy oracle until the JAX
kernels land (kernels/). The Backend protocol is already final so the
pipeline/CLI don't change when the device path arrives.
"""

from __future__ import annotations

from .pipeline import NumpyBackend


class JaxBackend(NumpyBackend):
    pass
