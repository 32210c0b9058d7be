"""Device kernels (JAX/XLA + Pallas) for the four hot paths.

Strategy notes (measured on TPU v5e, see bench/probe history):
  * sorted scatter-add and large-array gathers run near HBM speed (~300-435
    GB/s) under XLA — variable-rate emission uses them directly;
  * small-LUT random gathers are ~90 Melem/s — LUT lookups instead go through
    nibble-split one-hot matmuls on the MXU;
  * searchsorted is unusable on TPU — rank computations use broadcast
    compares (hierarchical 16+16 pivots);
  * histograms use 4-bit one-hot outer products contracted on the MXU.
"""

from . import histogram, ops, pack, rle  # noqa: F401
