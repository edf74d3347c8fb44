"""Pallas TPU kernels for the SOM hot path.

The reference's one native kernel is a CUDA ``ReductionKernel`` for
Manhattan distance (reference distances.py:110-118). The TPU-native
equivalents here go further, attacking the actual bottleneck of the batch
SOM (HBM traffic on the ``(N, XY)`` distance matrix):

- ``bmu``: fused ``‖x - w‖²``-partial + argmin BMU search. The distance
  tile lives only in VMEM; the kernel streams sample tiles against a
  codebook kept on-chip and writes just the ``(N,)`` winner indices (and
  min values) back to HBM — removing the dominant memory-bound
  materialization the XLA path pays.
- ``manhattan``: tiled |x-w| reduction (the CUDA kernel's counterpart).
"""

from . import bmu, manhattan  # noqa: F401

__all__ = ["bmu", "manhattan"]
