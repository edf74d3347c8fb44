"""Distribution layer: device meshes, shardings and data pipelines — the
TPU-native replacement of the reference's inline Dask branches
(xpysom.py:545-558)."""

from .mesh import data_sharding, make_data_mesh, replicated_sharding, resolve_mesh

__all__ = [
    "make_data_mesh",
    "resolve_mesh",
    "data_sharding",
    "replicated_sharding",
]
