"""SPMD matting-Laplacian matvec: Pallas kernel + explicit halo exchange.

Pallas custom calls do not partition under XLA's automatic SPMD — a
sharded operand reaching `matvec_pallas` would be silently all-gathered,
defeating row sharding (the reason `parallel/spatial.py` historically
pinned multi-device runs to the XLA stencil). This module removes that
limitation the TPU-native way: `jax.shard_map` makes the partitioning
explicit, a 2-row halo exchange (`lax.ppermute` over ICI) supplies each
shard with the neighbor rows its stencils read, and every shard then
runs the unmodified single-device Pallas kernel on its local block.

Why 2 rows: the Levin matvec is two chained 3×3 box passes
(`laplacian.py` pass 1/pass 2) — output row r depends on window centers
in rows r±1, which depend on input rows r±2. With the halo attached, the
kernel's own zero-padding convention only ever affects rows that are
cropped away, and at the GLOBAL image edges the missing neighbors
(ppermute delivers zeros there) reproduce exactly the zero-padded "SAME"
behavior of the single-device path — the result is numerically identical
to `matvec_xla`/`matvec_pallas` on the unsharded image.

Cost model: per matvec each shard moves 2·(14 stats + 3 v) rows of halo
over ICI (~0.5 MB at 4k² on 8 devices) against O(H·W/n) local compute —
the classic surface-to-volume win of spatial decomposition.

Reference parity note: the reference (TF 1.x, SURVEY.md §2 comp.6) has
no distributed Laplacian at all — it builds a scipy CSR matrix on the
host. This path exists for the high-resolution regime (SURVEY.md §5
"long-context analogue") where one chip's HBM can't hold the VGG
activations of a single image.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .laplacian import LaplacianStats, matvec_xla

HALO = 2


def _exchange_rows(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Append each neighbor's adjacent HALO rows: (h, ...) -> (h+4, ...).

    Devices at the global edges receive zeros (ppermute's semantics for
    un-sourced destinations), matching the operator's zero-padded "SAME"
    boundary convention.
    """
    n = jax.lax.axis_size(axis_name)
    down = [(i, i + 1) for i in range(n - 1)]     # my bottom -> next's top
    up = [(i + 1, i) for i in range(n - 1)]       # my top -> prev's bottom
    top_halo = jax.lax.ppermute(x[-HALO:], axis_name, down)
    bot_halo = jax.lax.ppermute(x[:HALO], axis_name, up)
    return jnp.concatenate([top_halo, x, bot_halo], axis=0)


def _local_matvec(stats: LaplacianStats, v: jnp.ndarray, *,
                  axis_name: str, use_pallas: bool) -> jnp.ndarray:
    ext_stats = LaplacianStats(
        *(_exchange_rows(f, axis_name) for f in stats))
    ext_v = _exchange_rows(v, axis_name)
    if use_pallas:
        from .laplacian_pallas import matvec_pallas
        y = matvec_pallas(ext_stats, ext_v)
    else:
        y = matvec_xla(ext_stats, ext_v)
    return y[HALO:-HALO]


def matvec_spmd(stats: LaplacianStats, v: jnp.ndarray,
                axis_name: str = "rows", mesh=None,
                use_pallas: bool = True) -> jnp.ndarray:
    """y = L·v with rows sharded over `axis_name`; Pallas on every shard.

    stats/v must be row-sharded (axis 0) over a mesh axis named
    `axis_name`; `mesh` defaults to the ambient mesh (`jax.set_mesh`).
    Requires local_rows ≥ HALO (i.e. H ≥ 2·mesh_size).
    """
    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is None or mesh.empty or axis_name not in mesh.axis_names:
            raise ValueError(
                f"matvec_spmd: no ambient mesh with axis {axis_name!r}; "
                "wrap the call in jax.set_mesh(mesh) or pass mesh=")
    n_shards = dict(mesh.shape)[axis_name]
    local_rows = v.shape[0] // n_shards
    if local_rows < HALO:
        # otherwise the shard_map body fails with an opaque concat/shape
        # error deep inside the halo exchange (ADVICE r2)
        raise ValueError(
            f"matvec_spmd: {v.shape[0]} rows over {n_shards} shards "
            f"gives {local_rows} local rows < the {HALO}-row halo; use "
            f"a smaller mesh (≤ {v.shape[0] // HALO} shards) or the XLA "
            "stencil (laplacian_impl='xla')")
    row = lambda ndim: P(*((axis_name,) + (None,) * (ndim - 1)))
    stats_specs = LaplacianStats(*(row(f.ndim) for f in stats))
    f = jax.shard_map(
        partial(_local_matvec, axis_name=axis_name, use_pallas=use_pallas),
        mesh=mesh, in_specs=(stats_specs, row(v.ndim)),
        out_specs=row(v.ndim),
        # pallas_call's out_shape carries no varying-mesh-axes (vma)
        # annotation, which the shard_map checker requires; the specs
        # above state the variance explicitly, so disable the check
        check_vma=False)
    return f(stats, v)
