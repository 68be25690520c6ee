"""Multi-chip evaluation: shard the reference-view list over the data mesh.

Depth-map inference is embarrassingly parallel across reference views
(SURVEY §2.3: "inference parity needs no cross-chip communication at all —
fleet parallelism = shard the view list across chips"). This module batches
B reference views (each with its own V-view set and cameras) and runs one
jitted forward with the batch axis sharded over a 1-D mesh; params are
replicated, XLA inserts zero collectives.

Usage:
    mesh = data_mesh(8)
    fwd = make_sharded_eval(mesh, params, cfg, **fast_path_kwargs)
    depth, conf = fwd(imgs, proj_matrices, depth_values)   # leading dim B
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import data_mesh  # noqa: F401  (re-export for callers)

__all__ = ["make_sharded_eval", "pad_to_multiple"]


def pad_to_multiple(batch_leaves: dict, mult: int) -> tuple[dict, int]:
    """Pad every leaf's leading dim up to a multiple of ``mult`` by repeating
    the last element (padded outputs are sliced off by the caller).

    Returns (padded_batch, original_size).
    """
    sizes = {leaf.shape[0] for leaf in jax.tree.leaves(batch_leaves)}
    assert len(sizes) == 1, f"inconsistent leading dims: {sizes}"
    n = sizes.pop()
    pad = (-n) % mult
    if pad == 0:
        return batch_leaves, n
    padded = jax.tree.map(
        lambda t: jnp.concatenate([t, jnp.repeat(t[-1:], pad, axis=0)], axis=0),
        batch_leaves,
    )
    return padded, n


def make_sharded_eval(
    mesh,
    params,
    cfg,
    temperature: float = 0.01,
    compute_dtype=jnp.float32,
    feature_impl: str = "plain",
):
    """Jitted batched eval forward with the view batch sharded over ``data``.

    The body runs under ``shard_map`` so each per-chip program traces with
    the LOCAL batch size (B / mesh size). With per-chip batches of 1
    (B == mesh size) the single-view Pallas fast path inside the model stays
    enabled — a plain jit with global-view sharding would trace with the
    global B and silently route every chip down the slow XLA path.
    """
    from ..models.cds_mvsnet import apply_cds_mvsnet

    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    params = jax.device_put(params, repl)

    def local_fwd(params, imgs, proj_matrices, depth_values):
        outputs, _ = apply_cds_mvsnet(
            params, cfg, imgs, proj_matrices, depth_values,
            temperature=temperature, train=False,
            compute_dtype=compute_dtype, feature_impl=feature_impl,
        )
        return outputs["refined_depth"], outputs["stage3"]["photometric_confidence"]

    # Per-view depth inference needs zero collectives (SURVEY §2.3), so the
    # shard_map body is exactly the single-chip program, replicated.
    forward = jax.jit(
        jax.shard_map(
            local_fwd,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P("data")),
            out_specs=P("data"),
            check_vma=False,
        )
    )

    def run(imgs, proj_matrices, depth_values):
        n_dev = mesh.devices.size
        batch = {"imgs": imgs, "proj": proj_matrices, "dv": depth_values}
        batch, n = pad_to_multiple(batch, n_dev)
        batch = jax.device_put(batch, batch_sh)
        depth, conf = forward(params, batch["imgs"], batch["proj"], batch["dv"])
        return depth[:n], conf[:n]

    return run
