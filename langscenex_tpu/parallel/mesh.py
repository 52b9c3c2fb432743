"""Device mesh + sharding helpers.

The reference has no first-party distributed training (SURVEY.md §2.9); the
TPU-native scaling story is designed here from scratch:

  - 3DGS field construction scales by **view-parallel training**: each step
    renders a batch of B views (one per device along the 'data' axis),
    losses are averaged, and GSPMD inserts the gradient psum over ICI.
    Splat state and optimizer state are replicated (a few hundred MB at
    1M splats — well within v5e HBM).
  - The TriMap DiT (models/cogvideox) shards with a (data, model) mesh:
    DP over CFG branches / videos, TP over attention heads and MLP.

Everything here works identically on a virtual CPU mesh
(``--xla_force_host_platform_device_count``) for tests and dry-runs.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_data = n_data or (len(devices) // n_model)
    devs = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, rank: int = 1) -> NamedSharding:
    """Leading axis split over the 'data' mesh axis."""
    return NamedSharding(mesh, P(*(("data",) + (None,) * (rank - 1))))


def shard_batch_tree(tree, mesh: Mesh):
    """Place every array leaf with a leading batch axis on the data axis."""
    def place(x):
        if hasattr(x, 'ndim') and x.ndim >= 1:
            return jax.device_put(x, data_sharded(mesh, x.ndim))
        return jax.device_put(x, replicated(mesh))
    return jax.tree_util.tree_map(place, tree)


def replicate_tree(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), tree)


# Logical-axis rules for the TriMap DiT (models/cogvideox/transformer.py
# annotates activations with 'batch'/'embed'/'mlp'): DP over the CFG pair /
# videos rides 'data', TP over attention-head projections and the MLP
# hidden dimension rides 'model'. GSPMD propagates the matching weight
# shardings and inserts the ICI collectives.
DIT_LOGICAL_RULES = (("batch", "data"), ("embed", "model"),
                     ("mlp", "model"), ("qkv", "model"))


def dit_sharded_apply(model, mesh: Mesh):
    """Wrap model.apply with the DiT logical sharding rules bound to
    ``mesh``. Returns apply_fn(params, latents, text, t)."""
    import flax.linen as nn

    def apply_fn(params, latents, text, t):
        with mesh, nn.logical_axis_rules(DIT_LOGICAL_RULES):
            return model.apply(params, latents, text, t)
    return apply_fn
