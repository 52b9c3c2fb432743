"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip():
    import sys
    sys.path.insert(0, '/root/repo')
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_mesh_helpers():
    from langscenex_tpu.parallel.mesh import (make_mesh, shard_batch_tree,
                                              replicate_tree)
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    x = jnp.zeros((8, 16))
    sharded = shard_batch_tree({"a": x}, mesh)
    assert sharded["a"].sharding.spec[0] == "data"
    rep = replicate_tree({"b": x}, mesh)
    assert rep["b"].sharding.is_fully_replicated
