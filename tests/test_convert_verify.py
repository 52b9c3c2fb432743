"""convert_cli --verify: converted trees round-trip against the
full-size models' init shapes (VERDICT r2 item 9 — weights-day
readiness). The expensive real conversions are exercised on weights day;
here we prove (a) expected_shapes() traces for EVERY family at the
full-size default config, (b) verify() passes on a genuinely converted
full-size tree (the per-scene AE, whose torch mirror is cheap), and
(c) verify() catches missing leaves and shape drift."""
import numpy as np
import pytest

from langscenex_tpu.convert_cli import FAMILIES, expected_shapes, verify


class TestExpectedShapes:
    @pytest.mark.parametrize("family", [f for f in FAMILIES
                                        if f not in ("sam1", "sam2", "vggt",
                                                     "dit")])
    def test_small_families_trace(self, family):
        shapes = expected_shapes(family)
        assert len(shapes) > 4
        assert all(isinstance(s, tuple) for s in shapes.values())

    @pytest.mark.parametrize("family", ["sam1", "sam2", "vggt", "dit"])
    def test_big_families_trace(self, family):
        # eval_shape only — no params are materialized even at ViT-H /
        # Hiera-L / VGGT-1B / 5.57B-DiT size
        shapes = expected_shapes(family)
        n = sum(int(np.prod(s)) for s in shapes.values())
        # sanity: the full-size default configs really are full size
        floor = {"sam1": 600e6, "sam2": 200e6, "vggt": 700e6,
                 "dit": 5e9}[family]
        assert n > floor, f"{family}: {n/1e6:.0f}M params < expected"


def _full_size_ae_tree():
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    from langscenex_tpu.utils.convert import convert_autoencoder

    torch.manual_seed(0)
    enc_dims = [512, 256, 128, 64, 32, 16, 3]
    dec_dims = [16, 32, 64, 128, 256, 512, 768]
    enc_layers, prev = [], 768
    for i, d in enumerate(enc_dims):
        if i > 0:
            enc_layers += [tnn.BatchNorm1d(prev), tnn.ReLU()]
        enc_layers.append(tnn.Linear(prev, d))
        prev = d
    dec_layers, prev = [], 3
    for i, d in enumerate(dec_dims):
        if i > 0:
            dec_layers.append(tnn.ReLU())
        dec_layers.append(tnn.Linear(prev, d))
        prev = d
    sd = {}
    for k, v in tnn.Sequential(*enc_layers).state_dict().items():
        if not k.endswith("num_batches_tracked"):
            sd[f"encoder.{k}"] = v.numpy()
    for k, v in tnn.Sequential(*dec_layers).state_dict().items():
        sd[f"decoder.{k}"] = v.numpy()
    return convert_autoencoder(sd)


class TestVerify:
    def test_converted_ae_verifies(self):
        assert verify("autoencoder", _full_size_ae_tree()) == []

    def test_detects_missing_and_shape(self):
        tree = _full_size_ae_tree()
        # wrong shape on one leaf
        bad = {k: (dict(v) if isinstance(v, dict) else v)
               for k, v in tree.items()}
        import jax
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        leaves[0] = np.zeros(np.shape(leaves[0]) + (2,), np.float32)
        bad = jax.tree_util.tree_unflatten(treedef, leaves)
        probs = verify("autoencoder", bad)
        assert any(p.startswith("shape") for p in probs)
        # a missing subtree
        pruned = dict(tree)
        pruned["params"] = dict(tree["params"])
        pruned["params"].pop("decoder")
        probs = verify("autoencoder", pruned)
        assert any(p.startswith("missing") for p in probs)
