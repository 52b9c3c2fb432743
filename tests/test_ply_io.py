import numpy as np
import jax.numpy as jnp

from langscenex_tpu.scene.gaussians import create_from_points
from langscenex_tpu.scene.ply_io import save_ply, load_ply, attribute_names


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    P = 37
    pts = rng.uniform(-1, 1, (P, 3)).astype(np.float32)
    colors = rng.uniform(0, 1, (P, 3)).astype(np.float32)
    state = create_from_points(pts, colors, capacity=64)
    # give distinctive values to every channel
    import dataclasses
    state = dataclasses.replace(
        state,
        features_rest=state.features_rest.at[:P].set(
            jnp.asarray(rng.normal(size=(P, 15, 3)).astype(np.float32))),
        language_feature=state.language_feature.at[:P].set(
            jnp.asarray(rng.normal(size=(P, 3)).astype(np.float32))),
        instance_feature=state.instance_feature.at[:P].set(
            jnp.asarray(rng.normal(size=(P, 3)).astype(np.float32))))

    path = str(tmp_path / "splats.ply")
    save_ply(state, path, include_feature=True)
    loaded = load_ply(path, max_sh_degree=3, capacity=64)

    assert int(jnp.sum(loaded.alive)) == P
    for field in ("xyz", "features_dc", "features_rest", "scaling",
                  "rotation", "opacity", "language_feature",
                  "instance_feature"):
        a = np.asarray(getattr(state, field))[:P]
        b = np.asarray(getattr(loaded, field))[:P]
        np.testing.assert_array_equal(a, b, err_msg=field)


def test_attribute_layout_matches_reference():
    # layout per gaussian_model.construct_list_of_attributes:400-417
    names = attribute_names(15, include_feature=True)
    assert names[:6] == ['x', 'y', 'z', 'nx', 'ny', 'nz']
    assert names[6:9] == ['f_dc_0', 'f_dc_1', 'f_dc_2']
    assert names[9] == 'f_rest_0' and names[53] == 'f_rest_44'
    assert names[54] == 'opacity'
    assert names[55:58] == ['scale_0', 'scale_1', 'scale_2']
    assert names[58:62] == ['rot_0', 'rot_1', 'rot_2', 'rot_3']
    assert names[62:65] == ['language_feature_0', 'language_feature_1',
                            'language_feature_2']
    assert names[65:] == ['instance_feature_0', 'instance_feature_1',
                          'instance_feature_2']


def test_load_without_features(tmp_path):
    rng = np.random.default_rng(1)
    state = create_from_points(rng.uniform(-1, 1, (10, 3)).astype(np.float32),
                               rng.uniform(0, 1, (10, 3)).astype(np.float32),
                               capacity=16)
    path = str(tmp_path / "nofeat.ply")
    save_ply(state, path, include_feature=False)
    loaded = load_ply(path, capacity=16)
    assert int(jnp.sum(loaded.alive)) == 10
    np.testing.assert_array_equal(np.asarray(loaded.language_feature), 0.0)
