"""Gaussian splat scene state as a fixed-capacity pytree.

TPU-first redesign of the reference's GaussianModel
(field_construction/scene/gaussian_model.py:44-841). Instead of dynamically
sized torch tensors, splats live in fixed-capacity arrays with an ``alive``
mask — shapes never change under jit; densify/clone/split/prune write into
free slots (see train/densify.py). Parameter semantics (activations, init,
channels) match the reference exactly:

  - scaling: log-space, exp activation (gaussian_model.py:54-55)
  - opacity: logit-space, sigmoid activation (:58-59)
  - rotation: unnormalized quat, normalized on use (:61)
  - features: SH dc + rest, degree<=3 (:267-272)
  - knn_f(6), language(3), instance(3) extra per-splat channels (:63-87)
  - init: scales = log(sqrt(mean 3-NN sq dist)), opacity logit of 0.1,
    identity quats, SH-DC from RGB (:267-301)
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import mean_dist3_sq
from ..ops.quat import quat_normalize, quat_to_rotmat
from ..ops.sh import rgb_to_sh


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianState:
    """All per-splat learnable parameters, capacity-padded.

    Arrays have leading dim CAP; ``alive`` masks real splats. Raw
    (pre-activation) storage matches the reference's parameter space so
    checkpoints/PLYs are interchangeable.
    """
    xyz: jnp.ndarray            # [CAP,3]
    knn_f: jnp.ndarray          # [CAP,6]
    features_dc: jnp.ndarray    # [CAP,1,3]
    features_rest: jnp.ndarray  # [CAP,R,3]  R=(max_sh+1)^2-1
    scaling: jnp.ndarray        # [CAP,3] log-space
    rotation: jnp.ndarray       # [CAP,4] wxyz unnormalized
    opacity: jnp.ndarray        # [CAP,1] logit-space
    language_feature: jnp.ndarray  # [CAP,3]
    instance_feature: jnp.ndarray  # [CAP,3]
    alive: jnp.ndarray          # [CAP] bool

    # --- activated views -------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive)

    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    def get_opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity)

    def get_rotation(self) -> jnp.ndarray:
        return quat_normalize(self.rotation)

    def get_features(self) -> jnp.ndarray:
        """[CAP, 1+R, 3] concatenated SH coefficients."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def get_normal(self, cam_center: jnp.ndarray) -> jnp.ndarray:
        """Per-splat normal: shortest scaling axis, flipped toward the
        camera (gaussian_model.py get_normal:231-236)."""
        R = quat_to_rotmat(self.get_rotation())           # [CAP,3,3]
        shortest = jnp.argmin(self.scaling, axis=-1)      # log monotone
        # columns of R are the principal axes in world space
        normal = jnp.take_along_axis(
            R, shortest[:, None, None].repeat(3, -2), axis=-1)[..., 0]
        to_cam = cam_center[None, :] - self.xyz
        sign = jnp.sign(jnp.sum(normal * to_cam, -1, keepdims=True))
        return normal * jnp.where(sign == 0, 1.0, sign)


def _round_capacity(n: int, multiple: int = 256) -> int:
    return max(multiple, ((n + multiple - 1) // multiple) * multiple)


def create_from_points(points: np.ndarray, colors: np.ndarray,
                       max_sh_degree: int = 3,
                       capacity: Optional[int] = None,
                       seed: int = 0) -> GaussianState:
    """Initialize splats from a point cloud (gaussian_model.create_from_pcd
    :267-301): SH-DC from RGB, log-sqrt-kNN scales, identity rotations,
    opacity 0.1, random knn_f, zero language/instance features."""
    n = points.shape[0]
    cap = capacity or _round_capacity(int(n * 1.5))
    assert cap >= n
    R = (max_sh_degree + 1) ** 2 - 1
    key = jax.random.PRNGKey(seed)

    xyz = jnp.zeros((cap, 3), jnp.float32).at[:n].set(jnp.asarray(points, jnp.float32))
    dc = rgb_to_sh(jnp.asarray(colors, jnp.float32))
    features_dc = jnp.zeros((cap, 1, 3), jnp.float32).at[:n, 0].set(dc)
    features_rest = jnp.zeros((cap, R, 3), jnp.float32)

    d2 = mean_dist3_sq(jnp.asarray(points, jnp.float32))
    dist = jnp.sqrt(jnp.maximum(d2, 1e-7))
    scaling = jnp.zeros((cap, 3), jnp.float32).at[:n].set(
        jnp.log(dist)[:, None].repeat(3, 1))

    rotation = jnp.zeros((cap, 4), jnp.float32).at[:, 0].set(1.0)
    opacity = jnp.full((cap, 1), inverse_sigmoid(jnp.asarray(0.1)), jnp.float32)
    knn_f = jnp.zeros((cap, 6), jnp.float32).at[:n].set(
        jax.random.normal(key, (n, 6)))
    alive = jnp.zeros(cap, bool).at[:n].set(True)

    return GaussianState(
        xyz=xyz, knn_f=knn_f, features_dc=features_dc,
        features_rest=features_rest, scaling=scaling, rotation=rotation,
        opacity=opacity,
        language_feature=jnp.zeros((cap, 3), jnp.float32),
        instance_feature=jnp.zeros((cap, 3), jnp.float32),
        alive=alive)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DensifyStats:
    """Densification statistics accumulated over iterations
    (gaussian_model.py:75-80, 720-724)."""
    xyz_gradient_accum: jnp.ndarray      # [CAP]
    xyz_gradient_accum_abs: jnp.ndarray  # [CAP]
    denom: jnp.ndarray                   # [CAP]
    denom_abs: jnp.ndarray               # [CAP]
    max_radii2D: jnp.ndarray             # [CAP]

    @classmethod
    def zeros(cls, cap: int) -> "DensifyStats":
        # distinct buffers per field: aliased leaves break jit donation
        z = lambda: jnp.zeros(cap, jnp.float32)
        return cls(xyz_gradient_accum=z(), xyz_gradient_accum_abs=z(),
                   denom=z(), denom_abs=z(), max_radii2D=z())

    def update(self, mean2d_grad: jnp.ndarray, mean2d_grad_abs: jnp.ndarray,
               radii: jnp.ndarray, update_filter: jnp.ndarray) -> "DensifyStats":
        """add_densification_stats (gaussian_model.py:720-724) + the
        max_radii2D tracking done in the train loop
        (gaussian_field.py:523-526)."""
        gn = jnp.linalg.norm(mean2d_grad[:, :2], axis=-1)
        ga = jnp.linalg.norm(mean2d_grad_abs[:, :2], axis=-1)
        f = update_filter
        return DensifyStats(
            xyz_gradient_accum=self.xyz_gradient_accum + jnp.where(f, gn, 0.0),
            xyz_gradient_accum_abs=self.xyz_gradient_accum_abs + jnp.where(f, ga, 0.0),
            denom=self.denom + f.astype(jnp.float32),
            denom_abs=self.denom_abs + f.astype(jnp.float32),
            max_radii2D=jnp.where(f, jnp.maximum(self.max_radii2D, radii),
                                  self.max_radii2D))
