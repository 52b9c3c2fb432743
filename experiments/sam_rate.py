"""Stage-2 on-chip rates: SAM1 ViT-H encode + AMG decode batch, SAM2
Hiera-L frame encode + memory-conditioned track step (random weights —
rates are weight-independent)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from langscenex_tpu.models.sam1 import SAM1, SAM1Config
from langscenex_tpu.models.sam2.model import (SAM2, SAM2Config,
                                              init_sam2_params)


def fetch(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timed(name, fn, *args, n=3):
    fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n - 1):
        out = fn(*args)
    fetch(out)
    dt = (time.perf_counter() - t0) / (n - 1)
    print(f"{name:44s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def main(which):
    # ---- SAM1 ViT-H (1024^2) ----
    c1 = SAM1Config()
    m1 = SAM1(c1)
    img = jnp.zeros((1, 3, 1024, 1024), jnp.float32)
    if which == 'sam2':
        return sam2_part(None)
    def init_all(mdl, im):
        feats = mdl.encode_image(im)
        coords = jnp.zeros((1, 1, 2))
        labels = jnp.ones((1, 1), jnp.int32)
        return mdl.decode_points(feats, coords, labels, True)

    p1 = jax.eval_shape(lambda: m1.init(jax.random.PRNGKey(0), img,
                                        method=init_all))
    p1 = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), p1)
    enc1 = jax.jit(lambda p, im: m1.apply(p, im, method=SAM1.encode_image))
    feats = enc1(p1, img)
    timed("SAM1 ViT-H encode 1024^2", enc1, p1, img)

    dec1 = jax.jit(lambda p, f, pts, lbl: m1.apply(
        p, f, pts, lbl, True, method=SAM1.decode_points))
    B = 64
    featsB = jnp.broadcast_to(feats, (B,) + feats.shape[1:])
    pts = jnp.zeros((B, 1, 2)) + 512.0
    lbl = jnp.ones((B, 1), jnp.int32)
    timed("SAM1 AMG decode batch=64", dec1, p1, featsB, pts, lbl)

    if which != 'sam1':
        sam2_part(c1 if False else None)


def sam2_part(_):
    # ---- SAM2 Hiera-L (1024^2) ----
    c2 = SAM2Config()
    m2 = SAM2(c2)
    shapes = jax.eval_shape(lambda: init_sam2_params(m2))
    p2 = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype),
                                shapes)
    img2 = jnp.zeros((1, 3, 1024, 1024), jnp.float32)
    enc2 = jax.jit(lambda p, im: m2.apply(p, im,
                                          method=SAM2.forward_image))
    out = enc2(p2, img2)
    timed("SAM2 Hiera-L frame encode 1024^2", enc2, p2, img2)

    feats2 = out["backbone_fpn"][-1]
    high = out["backbone_fpn"][:2]
    pos = out["vision_pos_enc"][-1]
    h, w = feats2.shape[1:3]
    mem_dim = c2.memory.mem_dim
    n_mem = c2.memory.num_maskmem
    memory = jnp.zeros((1, n_mem * h * w, mem_dim))
    mem_pos = jnp.zeros_like(memory)

    def track(p, f, po, mem, mpos, h0, h1):
        def body(mdl, f, po, mem, mpos, h0, h1):
            cond = mdl.condition_features(f, po, mem, mpos, 0)
            return mdl.forward_sam_heads(cond, high_res_features=[h0, h1],
                                         multimask_output=False)
        return m2.apply(p, f, po, mem, mpos, high[0], high[1], method=body)

    tr = jax.jit(track)
    timed("SAM2 memory-conditioned track step", tr, p2, feats2, pos,
          memory, mem_pos, high[0], high[1])


if __name__ == "__main__":
    import sys
    main(sys.argv[1] if len(sys.argv) > 1 else 'all')
