"""TSDF fusion + mesh extraction, dependency-free.

Replaces the reference's open3d ScalableTSDFVolume usage
(gaussian_field.py:616-626, 707-740): depth maps (+ optional color/feature
images) are integrated into a dense voxel TSDF on device (one fused jnp
pass per view — projective SDF with truncation), and a triangle mesh is
extracted host-side with marching TETRAHEDRA (table-free; slightly denser
triangulation than marching cubes but topologically sound — open3d is not
available in this environment).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class TSDFVolume:
    origin: np.ndarray          # [3] world min corner
    voxel_size: float
    dims: Tuple[int, int, int]
    tsdf: jnp.ndarray           # [X,Y,Z] in [-1,1]
    weight: jnp.ndarray         # [X,Y,Z]
    color: jnp.ndarray          # [X,Y,Z,C]


def create_volume(origin, voxel_size: float, dims, channels: int = 3):
    X, Y, Z = dims
    return TSDFVolume(
        origin=np.asarray(origin, np.float32), voxel_size=voxel_size,
        dims=tuple(dims),
        tsdf=jnp.ones((X, Y, Z), jnp.float32),
        weight=jnp.zeros((X, Y, Z), jnp.float32),
        color=jnp.zeros((X, Y, Z, channels), jnp.float32))


def integrate(vol: TSDFVolume, depth: jnp.ndarray, K: jnp.ndarray,
              w2c: jnp.ndarray, color: Optional[jnp.ndarray] = None,
              trunc: float = 0.04, depth_max: float = 20.0) -> TSDFVolume:
    """Integrate one view. depth [H,W]; color [C,H,W] optional."""
    X, Y, Z = vol.dims
    H, W = depth.shape
    xs = jnp.arange(X, dtype=jnp.float32)
    ys = jnp.arange(Y, dtype=jnp.float32)
    zs = jnp.arange(Z, dtype=jnp.float32)
    gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing='ij')
    pts = jnp.stack([gx, gy, gz], -1) * vol.voxel_size + jnp.asarray(vol.origin)
    cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
    z = cam[..., 2]
    u = cam[..., 0] / jnp.maximum(z, 1e-6) * K[0, 0] + K[0, 2]
    v = cam[..., 1] / jnp.maximum(z, 1e-6) * K[1, 1] + K[1, 2]
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    in_view = (z > 0.05) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    d = depth[vi, ui]
    valid = in_view & (d > 0) & (d < depth_max)
    sdf = (d - z) / trunc
    valid = valid & (sdf > -1.0)
    sdf = jnp.clip(sdf, -1.0, 1.0)
    w_new = valid.astype(jnp.float32)
    w_tot = vol.weight + w_new
    tsdf = jnp.where(w_tot > 0,
                     (vol.tsdf * vol.weight + sdf * w_new) / jnp.maximum(w_tot, 1e-6),
                     vol.tsdf)
    new_color = vol.color
    if color is not None:
        cvals = color[:, vi, ui].transpose(1, 2, 3, 0)  # [X,Y,Z,C]
        new_color = jnp.where(
            w_tot[..., None] > 0,
            (vol.color * vol.weight[..., None] + cvals * w_new[..., None])
            / jnp.maximum(w_tot[..., None], 1e-6),
            vol.color)
    return dataclasses.replace(vol, tsdf=tsdf, weight=w_tot, color=new_color)


# six tetrahedra decomposition of a cube (corner indices)
_TETS = np.array([[0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
                  [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6]])
_CORNERS = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                     [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]])


def extract_mesh(vol: TSDFVolume, min_weight: float = 1.0):
    """Marching tetrahedra over the TSDF zero crossing.

    Returns (vertices [V,3] world, faces [F,3] int, vertex_colors [V,C]).
    Host numpy (meshing is not a hot path)."""
    tsdf = np.asarray(vol.tsdf)
    weight = np.asarray(vol.weight)
    colors = np.asarray(vol.color)
    tsdf = np.where(weight >= min_weight, tsdf, np.nan)

    X, Y, Z = vol.dims
    verts = []
    vert_cols = []
    faces = []
    edge_cache = {}

    def interp(p0, p1):
        key = (tuple(p0), tuple(p1)) if tuple(p0) < tuple(p1) else \
            (tuple(p1), tuple(p0))
        if key in edge_cache:
            return edge_cache[key]
        v0 = tsdf[p0[0], p0[1], p0[2]]
        v1 = tsdf[p1[0], p1[1], p1[2]]
        t = v0 / (v0 - v1)
        pos = (1 - t) * np.asarray(p0) + t * np.asarray(p1)
        c0 = colors[p0[0], p0[1], p0[2]]
        c1 = colors[p1[0], p1[1], p1[2]]
        col = (1 - t) * c0 + t * c1
        idx = len(verts)
        verts.append(pos)
        vert_cols.append(col)
        edge_cache[key] = idx
        return idx

    # iterate only cells containing a sign change (vectorized prefilter)
    sgn = tsdf < 0
    cells = np.zeros((X - 1, Y - 1, Z - 1), bool)
    base = sgn[:-1, :-1, :-1]
    for dx, dy, dz in _CORNERS[1:]:
        cells |= sgn[dx:X - 1 + dx, dy:Y - 1 + dy, dz:Z - 1 + dz] != base
    finite = np.ones_like(cells)
    f = np.isfinite(tsdf)
    for dx, dy, dz in _CORNERS:
        finite &= f[dx:X - 1 + dx, dy:Y - 1 + dy, dz:Z - 1 + dz]
    for cx, cy, cz in zip(*np.nonzero(cells & finite)):
        corners = [(cx + d[0], cy + d[1], cz + d[2]) for d in _CORNERS]
        for tet in _TETS:
            ps = [corners[i] for i in tet]
            vals = [tsdf[p[0], p[1], p[2]] for p in ps]
            inside = [v < 0 for v in vals]
            n_in = sum(inside)
            if n_in == 0 or n_in == 4:
                continue
            ins = [i for i in range(4) if inside[i]]
            outs = [i for i in range(4) if not inside[i]]
            if n_in == 1:
                a = ins[0]
                tri = [interp(ps[a], ps[o]) for o in outs]
                faces.append(tri)
            elif n_in == 3:
                a = outs[0]
                tri = [interp(ps[i], ps[a]) for i in ins]
                faces.append(tri[::-1])
            else:  # 2 in, 2 out -> quad = 2 triangles
                a, b = ins
                c, d = outs
                e0 = interp(ps[a], ps[c])
                e1 = interp(ps[a], ps[d])
                e2 = interp(ps[b], ps[c])
                e3 = interp(ps[b], ps[d])
                faces.append([e0, e1, e3])
                faces.append([e0, e3, e2])

    if not verts:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32),
                np.zeros((0, colors.shape[-1]), np.float32))
    V = np.asarray(verts, np.float32) * vol.voxel_size + vol.origin
    return (V, np.asarray(faces, np.int32),
            np.asarray(vert_cols, np.float32))


def post_process_mesh(verts: np.ndarray, faces: np.ndarray,
                      colors: Optional[np.ndarray] = None,
                      cluster_to_keep: int = 3):
    """Filter floaters/disconnected parts (gaussian_field.py:43-63).

    Clusters triangles connected through shared edges (the o3d
    ``cluster_connected_triangles`` semantics), keeps clusters with at
    least as many triangles as the ``cluster_to_keep``-th largest (floored
    at 50, like the reference), then drops unreferenced vertices and
    degenerate (repeated-index) triangles. Host numpy union-find.

    Returns (verts, faces, colors) with colors=None passed through."""
    F = len(faces)
    if F == 0:
        return verts, faces, colors
    parent = np.arange(F, dtype=np.int64)

    def find(i):
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:
            parent[i], i = root, parent[i]
        return root

    edge_owner = {}
    for t in range(F):
        a, b, c = faces[t]
        for e in ((a, b), (b, c), (c, a)):
            key = (e[0], e[1]) if e[0] < e[1] else (e[1], e[0])
            o = edge_owner.setdefault(key, t)
            if o != t:
                ra, rb = find(o), find(t)
                if ra != rb:
                    parent[rb] = ra
    roots = np.array([find(t) for t in range(F)])
    labels, counts = np.unique(roots, return_counts=True)
    sizes = np.sort(counts)
    kth = sizes[-min(cluster_to_keep, len(sizes))]
    thresh = max(int(kth), 50)
    keep_roots = set(labels[counts >= thresh].tolist())
    keep = np.array([r in keep_roots for r in roots])
    faces = faces[keep]
    # drop degenerate triangles (repeated vertex index)
    nondeg = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
              & (faces[:, 0] != faces[:, 2]))
    faces = faces[nondeg]
    # compact unreferenced vertices
    used = np.unique(faces)
    remap = np.full(len(verts), -1, np.int64)
    remap[used] = np.arange(len(used))
    verts = verts[used]
    faces = remap[faces].astype(faces.dtype)
    if colors is not None:
        colors = colors[used]
    return verts, faces, colors


def save_mesh_ply(path: str, verts: np.ndarray, faces: np.ndarray,
                  colors: Optional[np.ndarray] = None) -> None:
    with open(path, 'wb') as f:
        hdr = ["ply", "format binary_little_endian 1.0",
               f"element vertex {len(verts)}",
               "property float x", "property float y", "property float z"]
        if colors is not None:
            hdr += ["property uchar red", "property uchar green",
                    "property uchar blue"]
        hdr += [f"element face {len(faces)}",
                "property list uchar int vertex_indices", "end_header"]
        f.write(("\n".join(hdr) + "\n").encode())
        if colors is not None:
            dt = np.dtype([('x', '<f4'), ('y', '<f4'), ('z', '<f4'),
                           ('r', 'u1'), ('g', 'u1'), ('b', 'u1')])
            rec = np.empty(len(verts), dt)
            rec['x'], rec['y'], rec['z'] = verts.T
            c = (np.clip(colors[:, :3], 0, 1) * 255).astype(np.uint8)
            rec['r'], rec['g'], rec['b'] = c.T
            f.write(rec.tobytes())
        else:
            f.write(verts.astype('<f4').tobytes())
        fd = np.empty(len(faces), np.dtype([('n', 'u1'), ('v', '<i4', 3)]))
        fd['n'] = 3
        fd['v'] = faces
        f.write(fd.tobytes())
