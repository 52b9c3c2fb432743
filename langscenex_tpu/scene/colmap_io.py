"""COLMAP sparse-reconstruction parsing (binary and text).

Parity target: field_construction/scene/colmap_loader.py (cameras,
images, points3D in both formats). Fresh implementation against the
published COLMAP file format spec; struct layouts:

  cameras.bin: num(Q), then per camera: id(i) model(i) width(Q) height(Q)
               params(d * model_params)
  images.bin:  num(Q), then per image: id(i) qvec(4d) tvec(3d) camera_id(i)
               name(zero-terminated), npoints(Q), (x d, y d, id q)*n
  points3D.bin: num(Q), then per point: id(Q) xyz(3d) rgb(3B) error(d)
               track_len(Q), (image_id i, point2D i)*len
"""
from __future__ import annotations

import dataclasses
import os
import struct
from typing import Dict, Tuple

import numpy as np

CAMERA_MODEL_PARAMS = {
    0: ("SIMPLE_PINHOLE", 3), 1: ("PINHOLE", 4), 2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5), 4: ("OPENCV", 8), 5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12), 7: ("FOV", 5), 8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5), 10: ("THIN_PRISM_FISHEYE", 12),
}
MODEL_NAME_TO_ID = {name: mid for mid, (name, _) in CAMERA_MODEL_PARAMS.items()}


@dataclasses.dataclass
class ColmapCamera:
    id: int
    model: str
    width: int
    height: int
    params: np.ndarray


@dataclasses.dataclass
class ColmapImage:
    id: int
    qvec: np.ndarray   # wxyz
    tvec: np.ndarray
    camera_id: int
    name: str


def qvec_to_rotmat(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def read_cameras_binary(path: str) -> Dict[int, ColmapCamera]:
    out = {}
    with open(path, 'rb') as f:
        n = struct.unpack('<Q', f.read(8))[0]
        for _ in range(n):
            cid, model_id, w, h = struct.unpack('<iiQQ', f.read(24))
            name, np_ = CAMERA_MODEL_PARAMS[model_id]
            params = np.array(struct.unpack('<' + 'd' * np_, f.read(8 * np_)))
            out[cid] = ColmapCamera(cid, name, w, h, params)
    return out


def read_images_binary(path: str) -> Dict[int, ColmapImage]:
    from .. import native
    parsed = native.read_images_binary(path)
    if parsed is not None:
        return {iid: ColmapImage(iid, q, t, cid, name)
                for iid, (q, t, cid, name) in parsed.items()}
    return _read_images_binary_py(path)


def _read_images_binary_py(path: str) -> Dict[int, ColmapImage]:
    out = {}
    with open(path, 'rb') as f:
        n = struct.unpack('<Q', f.read(8))[0]
        for _ in range(n):
            iid = struct.unpack('<i', f.read(4))[0]
            qvec = np.array(struct.unpack('<4d', f.read(32)))
            tvec = np.array(struct.unpack('<3d', f.read(24)))
            cam_id = struct.unpack('<i', f.read(4))[0]
            name = b''
            while True:
                c = f.read(1)
                if c == b'\x00':
                    break
                name += c
            npts = struct.unpack('<Q', f.read(8))[0]
            f.read(24 * npts)  # skip 2D points
            out[iid] = ColmapImage(iid, qvec, tvec, cam_id,
                                   name.decode('utf-8'))
    return out


def read_points3d_binary(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    from .. import native
    parsed = native.read_points3d_binary(path)
    if parsed is not None:
        return parsed
    return _read_points3d_binary_py(path)


def _read_points3d_binary_py(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    xyzs, rgbs, errs = [], [], []
    with open(path, 'rb') as f:
        n = struct.unpack('<Q', f.read(8))[0]
        for _ in range(n):
            f.read(8)  # id
            xyzs.append(struct.unpack('<3d', f.read(24)))
            rgbs.append(struct.unpack('<3B', f.read(3)))
            errs.append(struct.unpack('<d', f.read(8)))
            tl = struct.unpack('<Q', f.read(8))[0]
            f.read(8 * tl)
    return (np.array(xyzs), np.array(rgbs), np.array(errs).reshape(-1, 1))


def read_cameras_text(path: str) -> Dict[int, ColmapCamera]:
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith('#'):
                continue
            el = line.split()
            out[int(el[0])] = ColmapCamera(
                int(el[0]), el[1], int(el[2]), int(el[3]),
                np.array([float(x) for x in el[4:]]))
    return out


def read_images_text(path: str) -> Dict[int, ColmapImage]:
    # COLMAP images.txt alternates header/2D-point lines; the points
    # line may be EMPTY (our writers emit none), so alternate on raw
    # lines rather than on a blank-stripped list.
    out = {}
    expecting_points = False
    with open(path) as f:
        for line in f:
            if line.startswith('#'):
                continue
            if expecting_points:
                expecting_points = False
                continue
            stripped = line.strip()
            if not stripped:
                continue
            el = stripped.split()
            out[int(el[0])] = ColmapImage(
                int(el[0]), np.array([float(x) for x in el[1:5]]),
                np.array([float(x) for x in el[5:8]]), int(el[8]), el[9])
            expecting_points = True
    return out


def read_points3d_text(path: str):
    xyzs, rgbs, errs = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith('#'):
                continue
            el = line.split()
            xyzs.append([float(x) for x in el[1:4]])
            rgbs.append([int(x) for x in el[4:7]])
            errs.append([float(el[7])])
    return np.array(xyzs), np.array(rgbs), np.array(errs)


# ------------------------------------------------------------- writers
# (utils/sfm_utils.py:205-320 writes these for the MASt3R/CUT3R paths)

def write_cameras_text(cameras: Dict[int, ColmapCamera], path: str):
    with open(path, 'w') as f:
        f.write("# Camera list\n")
        for cam in cameras.values():
            params = " ".join(str(p) for p in cam.params)
            f.write(f"{cam.id} {cam.model} {cam.width} {cam.height} {params}\n")


def write_images_text(images: Dict[int, ColmapImage], path: str):
    with open(path, 'w') as f:
        f.write("# Image list\n")
        for im in images.values():
            q = " ".join(str(x) for x in im.qvec)
            t = " ".join(str(x) for x in im.tvec)
            f.write(f"{im.id} {q} {t} {im.camera_id} {im.name}\n\n")


def write_cameras_binary(cameras: Dict[int, ColmapCamera], path: str):
    """cameras.bin, symmetric to read_cameras_binary (sfm_utils.py:230-249
    writes both .bin and .txt so downstream COLMAP tooling can load
    either)."""
    with open(path, 'wb') as f:
        f.write(struct.pack('<Q', len(cameras)))
        for cam in cameras.values():
            mid = MODEL_NAME_TO_ID[cam.model]
            f.write(struct.pack('<iiQQ', cam.id, mid,
                                int(cam.width), int(cam.height)))
            f.write(struct.pack('<' + 'd' * len(cam.params),
                                *[float(p) for p in cam.params]))


def write_images_binary(images: Dict[int, ColmapImage], path: str):
    """images.bin with empty 2D-point tracks (the MASt3R/CUT3R export
    has no per-image observations; sfm_utils.py:205-228 contract)."""
    with open(path, 'wb') as f:
        f.write(struct.pack('<Q', len(images)))
        for im in images.values():
            f.write(struct.pack('<i', im.id))
            f.write(struct.pack('<4d', *[float(x) for x in im.qvec]))
            f.write(struct.pack('<3d', *[float(x) for x in im.tvec]))
            f.write(struct.pack('<i', im.camera_id))
            f.write(im.name.encode('utf-8') + b'\x00')
            f.write(struct.pack('<Q', 0))


def write_points3d_binary(path: str, xyz: np.ndarray, rgb: np.ndarray,
                          errors: np.ndarray = None):
    """points3D.bin with empty tracks; rgb in [0,255] uint8."""
    n = xyz.shape[0]
    err = (np.zeros(n) if errors is None else np.asarray(errors).reshape(n))
    with open(path, 'wb') as f:
        f.write(struct.pack('<Q', n))
        for i in range(n):
            f.write(struct.pack('<Q', i + 1))
            f.write(struct.pack('<3d', *[float(v) for v in xyz[i]]))
            f.write(struct.pack('<3B', *[int(v) for v in rgb[i]]))
            f.write(struct.pack('<d', float(err[i])))
            f.write(struct.pack('<Q', 0))


def write_points3d_text(path: str, xyz: np.ndarray, rgb: np.ndarray,
                        errors: np.ndarray = None):
    n = xyz.shape[0]
    err = (np.zeros(n) if errors is None else np.asarray(errors).reshape(n))
    with open(path, 'w') as f:
        f.write("# 3D point list\n")
        for i in range(n):
            x, y, z = (float(v) for v in xyz[i])
            r, g, b = (int(v) for v in rgb[i])
            f.write(f"{i + 1} {x} {y} {z} {r} {g} {b} {float(err[i])}\n")
