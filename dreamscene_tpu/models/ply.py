"""PLY import/export, byte-compatible with the reference's splat PLYs.

Attribute list and channel-major f_dc/f_rest ordering match
gs_renderer.py:727-760 (construct_list_of_attributes / save_ply), so models
round-trip with the reference and with common 3DGS viewers. No plyfile
dependency — hand-rolled binary-little-endian writer/reader (ascii read
supported too).
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp


def _ply_header(n: int, props: list[str]) -> bytes:
    lines = [
        "ply",
        "format binary_little_endian 1.0",
        f"element vertex {n}",
    ]
    lines += [f"property float {p}" for p in props]
    lines.append("end_header")
    return ("\n".join(lines) + "\n").encode("ascii")


def splat_property_names(sh_degree: int) -> list[str]:
    k = (sh_degree + 1) ** 2
    props = ["x", "y", "z", "nx", "ny", "nz"]
    props += [f"f_dc_{i}" for i in range(3)]
    props += [f"f_rest_{i}" for i in range(3 * (k - 1))]
    props += ["opacity"]
    props += [f"scale_{i}" for i in range(3)]
    props += [f"rot_{i}" for i in range(4)]
    return props


def save_splat_ply(path: str, state) -> None:
    """Write a GaussianState's active splats (raw, pre-activation values —
    same convention as the reference save_ply, gs_renderer.py:727-752)."""
    from dreamscene_tpu.models.gaussians import GaussianState  # noqa: F401

    active = np.asarray(state.aux.active)
    idx = np.nonzero(active)[0]
    xyz = np.asarray(state.params.xyz)[idx]
    n = xyz.shape[0]
    normals = np.zeros_like(xyz)
    # channel-major flatten: [N, K, 3] -> transpose -> [N, 3*(K)] like torch
    # .transpose(1, 2).flatten(start_dim=1)
    f_dc = np.asarray(state.params.features_dc)[idx].transpose(0, 2, 1).reshape(n, -1)
    f_rest = np.asarray(state.params.features_rest)[idx].transpose(0, 2, 1).reshape(n, -1)
    opacity = np.asarray(state.params.opacity)[idx]
    scale = np.asarray(state.params.scaling)[idx]
    rot = np.asarray(state.params.rotation)[idx]

    data = np.concatenate(
        [xyz, normals, f_dc, f_rest, opacity, scale, rot], axis=1
    ).astype("<f4")
    props = splat_property_names(state.sh_degree)
    assert data.shape[1] == len(props), (data.shape, len(props))

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(_ply_header(n, props))
        f.write(data.tobytes())


def _parse_ply(path: str):
    """Minimal PLY reader: returns (names, [N, P] float32 data). Supports
    binary_little_endian and ascii, float/double/uchar properties."""
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            line = f.readline()
            if not line:
                raise ValueError(f"bad PLY header in {path}")
            header += line
        lines = header.decode("ascii").strip().split("\n")
        fmt = None
        n = 0
        names, types = [], []
        type_map = {
            "float": "<f4", "float32": "<f4", "double": "<f8",
            "uchar": "u1", "uint8": "u1", "int": "<i4", "uint": "<u4",
            "short": "<i2", "ushort": "<u2", "char": "i1",
        }
        in_vertex = False
        for ln in lines:
            parts = ln.split()
            if not parts:
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                in_vertex = parts[1] == "vertex"
                if in_vertex:
                    n = int(parts[2])
            elif parts[0] == "property" and in_vertex:
                if parts[1] == "list":
                    raise ValueError("list properties unsupported")
                types.append(type_map[parts[1]])
                names.append(parts[2])

        dtype = np.dtype([(nm, tp) for nm, tp in zip(names, types)])
        if fmt == "binary_little_endian":
            raw = np.frombuffer(f.read(n * dtype.itemsize), dtype=dtype, count=n)
        elif fmt == "ascii":
            raw = np.loadtxt(f, dtype=dtype, max_rows=n)
        else:
            raise ValueError(f"unsupported PLY format {fmt}")
    data = np.stack([raw[nm].astype(np.float32) for nm in names], axis=1)
    return names, data


def load_splat_ply(path: str, sh_degree: int | None = None, capacity=None,
                   spatial_lr_scale: float = 1.0):
    """Read a splat PLY (ours or the reference's) into a GaussianState
    (reference: load_ply, gs_renderer.py:762-852)."""
    import dataclasses

    from dreamscene_tpu.models.gaussians import (
        GaussianAux,
        GaussianParams,
        GaussianState,
        adam_init,
    )

    names, data = _parse_ply(path)
    col = {nm: i for i, nm in enumerate(names)}
    n = data.shape[0]

    n_rest = sum(1 for nm in names if nm.startswith("f_rest_"))
    k = n_rest // 3 + 1
    deg = int(round(np.sqrt(k))) - 1
    if sh_degree is None:
        sh_degree = deg
    assert (sh_degree + 1) ** 2 == k, (sh_degree, k)

    cap = capacity or n
    cap = max(cap, n)

    def take(prefix, count):
        return np.stack(
            [data[:, col[f"{prefix}_{i}"]] for i in range(count)], axis=1
        )

    xyz = np.zeros((cap, 3), np.float32)
    xyz[:n] = np.stack([data[:, col[c]] for c in "xyz"], axis=1)
    f_dc = np.zeros((cap, 1, 3), np.float32)
    f_dc[:n] = take("f_dc", 3).reshape(n, 3, 1).transpose(0, 2, 1)
    f_rest = np.zeros((cap, k - 1, 3), np.float32)
    f_rest[:n] = take("f_rest", 3 * (k - 1)).reshape(n, 3, k - 1).transpose(0, 2, 1)
    opacity = np.zeros((cap, 1), np.float32)
    opacity[:n, 0] = data[:, col["opacity"]]
    scaling = np.zeros((cap, 3), np.float32)
    scaling[:n] = take("scale", 3)
    rotation = np.zeros((cap, 4), np.float32)
    rotation[:, 0] = 1.0
    rotation[:n] = take("rot", 4)

    params = GaussianParams(
        xyz=jnp.asarray(xyz),
        features_dc=jnp.asarray(f_dc),
        features_rest=jnp.asarray(f_rest),
        scaling=jnp.asarray(scaling),
        rotation=jnp.asarray(rotation),
        opacity=jnp.asarray(opacity),
        background=jnp.zeros((3,), jnp.float32),
    )
    aux = GaussianAux(
        active=jnp.arange(cap) < n,
        max_radii2d=jnp.zeros((cap,), jnp.float32),
        xyz_gradient_accum=jnp.zeros((cap,), jnp.float32),
        denom=jnp.zeros((cap,), jnp.float32),
    )
    return GaussianState(
        params=params,
        aux=aux,
        opt=adam_init(params),
        sh_degree=sh_degree,
        active_sh_degree=sh_degree,  # loaded models render at full degree
        spatial_lr_scale=spatial_lr_scale,
    )


def store_point_ply(path: str, xyz: np.ndarray, rgb: np.ndarray) -> None:
    """Plain colored point cloud (reference storePly, gs_renderer.py:26-47)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n = xyz.shape[0]
    header = [
        "ply",
        "format binary_little_endian 1.0",
        f"element vertex {n}",
        "property float x", "property float y", "property float z",
        "property float nx", "property float ny", "property float nz",
        "property uchar red", "property uchar green", "property uchar blue",
        "end_header",
    ]
    dtype = np.dtype(
        [(c, "<f4") for c in ["x", "y", "z", "nx", "ny", "nz"]]
        + [(c, "u1") for c in ["red", "green", "blue"]]
    )
    rec = np.empty(n, dtype)
    for i, c in enumerate("xyz"):
        rec[c] = xyz[:, i].astype(np.float32)
    for c in ["nx", "ny", "nz"]:
        rec[c] = 0.0
    rgb_u8 = np.clip(rgb, 0, 255).astype(np.uint8) if rgb.max() > 1.5 else np.clip(
        rgb * 255, 0, 255
    ).astype(np.uint8)
    for i, c in enumerate(["red", "green", "blue"]):
        rec[c] = rgb_u8[:, i]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(rec.tobytes())


def fetch_point_ply(path: str):
    """Read a colored point cloud: returns (points [N,3], colors [N,3] in
    [0,1]) (reference fetchPly, gs_renderer.py:17-23)."""
    names, data = _parse_ply(path)
    col = {nm: i for i, nm in enumerate(names)}
    pts = np.stack([data[:, col[c]] for c in "xyz"], axis=1)
    rgb = np.stack(
        [data[:, col[c]] for c in ["red", "green", "blue"]], axis=1
    )
    if rgb.max() > 1.5:
        rgb = rgb / 255.0
    return pts.astype(np.float32), rgb.astype(np.float32)
