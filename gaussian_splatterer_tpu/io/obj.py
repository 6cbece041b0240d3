"""Wavefront OBJ loading with the reference's exact semantics.

The reference parser (src/rtx/RtxHost.cpp:107-186) supports:
  * ``v x y z`` vertices
  * ``vt u v`` texture coordinates
  * ``f`` faces with 3 or 4 ``v/vt/vn`` corners (quads split 0-1-2 / 0-2-3)

Per-triangle texture coordinates are resolved eagerly: each triangle stores
its own three (u, v) pairs, falling back to (0, 0) when any corner lacks a
``vt`` index (src/rtx/RtxHost.cpp:171-183).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

try:  # optional C++ fast path
    from gaussian_splatterer_tpu.native import obj_native as _native
except Exception:  # pragma: no cover
    _native = None


@dataclass
class TriangleMesh:
    """Host triangle mesh ready for upload to the tracer.

    vertices:   (V, 3) float32
    triangles:  (T, 3) int32 vertex indices
    tri_uv:     (T, 3, 2) float32 per-corner texture coordinates
    """

    vertices: np.ndarray
    triangles: np.ndarray
    tri_uv: np.ndarray

    @property
    def num_triangles(self) -> int:
        return self.triangles.shape[0]


def load_obj(path: str, progress: Optional[Callable[[], None]] = None) -> TriangleMesh:
    if _native is not None and progress is None:
        arrays = _native.load_obj(path)
        if arrays is not None:
            return TriangleMesh(*arrays)

    vertices: list[tuple[float, float, float]] = []
    uvs: list[tuple[float, float]] = []
    triangles: list[tuple[int, int, int]] = []
    tri_uv_idx: list[tuple[int, int, int]] = []  # 1-based vt indices, 0 = missing

    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if not parts:
                if progress:
                    progress()
                continue
            tag = parts[0]
            if tag == "v":
                vertices.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif tag == "vt":
                uvs.append((float(parts[1]), float(parts[2])))
            elif tag == "f":
                corners = []
                for tok in parts[1:]:
                    sub = tok.split("/")
                    if not sub[0]:
                        raise ValueError(f"face corner without vertex index: {tok!r}")
                    vi = int(sub[0])
                    if vi < 0:  # OBJ relative index: -1 = latest defined
                        vi = len(vertices) + vi + 1
                    ti = int(sub[1]) if len(sub) > 1 and sub[1] else 0
                    if ti < 0:
                        ti = len(uvs) + ti + 1
                    if not 1 <= vi <= len(vertices):
                        raise ValueError(
                            f"face vertex index {tok!r} out of range "
                            f"({len(vertices)} vertices defined so far)"
                        )
                    corners.append((vi, ti))
                if len(corners) == 4:
                    for tri in ((0, 1, 2), (0, 2, 3)):
                        triangles.append(tuple(corners[i][0] - 1 for i in tri))
                        tri_uv_idx.append(tuple(corners[i][1] for i in tri))
                elif len(corners) == 3:
                    triangles.append(tuple(c[0] - 1 for c in corners))
                    tri_uv_idx.append(tuple(c[1] for c in corners))
                else:
                    raise ValueError(
                        f"Unexpected vertex count in face list! {len(corners)}"
                    )
            if progress:
                progress()

    verts = np.asarray(vertices, np.float32).reshape(-1, 3)
    tris = np.asarray(triangles, np.int32).reshape(-1, 3)
    uv_ref = np.asarray(uvs, np.float32).reshape(-1, 2) if uvs else np.zeros((0, 2), np.float32)
    t = tris.shape[0]
    tri_uv = np.zeros((t, 3, 2), np.float32)
    for i, idx3 in enumerate(tri_uv_idx):
        if all(j > 0 for j in idx3):
            tri_uv[i] = uv_ref[[j - 1 for j in idx3]]
    return TriangleMesh(verts, tris, tri_uv)
