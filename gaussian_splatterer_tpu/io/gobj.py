"""Custom Gaussian-OBJ (.gobj) text format, interoperable with the reference.

Per splat, five lines (reference writer src/ui/UiFrame.cpp:333-358, reader
src/ui/UiFrame.cpp:373-450):

    v  x y z
    sh c0 ... c{3K-1}          (K = SH coefficient count; row-major (K, 3))
    s  sx sy sz
    a  opacity
    r  q0 q1 q2 q3

The SH coefficient count is inferred from the first ``sh`` line and must be
consistent across the file (reference src/ui/UiFrame.cpp:419-420).
"""

from __future__ import annotations

import io as _io
from typing import TextIO, Union

import numpy as np

from gaussian_splatterer_tpu.models.splats import SplatModelHost

try:  # optional C++ fast path (gaussian_splatterer_tpu/native)
    from gaussian_splatterer_tpu.native import gobj_native as _native
except Exception:  # pragma: no cover - native lib not built
    _native = None


def save_gobj(model: SplatModelHost, path_or_file: Union[str, TextIO]) -> None:
    if _native is not None and isinstance(path_or_file, str):
        n = model.count
        if _native.save_gobj(
            path_or_file, model.means[:n], model.shs[:n], model.scales[:n],
            model.opacities[:n], model.rotations[:n],
        ):
            return
    fh: TextIO
    own = isinstance(path_or_file, str)
    fh = open(path_or_file, "w") if own else path_or_file
    try:
        n, k = model.count, model.sh_coeffs
        buf = _io.StringIO()
        for i in range(n):
            loc = model.means[i]
            buf.write(f"v {loc[0]:g} {loc[1]:g} {loc[2]:g}\n")
            buf.write("sh " + " ".join(f"{x:g}" for x in model.shs[i].reshape(3 * k)) + "\n")
            s = model.scales[i]
            buf.write(f"s {s[0]:g} {s[1]:g} {s[2]:g}\n")
            buf.write(f"a {model.opacities[i]:g}\n")
            r = model.rotations[i]
            buf.write(f"r {r[0]:g} {r[1]:g} {r[2]:g} {r[3]:g}\n")
        fh.write(buf.getvalue())
    finally:
        if own:
            fh.close()


def load_gobj(path_or_file: Union[str, TextIO], capacity: int | None = None) -> SplatModelHost:
    if _native is not None and isinstance(path_or_file, str):
        arrays = _native.load_gobj(path_or_file)
        if arrays is not None:
            means, shs, scales, opacities, rotations = arrays
            return SplatModelHost.from_arrays(
                means, shs, scales, opacities, rotations, capacity=capacity
            )
    own = isinstance(path_or_file, str)
    fh = open(path_or_file) if own else path_or_file
    try:
        means: list[list[float]] = []
        shs: list[list[float]] = []
        scales: list[list[float]] = []
        opacities: list[float] = []
        rotations: list[list[float]] = []
        sh_coeffs: int | None = None
        for line in fh:
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            if tag == "v":
                means.append([float(x) for x in parts[1:4]])
            elif tag == "sh":
                vals = [float(x) for x in parts[1:]]
                if sh_coeffs is None:
                    sh_coeffs = len(vals)
                elif sh_coeffs != len(vals):
                    raise ValueError("Inconsistent SH degree!")
                shs.append(vals)
            elif tag == "s":
                scales.append([float(x) for x in parts[1:4]])
            elif tag == "a":
                opacities.append(float(parts[1]))
            elif tag == "r":
                rotations.append([float(x) for x in parts[1:5]])
        return SplatModelHost.from_arrays(
            np.asarray(means, np.float32),
            np.asarray(shs, np.float32),
            np.asarray(scales, np.float32),
            np.asarray(opacities, np.float32),
            np.asarray(rotations, np.float32),
            capacity=capacity,
        )
    finally:
        if own:
            fh.close()
