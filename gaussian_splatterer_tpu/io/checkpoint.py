"""Binary checkpoints: fast native save/resume alongside .gobj interop.

The reference's only persistence is the text .gobj + settings.json pair
(SURVEY §5 'Checkpoint / resume').  Text round-trips lose precision (%g)
and scale poorly past ~100k splats, so the framework's own checkpoints are
a single .npz holding the exact float32 arrays plus the Project settings —
bit-exact resume.  .gobj remains the interop format with the reference.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from gaussian_splatterer_tpu.config import Project
from gaussian_splatterer_tpu.models.splats import SplatModel

FORMAT_VERSION = 1


def save_checkpoint(path: str, model: SplatModel, project: Optional[Project] = None) -> None:
    payload = {
        "format_version": np.int32(FORMAT_VERSION),
        "means": np.asarray(model.means),
        "shs": np.asarray(model.shs),
        "scales": np.asarray(model.scales),
        "opacities": np.asarray(model.opacities),
        "rotations": np.asarray(model.rotations),
        "count": np.asarray(model.count),
        "sh_degree": np.int32(model.sh_degree),
    }
    if project is not None:
        payload["project_json"] = np.frombuffer(
            json.dumps(project.to_json()).encode(), dtype=np.uint8
        )
    # atomic replace: a crash mid-write (the scenario checkpoints exist for)
    # must not corrupt the previous checkpoint at `path`
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Tuple[SplatModel, Optional[Project]]:
    with np.load(path) as z:
        version = int(z["format_version"])
        if version > FORMAT_VERSION:
            raise ValueError(f"checkpoint format {version} is newer than supported")
        model = SplatModel(
            means=jnp.asarray(z["means"]),
            shs=jnp.asarray(z["shs"]),
            scales=jnp.asarray(z["scales"]),
            opacities=jnp.asarray(z["opacities"]),
            rotations=jnp.asarray(z["rotations"]),
            count=jnp.asarray(z["count"]),
            sh_degree=int(z["sh_degree"]),
        )
        project = None
        if "project_json" in z:
            project = Project.from_json(
                json.loads(bytes(z["project_json"]).decode())
            )
    return model, project
