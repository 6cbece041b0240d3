from gaussian_splatterer_tpu.models.camera import Camera  # noqa: F401
from gaussian_splatterer_tpu.models.splats import SplatModel, SplatModelHost  # noqa: F401
