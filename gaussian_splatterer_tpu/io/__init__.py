from gaussian_splatterer_tpu.io.gobj import load_gobj, save_gobj  # noqa: F401
from gaussian_splatterer_tpu.io.obj import load_obj  # noqa: F401
from gaussian_splatterer_tpu.io.ply import load_ply, save_ply  # noqa: F401
