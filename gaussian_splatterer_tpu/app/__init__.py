from gaussian_splatterer_tpu.app.session import Session

__all__ = ["Session"]
