from gaussian_splatterer_tpu.rt.tracer import (
    MAX_BOUNCES,
    RtxHost,
    render_rtx,
    trace_rays,
)

__all__ = ["MAX_BOUNCES", "RtxHost", "render_rtx", "trace_rays"]
