"""Headline benchmark: fwd+bwd rasterize ms/frame @ 50k splats, 1024x1024.

Prints ONE JSON line.  The reference publishes no numbers (BASELINE.md), so
``vs_baseline`` is measured against the reference's only quantitative
anchor: the 100 steps/s auto-train budget (src/Config.h:10) at its default
16-camera rig = 32 rasterize fwd+bwd frames per step, i.e. a frame budget
of 1000/(100*32) = 0.3125 ms/frame.  vs_baseline = budget / measured
(>1 means faster than the reference's aspirational ceiling).

The measured path is the production training fast path: the frame-BATCHED
fused Pallas kernel (binning + forward + signed residual + gradient replay,
ops/raster_tiled.render_train_grads_batch) — the same code driving
Trainer/auto-train.  Before timing, an on-TPU numerics gate asserts the
tiled forward matches the per-pixel oracle on the real chip (the bf16
ray-NaN class of regression fails the bench loudly instead of silently
shipping bad numerics).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatterer_tpu.models.camera import Camera
from gaussian_splatterer_tpu.ops.raster_tiled import (
    image_to_tiles_cm,
    render_train_grads_batch,
)

W = H = 1024
N_SPLATS = 50_000
CAPACITY = 65_536
TILE = 32  # measured fastest on v5e (16: 81 ms, 32: 63 ms, 64: VMEM OOM)
MAX_DUP = 180224  # ~168k duplicates at this scene/tile; chunk-multiple
# with ~7% headroom — the D-sized gradient-reduction sorts/cumsums scale
# with this, so power-of-two rounding wasted 3.7 ms/frame (20.6 vs 24.2)
CHUNK = 256  # 19% faster than 128 (fewer work items; matmuls stay hidden)
WORK_CAP = 2304  # work-list budget: true count 2163 items/frame + slack
# (the window worklist needs fewer items than the old block scheme's 2723:
# single-window tiles are one fused item regardless of block straddling;
# the sound worst-case capacity is 5504 — pure pad slack costs grid steps)
FRAMES = 8  # frames per fused launch (the trainer's default frame_group)
REPS = 30
REFERENCE_FRAME_BUDGET_MS = 1000.0 / (100.0 * 32.0)

# On-TPU numerics gate tolerance: measured max |tiled - oracle| forward
# deviation is ~6.4e-3 (PERF.md "TPU numerics audit" — residual error from
# the compositing kernel's MXU cumsums); 2e-2 fails loudly on regressions
# an order of magnitude above that.
NUMERICS_ATOL = 2e-2
GATE_RES = 128
GATE_SPLATS = 150
# Gradient-parity gate tolerance (max per-parameter relative deviation of
# the PRODUCTION fused path vs the CPU oracle's jax.grad).  Measured on
# v5e after the round-3 precision=HIGHEST fix: 9.0e-3 with the production
# mm_bf16 cumsums (their ~0.2% input rounding dominates).  The regression
# class this guards (Pallas silently lowering f32 dots as single-pass
# bf16) measured 0.57 relative on scale/rot gradients — 5e-2 fails loudly
# an order of magnitude below that while sitting ~5x above the healthy
# reading.
GRAD_GATE_RTOL = 5e-2


def build_scene(n_splats, capacity, width, height, n_frames, seed=0):
    rng = np.random.default_rng(seed)
    means = np.zeros((capacity, 3), np.float32)
    means[:n_splats] = rng.uniform(-3, 3, (n_splats, 3))
    shs = np.zeros((capacity, 4, 3), np.float32)
    shs[:n_splats] = rng.normal(0, 0.5, (n_splats, 4, 3))
    scales = np.zeros((capacity, 3), np.float32)
    scales[:n_splats] = rng.uniform(0.01, 0.08, (n_splats, 3))
    opac = np.zeros((capacity,), np.float32)
    opac[:n_splats] = rng.uniform(0.2, 1.0, n_splats)
    rot = np.zeros((capacity, 4), np.float32)
    rot[:, 0] = 1.0
    rot[:n_splats] = rng.normal(0, 1, (n_splats, 4))
    active = np.arange(capacity) < n_splats
    cams = [
        Camera(
            np.array([0.3 + 0.2 * i, -0.2, -10.0 - 0.5 * i], np.float32),
            np.zeros(3, np.float32), 60.0,
        )
        for i in range(n_frames)
    ]
    views = jnp.stack([jnp.asarray(c.get_view()) for c in cams])
    pvs = jnp.stack([jnp.asarray(c.get_proj_view(1.0)) for c in cams])
    poss = jnp.stack([jnp.asarray(c.location) for c in cams])
    tans = np.array(
        [c.tan_fov(width, height, train=True) for c in cams], np.float32
    )
    return (
        tuple(map(jnp.asarray, (means, shs, scales, opac, rot))),
        jnp.asarray(active),
        views, pvs, poss,
        jnp.asarray(tans[:, 0]), jnp.asarray(tans[:, 1]),
        cams,
    )


def numerics_gate():
    """Assert tiled-vs-oracle forward parity ON THE REAL CHIP."""
    from gaussian_splatterer_tpu.ops.raster_reference import render_oracle
    from gaussian_splatterer_tpu.ops.raster_tiled import render_tiled

    params, active, views, pvs, poss, txs, tys, cams = build_scene(
        GATE_SPLATS, 256, GATE_RES, GATE_RES, 1, seed=7
    )
    bg = jnp.asarray([0.2, 0.3, 0.4], jnp.float32)
    args = (*params, active, views[0], pvs[0], poss[0], txs[0], tys[0],
            GATE_RES, GATE_RES, bg, 1, 1.0)
    img_t = np.asarray(
        jax.jit(lambda: render_tiled(*args, tile=16, max_dup=2**13))()
    )
    # oracle runs on CPU (the exact per-pixel reference, tile-granular cull)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        cpu_args = jax.device_put(args[:5], cpu) + args[5:]
        img_o = np.asarray(
            render_oracle(*cpu_args, row_chunk=16, tile_cull=16)
        )
    err = float(np.max(np.abs(img_t - img_o)))
    if not np.isfinite(img_t).all() or err > NUMERICS_ATOL:
        raise SystemExit(
            f"TPU numerics gate FAILED: max|tiled-oracle| = {err:.2e} "
            f"(allowed {NUMERICS_ATOL}) or non-finite output"
        )
    return err


def grad_gate():
    """Assert tiled-vs-oracle GRADIENT parity ON THE REAL CHIP.

    The round-3 silent-precision regression (Pallas f32 dots lowering as a
    single bf16 MXU pass: scale/rot gradients up to 57% off) was caught by
    a hand-run script (scripts/gate_debug.py); this automates the check so
    the next precision regression fails BENCH loudly.  The production path
    (mm_bf16 + precision=HIGHEST moment matmuls) runs on the TPU; the
    reference is jax.grad of the oracle's negative half squared error on
    CPU — the same quantity render_train_grads_batch defines its grads as
    (J^T residual, the reference convention src/Trainer.cu:33-44)."""
    from gaussian_splatterer_tpu.ops.raster_reference import render_oracle

    params, active, views, pvs, poss, txs, tys, _ = build_scene(
        GATE_SPLATS, 256, GATE_RES, GATE_RES, 2, seed=11
    )
    rng = np.random.default_rng(3)
    truths_np = rng.uniform(0, 1, (2, GATE_RES, GATE_RES, 3)).astype(np.float32)
    tt = jax.vmap(lambda im: image_to_tiles_cm(im, 32))(jnp.asarray(truths_np))
    bgs = jnp.zeros((2, 3), jnp.float32)
    _, g_t, *_ = jax.jit(
        lambda p, t: render_train_grads_batch(
            *p, active, views, pvs, poss, txs, tys,
            GATE_RES, GATE_RES, t, bgs, 1,
            tile=32, max_dup=2**13, mm_bf16=True,
        )
    )(params, tt)
    g_t = jax.tree.map(np.asarray, g_t)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        inputs = jax.device_put(
            (params, active, views, pvs, poss, txs, tys, jnp.asarray(truths_np)),
            cpu,
        )
        p_c, active_c, views_c, pvs_c, poss_c, txs_c, tys_c, tr_c = inputs
        bg_c = jnp.zeros((3,), jnp.float32)

        def neg_half_sq(p):
            total = jnp.float32(0.0)
            for i in range(2):
                img = render_oracle(
                    *p, active_c, views_c[i], pvs_c[i], poss_c[i],
                    txs_c[i], tys_c[i], GATE_RES, GATE_RES, bg_c, 1, 1.0,
                    row_chunk=16, tile_cull=32,
                )
                total = total - 0.5 * jnp.sum(jnp.square(img - tr_c[i]))
            return total

        g_o = jax.tree.map(np.asarray, jax.grad(neg_half_sq)(p_c))

    worst = 0.0
    for name, a, b in zip(
        ["means", "shs", "scales", "opacities", "rotations"], g_t, g_o
    ):
        scale = max(1e-3, float(np.max(np.abs(b))))
        dev = float(np.max(np.abs(a - b))) / scale
        if not np.isfinite(a).all():
            raise SystemExit(f"TPU grad gate FAILED: non-finite {name} gradients")
        if dev > GRAD_GATE_RTOL:
            raise SystemExit(
                f"TPU grad gate FAILED: {name} gradient deviation {dev:.2e} "
                f"(allowed {GRAD_GATE_RTOL}) vs CPU oracle"
            )
        worst = max(worst, dev)
    return worst


def gate_kernel_options():
    """Compile + numerics check of the optional train-kernel fast paths
    (train_mm_power, train_fast_exp) ON THE REAL CHIP, against the default
    train path at the same scale.  Interpret-mode parity is covered by the
    test suite; this catches Mosaic-lowering and TPU-precision regressions
    (e.g. a small-K dot the compiler mishandles).  Non-fatal: the headline
    timing uses the measured default path either way."""
    params, active, views, pvs, poss, txs, tys, _ = build_scene(
        GATE_SPLATS, 256, GATE_RES, GATE_RES, 2, seed=11
    )
    rng = np.random.default_rng(3)
    truths = jnp.asarray(
        rng.uniform(0, 1, (2, GATE_RES, GATE_RES, 3)).astype(np.float32)
    )
    tt = jax.vmap(lambda im: image_to_tiles_cm(im, 32))(truths)
    bgs = jnp.zeros((2, 3), jnp.float32)

    def run(**kw):
        loss, grads, _, _, _, _ = jax.jit(
            lambda p, t: render_train_grads_batch(
                *p, active, views, pvs, poss, txs, tys,
                GATE_RES, GATE_RES, t, bgs, 1,
                tile=32, max_dup=2**13, **kw,
            )
        )(params, tt)
        return float(loss), jax.tree.map(np.asarray, grads)

    try:
        # option-numerics check in f32 (bf16 cumsums round each path's
        # slightly-different inputs independently, inflating the diff past
        # the options' true effect).  Measured on-chip after the round-3
        # mm_power precision=HIGHEST fix: dloss_rel 5.5e-7, max grad dev
        # 6.1e-3 relative-to-max (isolated alpha>=1/255 threshold flips
        # from the options' last-ulp exponent differences — scattered
        # single elements, not systematic error).  Tolerances sit ~3x
        # above: the broken-mm_power failure mode this gate exists for
        # measured dloss_rel 1.1e-2 and grad dev 5.2e+0.
        l0, g0 = run()
        l1, g1 = run(mm_power=True, fast_exp=True)
        if not np.isfinite(l1) or abs(l1 - l0) > 1e-4 * max(abs(l0), 1e-6):
            return f"loss mismatch: {l0} vs {l1}"
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            scale = max(1e-3, float(np.max(np.abs(a))))
            if not np.isfinite(b).all() or np.max(np.abs(a - b)) / scale > 2e-2:
                return f"grad deviation {np.max(np.abs(a - b)) / scale:.1e}"
        # then the full PRODUCTION composition (bf16 cumsums + both
        # options): compile + finite + loss sanity on the real chip
        lb, gb = run(mm_bf16=True, mm_power=True, fast_exp=True)
        if not np.isfinite(lb) or abs(lb - l0) > 0.05 * max(abs(l0), 1e-6):
            return f"bf16 composition loss mismatch: {l0} vs {lb}"
        if not all(np.isfinite(g).all() for g in jax.tree.leaves(gb)):
            return "bf16 composition produced non-finite gradients"
        return "ok"
    except Exception as e:  # Mosaic compile errors etc.
        return f"failed: {type(e).__name__}: {e}"[:200]


def main():
    gate_err = numerics_gate()
    grad_err = grad_gate()
    opt_gate = gate_kernel_options()

    params, active, views, pvs, poss, txs, tys, cams = build_scene(
        N_SPLATS, CAPACITY, W, H, FRAMES
    )
    rng = np.random.default_rng(1)
    truths = jnp.asarray(
        rng.uniform(0, 1, (FRAMES, H, W, 3)).astype(np.float32)
    )
    truth_tiles = jax.vmap(lambda im: image_to_tiles_cm(im, TILE))(truths)
    bgs = jnp.zeros((FRAMES, 3), jnp.float32)

    @jax.jit
    def fwdbwd(p, tt):
        loss, grads, var, _, nd, nw = render_train_grads_batch(
            *p, active, views, pvs, poss, txs, tys, W, H, tt, bgs, 1,
            tile=TILE, max_dup=MAX_DUP, chunk=CHUNK, work_cap=WORK_CAP,
            mm_bf16=True,  # production trainer default (train_mm_bf16)
        )
        return loss, grads, nd, nw

    out = fwdbwd(params, truth_tiles)  # compile
    jax.block_until_ready(out)
    assert int(out[2]) <= MAX_DUP, "bench scene overflows the binning buffer"
    assert int(out[3]) <= WORK_CAP, "bench scene overflows the work-list budget"
    # pipelined timing: dispatch REPS batched steps, block once (training
    # dispatches steps back-to-back the same way; amortizes tunnel latency)
    t0 = time.perf_counter()
    outs = [fwdbwd(params, truth_tiles) for _ in range(REPS)]
    jax.block_until_ready(outs)
    ms_per_frame = (time.perf_counter() - t0) * 1e3 / (REPS * FRAMES)

    print(
        json.dumps(
            {
                "metric": "fwd+bwd rasterize ms/frame (50k splats, 1024x1024)",
                "value": round(ms_per_frame, 2),
                "unit": "ms/frame",
                "vs_baseline": round(REFERENCE_FRAME_BUDGET_MS / ms_per_frame, 4),
                "numerics_gate_max_err": round(gate_err, 5),
                "grad_gate_max_err": round(grad_err, 5),
                "kernel_options_gate": opt_gate,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
