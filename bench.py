#!/usr/bin/env python
"""Benchmark: frames/s through the full render pipeline on the local chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference publishes no numbers (BASELINE.md); the north-star
target is 60 FPS at 1080p on a 1M-triangle scene on one v5e. vs_baseline is
therefore FPS/60 for the current benchmark config.

Timing methodology: frames are CHAINED on device (frame i's camera depends
on frame i-1's output token) and forced once at the end — on lazily
evaluating backends, per-frame host readbacks measure tunnel latency and
un-consumed frames may never execute.

Config via BENCH_CONFIG env: "spheres1080_1m" (default — the flagship
1M-triangle/1080p config the 60-FPS north star is defined on), "cube512"
(BASELINE.json config 1), "spheres1080" (~110k tris, config 2 shape),
"ultra4k" (1M tris @ 3840×2160 with bloom — config 5).
scripts/bench_sweep.py runs all four in one TPU process.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def build_scene(config: str):
    from trident_tpu.core.config import EngineConfig, RenderConfig
    from trident_tpu.ecs.components import (
        MeshComponent, TextureComponent, TransformComponent,
    )
    from trident_tpu.ecs.registry import Registry
    from trident_tpu.geometry.primitives import PrimitiveType
    from trident_tpu.io.image import checkerboard
    from trident_tpu.render.renderer import Renderer

    known = {"cube512": 0, "spheres1080": 12, "spheres1080_1m": 36,
             "ultra4k": 36, "shadows1080": 12}
    if config not in known:
        # a typo'd BENCH_CONFIG must fail loudly, not silently bench the
        # cube512 scene under a plausible-looking metric name
        raise SystemExit(f"unknown BENCH_CONFIG {config!r}; "
                         f"expected one of {sorted(known)} (plus ':ai')")
    grid = known[config]
    if config == "ultra4k":
        w, h = 3840, 2160
    else:
        w, h = (1920, 1080) if grid else (512, 512)

    cfg = EngineConfig(render=RenderConfig(
        width=w, height=h, bloom=(config == "ultra4k"),
        # shadows=True triggers the renderer's zskip-for-overdraw policy
        # (+9% on this scene, r4hw2 §6) exactly as a real app would get it
        shadows=(config == "shadows1080")))
    r = Renderer(cfg)
    reg = Registry()
    r.set_active_registry(reg)
    slot = r.acquire_texture("checker", checkerboard(128, 8))

    if grid:
        mesh_idx = r.ensure_primitive(PrimitiveType.SPHERE)
        for i in range(grid):
            for j in range(grid):
                e = reg.create()
                t = reg.add(e, TransformComponent())
                t.position = np.array(
                    [(i - grid / 2) * 1.4, (j - grid / 2) * 1.4, 0], np.float32)
                reg.add(e, MeshComponent(mesh_index=mesh_idx))
                reg.add(e, TextureComponent(path="checker", slot=slot))
        r.editor_camera.set_position([0, 0, grid * 1.1 + 2])
        if config == "shadows1080":
            # BASELINE config 3: multi-object + mipmaps + shadow pass. A
            # backdrop behind the sphere grid receives the cast shadows;
            # an angled sun with cast_shadows triggers the two-pass render
            # graph (depth-only light pass + PCF-free lookup in shading).
            from trident_tpu.ecs.components import LightComponent
            backdrop = reg.create()
            bt = reg.add(backdrop, TransformComponent())
            bt.position = np.array([0.0, 0.0, -2.0], np.float32)
            bt.scale = np.array([grid * 1.4, grid * 1.4, 0.2], np.float32)
            cube_idx = r.ensure_primitive(PrimitiveType.CUBE)
            reg.add(backdrop, MeshComponent(mesh_index=cube_idx))
            reg.add(backdrop, TextureComponent(path="checker", slot=slot))
            sun = reg.create()
            reg.add(sun, TransformComponent())
            reg.add(sun, LightComponent(
                direction=np.array([0.35, -0.3, -1.0], np.float32),
                intensity=2.5, cast_shadows=True))
    else:
        mesh_idx = r.ensure_primitive(PrimitiveType.CUBE)
        e = reg.create()
        reg.add(e, TransformComponent())
        reg.add(e, MeshComponent(mesh_index=mesh_idx))
        reg.add(e, TextureComponent(path="checker", slot=slot))
        r.editor_camera.set_position([0, 0, 3])
    r.editor_camera.look_at_target([0, 0, 0])
    return r, reg, (w, h)


def bench_interp() -> None:
    """BASELINE.json config 4: the frame-interpolation U-Net on
    Dataset/frame_*.png pairs. Reports inference ms/frame at the
    reference's 256×256 net resolution; vs_baseline is the reference's
    66 ms inference/readback throttle (Renderer.h:522) divided by the
    measured latency — how many reference cadences fit in one inference."""
    import jax
    import jax.numpy as jnp

    from trident_tpu.ai.train import load_checkpoint
    from trident_tpu.io.image import load_rgba8

    iters = int(os.environ.get("BENCH_ITERS", "30"))
    ckpt = os.environ.get("BENCH_INTERP_CKPT", "assets_out/frame_generator_128")
    model, variables = load_checkpoint(ckpt)

    res = 256
    src = os.environ.get("BENCH_INTERP_SRC", "/root/reference/Dataset")
    frames = []
    if os.path.isdir(src):
        names = sorted(f for f in os.listdir(src) if f.endswith(".png"))[:3]
        for n in names:
            img = load_rgba8(os.path.join(src, n))[..., :3]
            img = jax.image.resize(jnp.asarray(img, jnp.float32) / 255.0,
                                   (res, res, 3), "bilinear")
            frames.append(img)
    if len(frames) < 3:   # dataset not mounted: synthesize a moving pattern
        base = jnp.linspace(0, 1, res)[:, None, None] * jnp.ones((1, res, 3))
        frames = [jnp.roll(base, 8 * k, axis=1) for k in range(3)]

    pair = jnp.concatenate([frames[0], frames[2]], axis=-1)[None]

    @jax.jit
    def infer(x):
        return model.apply(variables, x, train=False)

    out = infer(pair)
    np.asarray(out.ravel()[:1])                 # force compile + first run
    t0 = time.perf_counter()
    for _ in range(iters):                       # chain: defeat lazy backends
        out = infer(jnp.concatenate([out, out], axis=-1))
    np.asarray(out.ravel()[:1])
    ms = (time.perf_counter() - t0) / iters * 1000.0

    from trident_tpu.ai.metrics import psnr as _psnr

    quality = float(_psnr(infer(pair), frames[1][None]))   # NHWC batched
    print(json.dumps({
        "metric": f"interp_infer_{res}", "value": round(ms, 3),
        "unit": "ms/frame", "vs_baseline": round(66.0 / max(ms, 1e-6), 3),
        "extra": {"psnr_db_vs_middle_frame": round(quality, 2),
                  "iters": iters, "checkpoint": ckpt,
                  "backend": jax.default_backend()}}))


def _arm_watchdog():
    """The tunneled TPU backend can go down in a way that hangs every
    device op forever (observed round 3: even jnp.ones never returns).
    Emit an honest error line and exit instead of hanging the driver.
    BENCH_WATCHDOG seconds, 0 disables; generous default — first compile
    through a cold tunnel legitimately takes minutes. Returns the timer;
    main() cancels it on completion (bench_sweep calls main repeatedly)."""
    import threading

    limit = float(os.environ.get("BENCH_WATCHDOG", "2100"))
    if limit <= 0:
        return None

    def fire():
        print(json.dumps({
            "metric": "bench_error", "value": 0, "unit": "none",
            "vs_baseline": 0,
            "extra": {"error": f"no result within {limit:.0f}s — backend "
                               "unreachable (tunnel down?) or compile hung",
                      # last numbers measured on hardware BEFORE the axon
                      # tunnel outage of 2026-08-17 (PERF.md round-3
                      # record, v5e, scan-mode device FPS, aux=[0,0]):
                      "last_measured_pre_outage": {
                          "spheres1080_1m": 19.69, "ultra4k": 8.98,
                          "spheres1080": 45.35, "cube512": 387.1,
                          "date": "2026-08-17"}}}),
              flush=True)
        os._exit(3)

    t = threading.Timer(limit, fire)
    t.daemon = True
    t.start()
    return t


def main() -> None:
    watchdog = _arm_watchdog()
    try:
        _main_inner()
    finally:
        if watchdog is not None:
            watchdog.cancel()


def _main_inner() -> None:
    import jax
    import jax.numpy as jnp
    from trident_tpu.ecs.components import TransformComponent
    from trident_tpu.render.frame import (
        build_draw_params, gather_mesh_draws, geometry_to_device,
    )
    from trident_tpu.render.lights import gather_lights
    from trident_tpu.render.renderer import render_frame
    from trident_tpu.render.types import AiBlend, CameraParams, SkyboxCube

    config = os.environ.get("BENCH_CONFIG", "spheres1080_1m")
    if config == "interp":
        return bench_interp()
    iters = int(os.environ.get("BENCH_ITERS", "30"))
    # BENCH_AI=1: neural 2x reconstruction mode — render at half res and
    # let the upscaler net (ai/upscaler.py) rebuild the full frame. Needs
    # the trained checkpoint; reports PSNR vs the native render in extra.
    use_ai = os.environ.get("BENCH_AI", "") not in ("", "0")
    upscale_params = None
    if use_ai:
        from trident_tpu.ai.upscaler import load_upscaler

        upscale_params, _bc = load_upscaler(
            os.environ.get("BENCH_AI_CKPT", "assets_out/upscaler_2x"))
        upscale_params = jax.device_put(upscale_params)

    renderer, registry, (w, h) = build_scene(config)
    entities = [e for e, _ in registry.view(TransformComponent)]

    # pre-build per-frame draw params for distinct rotations (host-side work
    # stays out of the timed loop, like a real engine's prepared frames)
    packed = renderer.geometry.packed()
    geo = geometry_to_device(packed)
    plans = []
    for k in range(iters):
        angle = 25.0 + k * 3.0
        for e in entities:
            registry.get(e, TransformComponent).rotation = np.array(
                [angle * 0.4, angle, 0.0], np.float32)
        records = gather_mesh_draws(registry, renderer.geometry)
        plan, tri_draw = renderer._plan_cache.plan(packed, records,
                                                   renderer.geometry.version)
        params, palette, shade = build_draw_params(
            records, plan.num_draws,
            material_table=renderer.geometry.material_table())
        plans.append((plan, tri_draw, params, palette, shade))
    n_tris = sum(packed.draw_infos[r_.mesh_index].index_count // 3
                 for r_ in gather_mesh_draws(registry, renderer.geometry))
    lights = gather_lights(registry)
    # shadow pass: mirror Renderer.render_viewport's light-camera setup
    # (renderer.py) for any shadow-casting directional light in the scene
    shadow_size = 0
    light_cam = None
    from trident_tpu.ecs.components import LightComponent, LightType
    for _e, (lc,) in registry.view(LightComponent):
        if (lc.enabled and lc.light_type == LightType.DIRECTIONAL
                and lc.cast_shadows):
            from trident_tpu.ops.shadow import light_camera, scene_bounds
            center, radius = scene_bounds(
                gather_mesh_draws(registry, renderer.geometry), packed)
            light_cam = light_camera(lc.direction, center, radius)
            shadow_size = renderer.config.render.shadow_map_size
            break
    tex = renderer.textures.device_arrays()
    cam = renderer.editor_camera.params()
    sky = SkyboxCube(faces=jnp.zeros((6, 1, 1, 3), jnp.float32),
                     valid=jnp.asarray(False))
    ai = AiBlend(image=jnp.zeros((1, 1, 3), jnp.float32),
                 blend=jnp.asarray(0.0, jnp.float32))
    raster = renderer._raster_mode()
    corner_t = renderer._plan_cache.corner_table(packed)
    rw, rh = (w // 2, h // 2) if use_ai else (w, h)

    # temporal upscaler: chain each frame's output + view-projection into
    # the next call as reconstruction history (renderer.prev_state analogue)
    temporal_ai = False
    hist0 = None
    if upscale_params is not None:
        from trident_tpu.ai import upscaler as up

        temporal_ai = up.upscaler_wants_temporal(upscale_params)
        # V2 history = the (rh, rw, 12) uint8 output BLOCKS from
        # FrameOutput.history (the warp then runs the tile-local MXU
        # fetch, 7.0 vs 66.5 ms at 4K — r5hw5); chaining out.color here
        # instead silently falls back to the V1 full-res warp, which is
        # exactly the regression the r5hw5 :ai run exposed.
        hist0 = (jnp.zeros((rh, rw, 12), jnp.uint8) if up.V2
                 else jnp.zeros((h, w, 4), jnp.uint8))
    vp_mat = jnp.asarray(np.asarray(cam.proj) @ np.asarray(cam.view))

    def _hist_of(o):
        return o.history if o.history is not None else o.color

    stride_kw = renderer._stride_kwargs(skinned=False)

    def frame(token, plan, tri_draw, params, palette, shade, prev=None):
        return render_frame(
            geo, plan, tri_draw, params, palette, shade,
            CameraParams(cam.view, cam.proj, cam.position + token * 0),
            lights, tex, sky, ai, light_camera=light_cam, corner_t=corner_t,
            upscale_params=upscale_params, prev=prev, width=rw, height=rh,
            clear_color=tuple(renderer.config.render.clear_color),
            raster=raster, chunk=64, skinned=False, shadow_size=shadow_size,
            bloom=renderer.config.render.bloom, **stride_kw)

    def check_aux(aux, where: str) -> np.ndarray:
        """Fail the bench on raster capacity overflow: a silently
        truncating bench would report inflated FPS on missing geometry."""
        if aux is None:
            return np.zeros(2, np.int64)
        a = np.asarray(aux).reshape(-1, 2).sum(axis=0)
        if a[0] or a[1]:
            raise SystemExit(
                f"bench invalid ({where}): raster overflow — {int(a[0])} "
                f"pairs truncated, {int(a[1])} big chunks dropped; the "
                "rendered geometry is incomplete")
        return a

    # warmup/compile
    token = jnp.zeros((), jnp.float32)
    out = frame(token, *plans[0])
    np.asarray(out.color.ravel()[:1])
    aux_counts = check_aux(out.aux, "warmup frame")

    # interactive mode: one dispatch per frame through the BUNDLED path
    # (render/bundle.py — per-frame host state ships as 2 blob uploads,
    # exactly what Renderer.render_viewport pays in a live application)
    from trident_tpu.render.bundle import pack_frame
    from trident_tpu.render.renderer import render_frame_bundled

    plan0, tri_draw0, _, _, _ = plans[0]
    bundles = []
    for _plan, _td, p_, pal_, sh_ in plans:
        f32b, i32b, shape = pack_frame(p_, np.asarray(pal_), np.asarray(sh_),
                                       cam, lights, light_cam, 0.0)
        bundles.append((f32b, i32b))
    statics = dict(shape=shape, width=rw, height=rh,
                   clear_color=tuple(renderer.config.render.clear_color),
                   raster=raster, chunk=64, skinned=False,
                   shadow_size=shadow_size,
                   bloom=renderer.config.render.bloom, **stride_kw)
    ai_img = jnp.zeros((1, 1, 3), jnp.float32)

    @jax.jit
    def frame_b(token, f32b, i32b, prev=None):
        return render_frame_bundled(geo, plan0, tri_draw0, f32b + token * 0,
                                    i32b, tex, sky, ai_img, corner_t,
                                    upscale_params, prev, **statics)

    prev0 = (hist0, vp_mat) if temporal_ai else None
    out = frame_b(jnp.zeros((), jnp.float32), *bundles[0], prev0)
    np.asarray(out.color.ravel()[:1])

    # interactive mode is measured with an AGREEMENT GATE (VERDICT r4
    # item 8): the tunnel's dispatch latency fluctuates wildly run to run
    # (r4hw1 measured 2.1–24.9 FPS for the SAME config across sections;
    # BENCH_r04 published a 2x spread), so a single sample routinely
    # mislabels tunnel state as engine latency — but max-of-two could
    # also hide a REAL latency regression on a noisy day. Re-run (up to
    # 5x) until the two best runs agree within 20%, then report the
    # median of those two; all runs are published.
    def interactive_run():
        t0 = time.perf_counter()
        token = jnp.zeros((), jnp.float32)
        prev = prev0
        for k in range(iters):
            out = frame_b(token, *bundles[k], prev)
            token = out.depth[0, 0] * 0.0
            if temporal_ai:
                prev = (_hist_of(out), vp_mat)
        np.asarray(token)                  # force the whole chain
        return iters / (time.perf_counter() - t0)

    chain_runs = [interactive_run() for _ in range(2)]
    while len(chain_runs) < 5:
        best2 = sorted(chain_runs)[-2:]
        if best2[0] >= 0.8 * best2[1]:     # two best agree within 20%
            break
        chain_runs.append(interactive_run())
    best2 = sorted(chain_runs)[-2:]
    chain_fps = best2[0]                   # lower of the two agreeing best

    # device-throughput mode: all frames inside ONE jit via lax.scan over
    # stacked per-frame params — no per-frame dispatch
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *[p[2] for p in plans])
    plan0, tri_draw0, _, palette0, shade0 = plans[0]

    def scan_bench(params_seq):
        def body(carry, params_k):
            token, prev = carry
            o = render_frame(
                geo, plan0, tri_draw0, params_k, palette0, shade0,
                CameraParams(cam.view, cam.proj, cam.position + token * 0),
                lights, tex, sky, ai, light_camera=light_cam,
                corner_t=corner_t,
                upscale_params=upscale_params, prev=prev, width=rw, height=rh,
                clear_color=tuple(renderer.config.render.clear_color),
                raster=raster, chunk=64, skinned=False,
                shadow_size=shadow_size,
                bloom=renderer.config.render.bloom, **stride_kw)
            aux = (jnp.zeros((2,), jnp.int32) if o.aux is None
                   else jnp.asarray(o.aux).reshape(-1, 2).sum(axis=0))
            new_prev = (_hist_of(o), vp_mat) if temporal_ai else None
            return (o.depth[0, 0] * 0.0, new_prev), (o.color[0, 0, 0], aux)
        init = (jnp.zeros((), jnp.float32),
                (hist0, vp_mat) if temporal_ai else None)
        (token, _), (samples, aux) = jax.lax.scan(body, init, params_seq)
        return samples, aux.sum(axis=0)

    scan_jit = jax.jit(scan_bench)
    _, aux_all = scan_jit(stacked)         # compile + run once
    np.asarray(aux_all)
    check_aux(aux_all, f"scan over all {iters} frames")
    t0 = time.perf_counter()
    samples, aux_all = scan_jit(stacked)
    np.asarray(samples)
    scan_fps = iters / (time.perf_counter() - t0)

    extra_quality = {}
    if use_ai:
        # PSNR on frame 1 of the rotation sequence; a temporal net first
        # reconstructs frame 0 (prev=None → the net's zero-validity
        # spatial fallback, exactly the runtime's ViewportContext start
        # state — NOT the zeros-but-valid prev0 the timed loops use for
        # jit-structure stability) and consumes it as history
        native = render_frame(
            geo, *plans[1][:2], *plans[1][2:], cam, lights, tex, sky, ai,
            light_camera=light_cam, corner_t=corner_t, width=w, height=h,
            clear_color=tuple(renderer.config.render.clear_color),
            raster=raster, chunk=64, skinned=False, shadow_size=shadow_size,
            bloom=renderer.config.render.bloom, **stride_kw)
        check_aux(native.aux, f"native {w}x{h} PSNR oracle frame")
        prev_eval = None
        if temporal_ai:
            r0 = frame(jnp.zeros((), jnp.float32), *plans[0], None)
            prev_eval = (_hist_of(r0), vp_mat)
        recon = frame(jnp.zeros((), jnp.float32), *plans[1], prev_eval)
        a = np.asarray(native.color[..., :3]).astype(np.float32) / 255.0
        b = np.asarray(recon.color[..., :3]).astype(np.float32) / 255.0
        mse = float(np.mean(np.square(a - b)))
        extra_quality["psnr_vs_native_db"] = round(
            -10.0 * np.log10(max(mse, 1e-10)), 2)

    fps = scan_fps
    mpix = fps * w * h / 1e6
    print(json.dumps({
        "metric": f"render_fps_{config}{'_ai' if use_ai else ''}_{w}x{h}",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
        "extra": {"mpix_per_s": round(mpix, 1),
                  "triangles": int(n_tris),
                  "interactive_fps": round(chain_fps, 2),
                  "interactive_runs": [round(c, 2) for c in chain_runs],
                  "interactive_agreed": bool(best2[0] >= 0.8 * best2[1]),
                  "raster": raster,
                  "aux": [int(aux_counts[0]), int(aux_counts[1])],
                  "backend": jax.default_backend(), **extra_quality},
    }))


if __name__ == "__main__":
    main()
