#!/usr/bin/env python
"""AI-upscale-mode cost decomposition on hardware (round 5, VERDICT item 4).

ultra4k:ai measured 5.34 FPS vs 9.26 native (r4hw6 §4) — the mode is
throughput-NEGATIVE and the suspect list has never been measured
individually. The full :ai frame is: half-res render (known: ~45 ms at
1M/1080p) + warp_previous + UpscalerNet (3 convs + depth-to-space +
jax.image.resize bilinear base at OUTPUT res) + alpha/depth/tri
jnp.repeat upsamplings + pack_rgba8 at 4K. This times each piece
chained (device-side dependency, one readback at the end — the axon
tunnel's lazy dispatch lies under naive timing).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools_dev/aibench.py
Env: AB_W/AB_H half-res dims (default 1920x1080 = the ultra4k:ai shape),
     AB_ITERS=30, AB_CONFIGS comma list of
     warp,net,resize,convs,repeat,pack  (default all).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from trident_tpu.ai import upscaler as up

    w = int(os.environ.get("AB_W", "1920"))
    h = int(os.environ.get("AB_H", "1080"))
    iters = int(os.environ.get("AB_ITERS", "30"))
    W2, H2 = w * 2, h * 2
    print(f"backend={jax.default_backend()} half={w}x{h} out={W2}x{H2} "
          f"iters={iters}", flush=True)

    # the real shipped checkpoint when present (17-ch temporal+depth net),
    # else an init-weight net of the same shape — timing is weight-blind
    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets_out", "upscaler_2x")
    try:
        params, bc = up.load_upscaler(ckpt)
        print(f"params: {ckpt} base_channels={bc} "
              f"in={up.upscaler_in_channels(params)}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"params: init fallback ({e})", flush=True)
        _, variables = up.init_upscaler(jax.random.PRNGKey(0), 32,
                                        in_channels=17)
        params = variables["params"]

    key = jax.random.PRNGKey(1)
    prev_rgb = jax.random.uniform(key, (H2, W2, 3), jnp.float32)
    cur_depth = jax.random.uniform(key, (h, w), jnp.float32) * 0.5 + 0.25
    image = jax.random.uniform(key, (h, w, 3), jnp.float32)
    temporal = jax.random.uniform(key, (h, w, up.WARP_CHANNELS), jnp.float32)
    eye = jnp.eye(4, dtype=jnp.float32)
    frame4 = jax.random.uniform(key, (h, w, 4), jnp.float32)

    def timed(label, f, *args):
        out = f(*args, jnp.zeros((), jnp.float32))
        np.asarray(out)                         # compile + settle
        t0 = time.perf_counter()
        tok = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            tok = f(*args, tok)
        np.asarray(tok)
        print(f"{label}: {(time.perf_counter() - t0) / iters * 1000.0:.2f} "
              f"ms/call", flush=True)

    cfgs = os.environ.get(
        "AB_CONFIGS",
        "warp,net,resize,convs,repeat,pack,d2s,warpv2,netv2,v2").split(",")

    if "warp" in cfgs:
        timed("warp", jax.jit(lambda pr, d, tok: up.warp_previous(
            pr + tok, d, eye, eye, W2, H2).ravel()[0] * 0.0),
            prev_rgb, cur_depth)
    if "net" in cfgs:
        timed("net(full)", jax.jit(lambda im, tmp, d, tok: up.apply_upscaler(
            params, im + tok, tmp, d).ravel()[0] * 0.0),
            image, temporal, cur_depth)
    if "resize" in cfgs:
        timed("resize(base)", jax.jit(lambda im, tok: jax.image.resize(
            im + tok, (H2, W2, 3), "bilinear").ravel()[0] * 0.0), image)
    if "convs" in cfgs:
        # the conv stack alone: the four convs on the 17-ch input, stopping
        # before depth-to-space/resize (raw (h, w, 12) head output)
        import flax.linen as nn

        bc = params["Conv_0"]["kernel"].shape[-1]

        def convs_only(im, tmp, d, tok):
            parts = [im + tok]
            if up.upscaler_wants_depth(params):
                parts.append(d[..., None].astype(jnp.float32))
            if up.upscaler_wants_temporal(params):
                parts.append(tmp)
            x = jnp.concatenate(parts, axis=-1)[None].astype(jnp.float32)
            names = ["Conv_0", "Conv_1", "Conv_2", "Conv_3"]
            feats = [bc, bc, bc, 12]
            hh = x
            for i, (nm, ft) in enumerate(zip(names, feats)):
                conv = nn.Conv(ft, (3, 3), padding=1)
                y = conv.apply({"params": params[nm]}, hh)
                hh = (nn.relu(y) + hh if i == 1 else
                      nn.relu(y) if i < 3 else y)
            return hh.ravel()[0] * 0.0

        timed("convs(only)", jax.jit(convs_only), image, temporal, cur_depth)
    if "repeat" in cfgs:
        timed("repeat(alpha+depth+tri)", jax.jit(lambda fr, d, tok: (
            jnp.repeat(jnp.repeat(fr[..., 3:4] + tok, 2, axis=0), 2, axis=1)
            .ravel()[0]
            + jnp.repeat(jnp.repeat(d, 2, axis=0), 2, axis=1).ravel()[0]
        ) * 0.0), frame4, cur_depth)
    if "pack" in cfgs:
        from trident_tpu.ops.deferred import pack_rgba8

        big = jax.random.uniform(key, (H2, W2, 4), jnp.float32)
        timed("pack_rgba8(4k)", jax.jit(lambda fr, tok: pack_rgba8(
            fr + tok).ravel()[0].astype(jnp.float32) * 0.0), big)

    # ---- V2 path pieces (round 5: block-layout history, no 4K relayouts)
    blocks = jax.random.uniform(key, (h, w, 12), jnp.float32)
    if "d2s" in cfgs:
        for mode in ("xla", "convt", "pad"):
            timed(f"d2s({mode})", jax.jit(lambda bl, tok, m=mode: up.
                  depth_to_space(bl + tok, mode=m).ravel()[0] * 0.0), blocks)
    if "warpv2" in cfgs:
        blk_u8 = (blocks * 255).astype(jnp.uint8)
        timed("warp_v2(blocks)", jax.jit(lambda bl, d, tok: up.
              warp_from_blocks(bl, d + tok, eye, eye, W2, H2)
              .ravel()[0] * 0.0), blk_u8, cur_depth)
    if "netv2" in cfgs:
        from trident_tpu.ops import kernel_knobs

        for dt in ("f32", "bf16"):
            with kernel_knobs.overrides(upscale_dtype=dt):
                timed(f"netv2_blocks({dt})",
                      jax.jit(lambda im, tmp, d, tok: up.apply_upscaler_v2(
                          params, im + tok, tmp, d)[1].ravel()[0] * 0.0),
                      image, temporal, cur_depth)
    if "v2" in cfgs:
        # the FULL v2 per-frame chain: warp from uint8 blocks + net +
        # display d2s + history quantize (compare: warp + net(full))
        from trident_tpu.ops import kernel_knobs

        blk_u8 = (blocks * 255).astype(jnp.uint8)

        def v2_chain(bl, im, d, tok):
            t = up.warp_from_blocks(bl, d + tok, eye, eye, W2, H2)
            rgb, out_blocks = up.apply_upscaler_v2(params, im, t, d)
            hist = up.blocks_to_u8(out_blocks)
            return (rgb.ravel()[0] + hist.ravel()[0].astype(jnp.float32)
                    ) * 0.0

        for dt in ("bf16", "f32"):
            with kernel_knobs.overrides(upscale_dtype=dt):
                timed(f"v2_chain({dt})", jax.jit(v2_chain),
                      blk_u8, image, cur_depth)


if __name__ == "__main__":
    main()
