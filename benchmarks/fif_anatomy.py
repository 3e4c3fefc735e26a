"""Attribute the frames-in-flight regression (round-3 continuation).

realtime_1080p.py measured the K-batched combined step SLOWER than the
per-frame async loop (K=1 17.1 / K=3 20.2 vs baseline 15.8 ms/frame).
Decompose within ONE process: raytrace-only single vs S-axis batched, and
denoise-only separate dispatches vs lax.map batch, at 1080p.

Run: python benchmarks/fif_anatomy.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from dxrexperiments_tpu.app.headless import build_scene
from dxrexperiments_tpu.models.realtime import RealtimeRaytracingPipeline
from dxrexperiments_tpu.models.denoise import (
    default_denoise_params, denoise_composite, denoise_composite_frames,
)
from dxrexperiments_tpu.ops import fused_sample_pallas as fsp

W, H = 1920, 1080
scene, cam = build_scene("cornell-glossy")
cam.set_aspect(W, H)
pipe = RealtimeRaytracingPipeline(W, H, seed=0)
pipe.set_camera(cam)
pipe.set_scene(scene)
sd = pipe.scene_data
ek = int(sd["env"]["kind"])
den = jax.device_put(default_denoise_params())
for _ in range(3):
    float(jnp.sum(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048))))
print("warm", flush=True)

opts = jax.device_put(pipe.options)


def bench(label, fn, n, per):
    fn()  # compile + settle
    fn()
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        fn()
        best = min(best, (time.time() - t0) / n * 1000)
    print(f"{label}: {best:.2f} ms/{per}", flush=True)


import functools


# Match the production make_render_step dispatch shape exactly: geometry
# baked as constants, lights/env as ARGUMENTS (not closed over), so the
# micro attributes the same program the per-frame loop runs.
geo = {k: v for k, v in sd.items() if k not in ("lights", "env")}


@functools.partial(jax.jit, static_argnames=())
def rt_single(options, cam_p, lights, env):
    return fsp.fused_realtime_outputs(
        dict(geo, lights=lights, env=env), options, cam_p, W, H, ek
    )


@jax.jit
def rt_batch3(options, cams, lights, env):
    return fsp.fused_realtime_outputs_batch(
        dict(geo, lights=lights, env=env), options, cams, W, H, ek
    )


cam1 = pipe._frame_camera_params(0, 0, pipe.rng)
cams3 = pipe.frame_cameras(0, 3)
lights, env = sd["lights"], sd["env"]

# raytrace only: 6 frames as 6 async single dispatches vs 2 batched-3
def run_single6():
    for f in range(6):
        out = rt_single(opts, cam1, lights, env)
    float(jnp.sum(out["color"]))

def run_batch3x2():
    for d in range(2):
        out = rt_batch3(opts, cams3, lights, env)
    float(jnp.sum(out["color"]))

bench("rt single x6 async", run_single6, 6, "frame")
bench("rt batch3 x2", run_batch3x2, 6, "frame")

# denoise only: 6 separate async dispatches vs 2 lax.map-3 batches
out1 = rt_single(opts, cam1, lights, env)
d1, s1 = out1["direct"], out1["indirect_specular"]
d3 = jnp.stack([d1] * 3)
s3 = jnp.stack([s1] * 3)

def den_single6():
    for f in range(6):
        o = denoise_composite(d1, s1, den)
    float(jnp.sum(o))

def den_batch3x2():
    for dnum in range(2):
        o = denoise_composite_frames(d3, s3, den)
    float(jnp.sum(o))

bench("denoise single x6 async", den_single6, 6, "frame")
bench("denoise lax.map-3 x2", den_batch3x2, 6, "frame")

# interleaved production shape: rt then denoise per frame, async
def prod6():
    for f in range(6):
        out = rt_single(opts, cam1, lights, env)
        o = denoise_composite(out["direct"], out["indirect_specular"], den)
    float(jnp.sum(o))

bench("rt+denoise interleaved x6", prod6, 6, "frame")
print("DONE", flush=True)
