"""Realtime-pipeline benchmark: 1080p 1spp + DenoiseCompositor (BASELINE config 4).

Run on the TPU from the repo root: python benchmarks/realtime_1080p.py
Protocol notes (tunnel fencing/warm-up) as in bench.py.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from dxrexperiments_tpu.app.headless import build_scene
from dxrexperiments_tpu.models.realtime import RealtimeRaytracingPipeline
from dxrexperiments_tpu.models.denoise import DenoiseCompositor, denoise_composite, default_denoise_params
W,H = 1920,1080
scene, cam = build_scene("cornell-glossy")
cam.set_aspect(W,H)
pipe = RealtimeRaytracingPipeline(W,H,seed=0)
pipe.set_camera(cam); pipe.set_scene(scene)
den_params = jax.device_put(default_denoise_params())
for _ in range(3): float(jnp.sum(jnp.ones((2048,2048)) @ jnp.ones((2048,2048))))
print("warm", flush=True)
# one full frame incl denoise
pipe.update(0.0, 0)
d, s = pipe.render()
out = denoise_composite(d, s, den_params)
float(jnp.sum(out))
print("compiled", flush=True)
best=1e9
for rep in range(3):
    t0=time.time()
    N=8
    for f in range(N):
        pipe.update(0.0, f)
        d, s = pipe.render()
        out = denoise_composite(d, s, den_params)
    float(jnp.sum(out))
    best=min(best,(time.time()-t0)/N*1000)
print(f"realtime+denoise 1080p: {best:.1f} ms/frame = {1000/best:.1f} fps", flush=True)
# split: raytrace only
best=1e9
for rep in range(3):
    t0=time.time()
    for f in range(8):
        pipe.update(0.0, f)
        d, s = pipe.render()
    float(jnp.sum(d))
    best=min(best,(time.time()-t0)/8*1000)
print(f"raytrace only: {best:.1f} ms", flush=True)
# denoise only
best=1e9
for rep in range(3):
    t0=time.time()
    for f in range(8):
        out = denoise_composite(d, s, den_params)
    float(jnp.sum(out))
    best=min(best,(time.time()-t0)/8*1000)
print(f"denoise only: {best:.1f} ms", flush=True)

# ---- frames-in-flight batch: K frames (raytrace + denoise) per dispatch ----
# The TPU-native analogue of the reference's 3-deep frame ring
# (DeviceResources.cpp:580-598): amortizes the ~5 ms per-dispatch tunnel
# cost (benchmarks/rt_anatomy.py) at K frames of input latency.
from dxrexperiments_tpu.models.realtime import make_realtime_denoise_frames_step
from dxrexperiments_tpu.trace.integrator import default_options
scene_built = pipe.scene_data
opts = pipe.options
lights, env = scene_built["lights"], scene_built["env"]
for K in (1, 2, 3, 4):
    step = make_realtime_denoise_frames_step(scene_built, W, H, K)
    cams = pipe.frame_cameras(0, K)
    aovs, img = step(opts, cams, lights, env, den_params)
    float(jnp.sum(img))  # compile + settle
    best = 1e9
    for rep in range(3):
        t0 = time.time()
        nd = max(1, 8 // K)
        for dnum in range(nd):
            cams = pipe.frame_cameras(dnum * K, K)
            aovs, img = step(opts, cams, lights, env, den_params)
        float(jnp.sum(img))
        best = min(best, (time.time() - t0) / (nd * K) * 1000)
    print(
        f"frames-in-flight K={K}: {best:.1f} ms/frame = {1000/best:.1f} fps",
        flush=True,
    )
print("DONE", flush=True)
