"""Pose/camera fit for the reference-render parity anchor (VERDICT r2
weak #6: "the residual is unattributed").

The two susanne instance transforms and the fly-camera pose behind
assets/textures/DirectLighting.PNG are not recorded anywhere in the
reference repo (the placing code is absent; the capture was taken with the
interactive fly camera). parity_reference.py matches them by eye; this
script pins the residual by COORDINATE-DESCENT fitting those unknowns
against the capture on the structural luma-correlation metric, then
re-reports the parity metrics at the fitted optimum and adds the
IndirectSpecular.PNG comparison (the second shipped capture).

Interpretation: if the fitted optimum pushes correlation >= 0.9, the
original residual was pose error, not shading error. Every fitted value is
printed so parity_reference.py's POSE_A/POSE_B/EYE can be updated.

Run on TPU (each eval is one realtime sample at 320x182, ~0.1 s):
    python benchmarks/parity_fit.py [rounds]
CPU works too (deterministic) at ~17 s/eval — use rounds=1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

W, H = 320, 182
FINAL_W, FINAL_H = 960, 545


def main() -> None:
    import jax
    import numpy as np

    import parity_reference as pr
    from dxrexperiments_tpu.core.camera import Camera, camera_params
    from dxrexperiments_tpu.trace.integrator import default_options, render_sample
    from dxrexperiments_tpu.utils.image import write_png

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    if jax.default_backend() != "cpu":
        import jax.numpy as jnp

        for _ in range(3):  # tunnel warm-up
            float(jnp.sum(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048))))

    ref, mask = pr.load_reference_crop((W, H))
    opts = default_options()

    # parameter vector: [eye_x, eye_y, eye_z, at_y,
    #                    A: tx ty tz yaw pitch roll s,
    #                    B: tx ty tz yaw pitch roll s]
    p0 = np.array(
        [pr.EYE[0], pr.EYE[1], pr.EYE[2], pr.AT[1]]
        + [*pr.POSE_A["t"], pr.POSE_A["yaw"], pr.POSE_A["pitch"],
           pr.POSE_A["roll"], pr.POSE_A["s"]]
        + [*pr.POSE_B["t"], pr.POSE_B["yaw"], pr.POSE_B["pitch"],
           pr.POSE_B["roll"], pr.POSE_B["s"]],
        np.float64,
    )
    steps = np.array(
        [1.0, 0.6, 2.0, 0.4] + [0.8, 0.5, 0.8, 0.15, 0.15, 0.15, 0.5] * 2,
        np.float64,
    )

    def poses(p):
        a = dict(t=tuple(p[4:7]), yaw=p[7], pitch=p[8], roll=p[9], s=p[10])
        b = dict(t=tuple(p[11:14]), yaw=p[14], pitch=p[15], roll=p[16], s=p[17])
        return a, b

    scene_cache = {}

    def build(p):
        a, b = poses(p)
        key = tuple(np.round(p[4:], 5))
        if key not in scene_cache:
            pr.POSE_A, pr.POSE_B = a, b
            scene_cache.clear()  # keep one scene at a time (device memory)
            scene_cache[key] = pr.build_parity_scene().build(accel="none")
        return scene_cache[key]

    def render(p, w=W, h=H):
        sd = build(p)
        cam = Camera()
        cam.set_eye_at_up((p[0], p[1], p[2]), (0.0, p[3], 0.0), (0, 1, 0))
        cam.set_aspect(w, h)
        cp = camera_params(cam, frame_count=0, accum_count=0)
        return sd, render_sample(
            sd, opts, cp, w, h, mode="realtime", impl="auto",
            env_kind=int(sd["env"]["kind"]),
        )

    def objective(p):
        _, out = render(p)
        ours = pr.srgb(np.asarray(out["direct"]))
        corr, hue, mae = pr.metrics(ours, ref, mask)
        return corr - 0.3 * mae  # structure first, level second

    t0 = time.time()
    p = p0.copy()
    if rounds == 0:
        # report-only mode: skip the descent, just re-render at the fitted
        # defaults (already baked into parity_reference.py) and report
        print("rounds=0: report-only at the fitted defaults", flush=True)
        best = -1.0
    else:
        best = objective(p0)
        print(f"start objective {best:.4f}  ({time.time()-t0:.1f}s/eval)",
              flush=True)
    for rnd in range(rounds):
        improved = False
        for i in range(len(p)):
            for sgn in (+1.0, -1.0):
                cand = p.copy()
                cand[i] += sgn * steps[i]
                val = objective(cand)
                if val > best + 1e-5:
                    best, p, improved = val, cand, True
                    print(
                        f"r{rnd} p[{i}] {'+' if sgn > 0 else '-'}{steps[i]:.2f}"
                        f" -> {best:.4f}", flush=True,
                    )
                    break
        steps *= 0.5
        if not improved:
            break

    # ---- final report at full comparison resolution ----------------------
    ref_hi, mask_hi = pr.load_reference_crop((FINAL_W, FINAL_H))
    sd, out = render(p, FINAL_W, FINAL_H)
    ours = pr.srgb(np.asarray(out["direct"]))
    corr, hue, mae = pr.metrics(ours, ref_hi, mask_hi)
    per_ch = pr.metrics_per_channel(ours, ref_hi, mask_hi)

    # second shipped capture: IndirectSpecular.PNG vs our specular AOV
    from PIL import Image

    im = Image.open(f"{pr.REF}/assets/textures/IndirectSpecular.PNG").convert("RGB")
    arr = np.asarray(im, np.float32)[35:, :, :] / 255.0
    spec_ref = np.asarray(
        Image.fromarray((arr * 255).astype(np.uint8)).resize(
            (FINAL_W, FINAL_H), Image.BILINEAR
        ),
        np.float32,
    ) / 255.0
    spec_ours = pr.srgb(np.asarray(out["indirect_specular"]))
    s_corr, s_hue, s_mae = pr.metrics(spec_ours, spec_ref, mask_hi)

    a, b = poses(p)
    result = {
        "fitted": {
            "eye": [round(float(v), 3) for v in p[0:3]],
            "at_y": round(float(p[3]), 3),
            "pose_a": {k: (tuple(round(float(x), 3) for x in v)
                           if isinstance(v, tuple) else round(float(v), 3))
                       for k, v in a.items()},
            "pose_b": {k: (tuple(round(float(x), 3) for x in v)
                           if isinstance(v, tuple) else round(float(v), 3))
                       for k, v in b.items()},
        },
        "direct": {"luma_corr": round(corr, 3), "hue_mae": round(hue, 4),
                   "luma_mae": round(mae, 4),
                   "rgb_corr": [round(v, 3) for v in per_ch["corr"]],
                   "rgb_mae": [round(v, 4) for v in per_ch["mae"]]},
        "indirect_specular": {"luma_corr": round(s_corr, 3),
                              "hue_mae": round(s_hue, 4),
                              "luma_mae": round(s_mae, 4)},
        "evals_wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(result))

    gallery = os.path.join(os.path.dirname(__file__), "..", "docs", "gallery")
    os.makedirs(gallery, exist_ok=True)
    side = np.concatenate(
        [ref_hi, np.ones((FINAL_H, 8, 3), np.float32), ours], axis=1
    )
    write_png(os.path.join(gallery, "parity_direct_fit_sidebyside.png"), side)
    side2 = np.concatenate(
        [spec_ref, np.ones((FINAL_H, 8, 3), np.float32), spec_ours], axis=1
    )
    write_png(os.path.join(gallery, "parity_spec_fit_sidebyside.png"), side2)
    print("wrote docs/gallery/parity_{direct,spec}_fit_sidebyside.png")


if __name__ == "__main__":
    main()
