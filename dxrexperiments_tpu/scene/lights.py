"""Light definitions and per-frame animation.

Parity with ``DirectionalLightParams``/``PointLightParams``
(/root/reference/assets/shaders/RaytracingHlslCompat.h:52-62) and the
animated directional light in the pipeline update
(/root/reference/src/ProgressiveRaytracingPipeline.cpp:197-208).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

# Reference default light colors
# (/root/reference/src/ProgressiveRaytracingPipeline.cpp:13-14).
DEFAULT_POINT_COLOR = (0.2, 0.8, 0.6, 2.0)
DEFAULT_DIR_COLOR = (0.9, 0.9, 0.9, 1.0)


def directional_light(forward_dir, color=DEFAULT_DIR_COLOR) -> dict:
    return {
        "forward": jnp.asarray(np.asarray(forward_dir, np.float32)[:3]),
        "color": jnp.asarray(np.asarray(color, np.float32)[:3]),
        "intensity": jnp.asarray(np.float32(color[3])),
    }


def point_light(position, color=DEFAULT_POINT_COLOR) -> dict:
    return {
        "position": jnp.asarray(np.asarray(position, np.float32)[:3]),
        "color": jnp.asarray(np.asarray(color, np.float32)[:3]),
        "intensity": jnp.asarray(np.float32(color[3])),
    }


def animated_dir_light_forward(elapsed_time: float) -> np.ndarray:
    """The reference's animated sun: base (0.3, -0.2, -1.0) rotated about Y by
    sin(t*0.2)*pi/2 (/root/reference/src/ProgressiveRaytracingPipeline.cpp:197-199).

    Note the animation is frozen at t=142 s while "Pause Animation" is on
    (the default — ProgressiveRaytracingPipeline.cpp:179-181).
    """
    base = np.array([0.3, -0.2, -1.0], np.float64)
    angle = math.sin(elapsed_time * 0.2) * math.pi * 0.5
    c, s = math.cos(angle), math.sin(angle)
    # XMMatrixRotationY with row-vector convention: v' = v @ R
    rot = np.array([[c, 0.0, -s], [0.0, 1.0, 0.0], [s, 0.0, c]])
    return (base @ rot).astype(np.float32)


def default_lights(elapsed_time: float = 142.0) -> dict:
    """Default light rig matching the reference pipeline update
    (/root/reference/src/ProgressiveRaytracingPipeline.cpp:197-208)."""
    return {
        "dir": directional_light(animated_dir_light_forward(elapsed_time)),
        "point": point_light((0.0, 0.0, 0.0)),
    }
