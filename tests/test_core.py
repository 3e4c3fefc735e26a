"""Unit tests for core math, RNG, camera, controller, timer."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from dxrexperiments_tpu.core import rng, vecmath
from dxrexperiments_tpu.core.camera import Camera, camera_params, primary_ray_grid
from dxrexperiments_tpu.core.camera_controller import CameraController, InputState


# ---------------------------------------------------------------------- #
# RNG: bit-exact against an independent scalar uint32 model of the
# reference's initRand/nextRand (RaytracingUtils.hlsli:26-45).
# ---------------------------------------------------------------------- #
M32 = 0xFFFFFFFF


def scalar_init_rand(val0, val1, backoff=16):
    v0, v1, s0 = val0 & M32, val1 & M32, 0
    for _ in range(backoff):
        s0 = (s0 + 0x9E3779B9) & M32
        v0 = (
            v0
            + ((((v1 << 4) & M32) + 0xA341316C) ^ ((v1 + s0) & M32) ^ ((v1 >> 5) + 0xC8013EA4))
        ) & M32
        v1 = (
            v1
            + ((((v0 << 4) & M32) + 0xAD90777D) ^ ((v0 + s0) & M32) ^ ((v0 >> 5) + 0x7E95761E))
        ) & M32
    return v0


def scalar_next_rand(s):
    s = (1664525 * s + 1013904223) & M32
    return s, float(s & 0x00FFFFFF) / float(0x01000000)


def test_init_rand_bit_exact():
    vals0 = np.array([0, 1, 12345, 0xDEADBEEF, 511 + 511 * 512], dtype=np.uint32)
    vals1 = np.array([0, 7, 99999, 123, 42], dtype=np.uint32)
    got = np.asarray(rng.init_rand(jnp.asarray(vals0), jnp.asarray(vals1)))
    want = np.array(
        [scalar_init_rand(int(a), int(b)) for a, b in zip(vals0, vals1)], dtype=np.uint32
    )
    np.testing.assert_array_equal(got, want)


def test_next_rand_sequence_bit_exact():
    seed0 = scalar_init_rand(4242, 17)
    s = seed0
    want = []
    for _ in range(8):
        s, u = scalar_next_rand(s)
        want.append(u)
    seed = jnp.asarray(np.uint32(seed0))
    got = []
    for _ in range(8):
        seed, u = rng.next_rand(seed)
        got.append(float(u))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_next_rand_uniformity():
    seeds = rng.pixel_seeds(64, 64, frame_count=3)
    seeds, u = rng.next_rand(seeds)
    u = np.asarray(u)
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.02


def test_pixel_seeds_match_linear_index():
    seeds = np.asarray(rng.pixel_seeds(8, 4, frame_count=9))
    assert seeds.shape == (4, 8)
    assert seeds[2, 5] == scalar_init_rand(5 + 2 * 8, 9)


# ---------------------------------------------------------------------- #
# vecmath closed forms
# ---------------------------------------------------------------------- #
def test_cross_dot_normalize():
    a = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 2.0, 3.0]])
    b = jnp.asarray([[0.0, 1.0, 0.0], [4.0, 5.0, 6.0]])
    np.testing.assert_allclose(
        np.asarray(vecmath.cross(a, b)), np.cross(np.asarray(a), np.asarray(b)), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(vecmath.dot(a, b)), [0.0, 32.0], atol=1e-6
    )
    n = np.asarray(vecmath.normalize(b))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-6)
    # zero vector stays zero, no NaN
    z = np.asarray(vecmath.normalize(jnp.zeros((1, 3))))
    assert not np.isnan(z).any() and np.all(z == 0)


def test_reflect():
    i = jnp.asarray([[0.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(vecmath.reflect(i, n)), [[0.0, 1.0, 0.0]], atol=1e-6)


def test_get_perpendicular_is_perpendicular():
    rs = np.random.default_rng(0)
    u = jnp.asarray(rs.normal(size=(64, 3)).astype(np.float32))
    p = vecmath.get_perpendicular(u)
    d = np.asarray(vecmath.dot(u, p))
    np.testing.assert_allclose(d, 0.0, atol=1e-4)
    assert np.all(np.linalg.norm(np.asarray(p), axis=-1) > 1e-6)


def test_refract_snell_and_tir():
    # Normal incidence: direction unchanged.
    i = jnp.asarray([[0.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    r, ok = vecmath.refract(i, n, jnp.asarray([1.5]))
    assert bool(ok[0])
    np.testing.assert_allclose(np.asarray(r), [[0.0, -1.0, 0.0]], atol=1e-6)
    # Grazing exit from dense medium: TIR.
    grazing = vecmath.normalize(jnp.asarray([[1.0, 0.2, 0.0]]))
    r2, ok2 = vecmath.refract(grazing, n, jnp.asarray([1.5]))
    assert not bool(ok2[0])
    np.testing.assert_allclose(np.asarray(r2), 0.0, atol=1e-6)
    # Snell's law at 45 degrees entering glass.
    i45 = vecmath.normalize(jnp.asarray([[1.0, -1.0, 0.0]]))
    r3, ok3 = vecmath.refract(i45, n, jnp.asarray([1.5]))
    assert bool(ok3[0])
    sin_in = math.sin(math.pi / 4)
    sin_out = float(np.asarray(r3)[0, 0])  # x-component of unit refracted dir
    np.testing.assert_allclose(sin_out, sin_in / 1.5, atol=1e-5)


def test_luminance():
    lum = float(vecmath.luminance(jnp.asarray([1.0, 1.0, 1.0])))
    np.testing.assert_allclose(lum, 1.0, atol=1e-6)


# ---------------------------------------------------------------------- #
# Camera
# ---------------------------------------------------------------------- #
def make_ref_camera():
    """The app's camera setup (/root/reference/src/DXRExperimentsApp.cpp:60-63)."""
    cam = Camera()
    cam.set_eye_at_up((8.0, 10.0, 30.0), (0.0, 1.5, 0.0), (0.0, 1.0, 0.0))
    cam.set_aspect(1920, 1080)
    cam.near, cam.far = 1.0, 10000.0
    return cam


def test_camera_basis_orthonormal():
    cam = make_ref_camera()
    for v in (cam.right, cam.up, cam.forward):
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=1e-5)
    assert abs(np.dot(cam.right, cam.up)) < 1e-5
    assert abs(np.dot(cam.right, cam.forward)) < 1e-5
    # Forward points from eye toward the at-point.
    want = np.array([0.0, 1.5, 0.0]) - np.array([8.0, 10.0, 30.0])
    want /= np.linalg.norm(want)
    np.testing.assert_allclose(cam.forward, want, atol=1e-5)


def test_camera_uvw_lengths():
    cam = make_ref_camera()
    u, v, w = cam.uvw()
    np.testing.assert_allclose(np.linalg.norm(w), 1.0, atol=1e-5)
    vlen = math.tan(0.5 * cam.fov_y)
    np.testing.assert_allclose(np.linalg.norm(v), vlen, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(u), vlen * cam.aspect, atol=1e-4)
    # U/V/W mutually orthogonal.
    assert abs(np.dot(u, v)) < 1e-4 and abs(np.dot(u, w)) < 1e-4 and abs(np.dot(v, w)) < 1e-4


def test_primary_rays_center_and_corners():
    cam = make_ref_camera()
    params = camera_params(cam)
    H, W = 64, 128
    origins, dirs = primary_ray_grid(params, W, H)
    assert origins.shape == (H, W, 3) and dirs.shape == (H, W, 3)
    d = np.asarray(dirs)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # Central rays point approximately along forward.
    center = d[H // 2, W // 2]
    assert np.dot(center, cam.forward) > 0.99
    # The top edge of the image should look *up* relative to bottom (image y
    # grows downward; shader flips with -d.y).
    u, v, w = cam.uvw()
    assert np.dot(d[0, W // 2], v) > np.dot(d[H - 1, W // 2], v)
    # Right side of image looks toward +U.
    assert np.dot(d[H // 2, -1], u) > np.dot(d[H // 2, 0], u)


def test_view_proj_changes_on_move():
    cam = make_ref_camera()
    m0 = cam.view_proj_matrix()
    cam.position = cam.position + np.array([0.01, 0, 0], np.float32)
    m1 = cam.view_proj_matrix()
    assert not np.allclose(m0, m1)


# ---------------------------------------------------------------------- #
# Camera controller
# ---------------------------------------------------------------------- #
def test_controller_moves_forward():
    cam = make_ref_camera()
    ctl = CameraController(cam)
    ctl.momentum = False
    p0 = cam.position.copy()
    fwd0 = cam.forward.copy()
    for _ in range(10):
        ctl.update(1.0 / 60.0, InputState(forward=True))
    moved = cam.position - p0
    assert np.linalg.norm(moved) > 0.5
    # Motion is along the forward direction.
    assert np.dot(moved / np.linalg.norm(moved), fwd0) > 0.95


def test_controller_yaw_turns_camera():
    cam = make_ref_camera()
    ctl = CameraController(cam)
    ctl.momentum = False
    ctl.first_person_mouse = True
    fwd0 = cam.forward.copy()
    ctl.update(1.0 / 60.0, InputState(mouse_dx=0.5))
    assert not np.allclose(cam.forward, fwd0, atol=1e-4)
    # Basis stays orthonormal.
    assert abs(np.dot(cam.right, cam.forward)) < 1e-5
    np.testing.assert_allclose(np.linalg.norm(cam.up), 1.0, atol=1e-5)
    # Pure yaw preserves pitch (y-component of forward).
    np.testing.assert_allclose(cam.forward[1], fwd0[1], atol=1e-5)


def test_controller_pitch_clamped():
    cam = make_ref_camera()
    ctl = CameraController(cam)
    ctl.momentum = False
    ctl.first_person_mouse = True
    for _ in range(100):
        ctl.update(1.0 / 60.0, InputState(mouse_dy=1.0))
    assert ctl.current_pitch <= math.pi / 2 + 1e-6


def test_timer_ticks():
    from dxrexperiments_tpu.core.timer import StepTimer

    t = StepTimer()
    t.tick()
    t.tick()
    assert t.frame_count == 2
    assert t.total_seconds >= 0.0
