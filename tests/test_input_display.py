"""Analog gamepad input + pixel-accurate kitty presentation.

Parity targets: GameInput's XInput stick polling with radial deadzone
feeding the fly camera (/root/reference/libs/MiniEngine/GameInput.cpp:303-330,
CameraController.cpp:50-66) and the windowed swapchain present
(/root/reference/src/utils/Win32Application.cpp:49-62). The gamepad reader
is driven with synthetic ``js_event`` streams; the kitty presenter is
verified by decoding its own escape output back to pixels (a lossless
present, which the ANSI half-block path can never be).
"""

import base64
import io
import re

import numpy as np

from dxrexperiments_tpu.core.camera import Camera
from dxrexperiments_tpu.core.camera_controller import CameraController, InputState
from dxrexperiments_tpu.core.gamepad import (
    AXIS_LX, AXIS_LY, AXIS_RX, AXIS_RY, DEADZONE, Gamepad, make_event,
)


class _Stream:
    """File-like over a mutable byte queue (non-blocking read semantics)."""

    def __init__(self):
        self.buf = b""

    def feed(self, data: bytes) -> None:
        self.buf += data

    def read(self, n: int) -> bytes:
        out, self.buf = self.buf[:n], self.buf[n:]
        return out


def test_gamepad_axes_and_deadzone():
    st = _Stream()
    pad = Gamepad(st)
    # Inside the XInput deadzone: filtered to zero.
    st.feed(make_event(AXIS_LX, DEADZONE * 0.5))
    inp = pad.apply(InputState())
    assert inp.analog_strafe == 0.0 and inp.analog_forward == 0.0
    # Full-right stick: strafe +1; stick up (negative Y) -> forward +.
    st.feed(make_event(AXIS_LX, 1.0) + make_event(AXIS_LY, -1.0))
    inp = pad.apply(InputState())
    assert inp.analog_strafe > 0.5
    assert inp.analog_forward > 0.5
    # Axis state persists between polls (kernel reports changes only).
    inp = pad.apply(InputState())
    assert inp.analog_strafe > 0.5
    # Right stick routes to look axes; init-flag events count as state.
    st.feed(make_event(AXIS_RX, 0.8, init=True) + make_event(AXIS_RY, 0.0))
    inp = pad.apply(InputState())
    assert inp.analog_yaw > 0.5 and inp.analog_pitch == 0.0


def test_gamepad_partial_reads_and_buttons():
    st = _Stream()
    pad = Gamepad(st)
    ev = make_event(0, 1, axis=False)  # button 0 down
    st.feed(ev[:3])
    pad.poll()
    assert pad.buttons() == frozenset()
    st.feed(ev[3:] + make_event(1, 1, axis=False))
    pad.poll()
    assert pad.buttons() == {0, 1}
    st.feed(make_event(0, 0, axis=False))
    pad.poll()
    assert pad.buttons() == {1}


def test_gamepad_drives_camera_like_keys():
    """A full analog deflection moves the camera exactly like the key."""

    def fly(inp):
        cam = Camera()
        cam.position = np.zeros(3, np.float32)
        ctl = CameraController(cam)
        ctl.momentum = False
        for _ in range(10):
            ctl.update(1.0 / 60.0, inp)
        return cam.position.copy()

    key_pos = fly(InputState(forward=True))
    pad_pos = fly(InputState(analog_forward=1.0))
    np.testing.assert_allclose(pad_pos, key_pos, rtol=1e-6)
    half = fly(InputState(analog_forward=0.5))
    np.testing.assert_allclose(half, key_pos * 0.5, rtol=1e-5)


_KITTY_RE = re.compile(r"\x1b_G([^;]*);([^\x1b]*)\x1b\\")


def test_kitty_present_is_pixel_accurate():
    from dxrexperiments_tpu.app.viewer import KittyDisplay

    rng = np.random.default_rng(7)
    img = rng.random((48, 64, 3)).astype(np.float32)
    out = io.StringIO()
    KittyDisplay(out=out).present(img, hud="hud-line")
    text = out.getvalue()
    chunks = _KITTY_RE.findall(text)
    assert chunks, "no kitty graphics escapes emitted"
    head = chunks[0][0]
    assert "a=T" in head and "f=24" in head and "s=64" in head and "v=48" in head
    payload = base64.standard_b64decode("".join(c[1] for c in chunks))
    got = np.frombuffer(payload, np.uint8).reshape(48, 64, 3)
    want = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, want)  # lossless present
    assert "hud-line" in text
    # chunking respects the 4096-byte protocol cap, with m=1 continuations
    assert all(len(c[1]) <= 4096 for c in chunks)
    assert "m=1" in text and chunks[-1][0].endswith("m=0")


def test_kitty_size_fallback_without_tty():
    from dxrexperiments_tpu.app.viewer import KittyDisplay

    w, h = KittyDisplay(out=io.StringIO()).size()
    assert w >= 16 and h >= 16 and h % 2 == 0
