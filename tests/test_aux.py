"""Auxiliary subsystems: env flag parsing, checkpoints, profiling helpers."""

import numpy as np
import pytest

from dxrexperiments_tpu.app.headless import parse_env
from dxrexperiments_tpu.scene import envmap


def test_parse_env_gradient_and_strength():
    env = parse_env("gradient x2.5")
    assert int(env["kind"]) == envmap.ENV_GRADIENT
    np.testing.assert_allclose(float(env["strength"]), 2.5)


def test_parse_env_constant():
    env = parse_env("constant:0.1,0.2,0.3")
    assert int(env["kind"]) == envmap.ENV_CONSTANT
    np.testing.assert_allclose(np.asarray(env["const_color"]), [0.1, 0.2, 0.3])


def test_parse_env_latlong(tmp_path):
    from dxrexperiments_tpu.utils.image import write_png

    img = np.random.default_rng(0).uniform(size=(8, 16, 3)).astype(np.float32)
    p = str(tmp_path / "e.png")
    write_png(p, img)
    env = parse_env(f"latlong:{p}")
    assert int(env["kind"]) == envmap.ENV_LATLONG
    assert env["latlong"].shape == (8, 16, 3)


def test_parse_env_cubemap_from_reference_dds():
    import os

    path = "/root/reference/assets/textures/CathedralRadiance.dds"
    if not os.path.exists(path):
        pytest.skip("reference asset not present")
    env = parse_env(f"cubemap:{path}")
    assert int(env["kind"]) == envmap.ENV_CUBEMAP
    assert env["cube"].shape == (6, 256, 256, 3)
    assert float(np.asarray(env["cube"]).max()) > 0.1  # decoded real data


def test_parse_env_rejects_unknown():
    with pytest.raises(ValueError):
        parse_env("skysphere:foo")


def test_checkpoint_to_disk_roundtrip(tmp_path):
    from tests.test_pipelines import make_pipeline, run_frames
    from dxrexperiments_tpu.models import ProgressiveRaytracingPipeline

    pipe = make_pipeline(ProgressiveRaytracingPipeline, n=16)
    run_frames(pipe, 3)
    path = str(tmp_path / "ckpt.npz")
    pipe.save_checkpoint(path)
    img = np.asarray(pipe.get_output())

    pipe2 = make_pipeline(ProgressiveRaytracingPipeline, n=16)
    pipe2.load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(pipe2.get_output()), img)
    assert pipe2.accum_count == 3


def test_frame_timer_phases():
    from dxrexperiments_tpu.utils.profiling import FrameTimer

    t = FrameTimer()
    with t.phase("a"):
        sum(range(1000))
    with t.phase("b"):
        pass
    rep = t.report()
    assert "a:" in rep and "b:" in rep and "total" in rep
