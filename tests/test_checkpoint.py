"""Checkpoint/resume: a resumed render continues the exact RNG streams."""

import numpy as np

from elevenrender_tpu.render.renderer import Renderer

from scenes import cornell_scene


def test_checkpoint_resume_exact(tmp_path):
    scene, config, ir = cornell_scene(res=16, spp=4)
    config = config.replace(max_bounces=2)

    # Straight-through render: 4 samples.
    r_ref = Renderer(config, ir)
    r_ref.step(4)
    ref = r_ref.get_pass("beauty")

    # Checkpoint after 2, resume in a fresh renderer, 2 more.
    r1 = Renderer(config, ir)
    r1.step(2)
    ckpt = tmp_path / "state.npz"
    r1.save_checkpoint(str(ckpt))

    r2 = Renderer(config, ir)
    r2.load_checkpoint(str(ckpt))
    r2.step(2)
    resumed = r2.get_pass("beauty")

    np.testing.assert_array_equal(resumed, ref)


def test_pause_and_resume_render():
    """stop() pauses; start() resumes from the accumulated state (the
    reference declares pause/abort but never implements them,
    main.cpp:58-62)."""
    import time
    scene, config, ir = cornell_scene(res=16, spp=64)
    config = config.replace(max_bounces=1)
    r = Renderer(config, ir)
    r.step(1)  # compile before the async thread to keep timing sane
    r.start(sample_target=1_000_000)  # far more than 0.5s can finish
    time.sleep(0.5)
    r.stop()
    r.join()
    mid = r.get_render_info()["samples"]
    assert 1 <= mid < 1_000_000
    r.start(sample_target=3)
    r.join()
    assert r.get_render_info()["samples"] == mid + 3


def test_checkpoint_resolution_guard(tmp_path):
    scene, config, ir = cornell_scene(res=16, spp=1)
    config = config.replace(max_bounces=1)
    r = Renderer(config, ir)
    r.save_checkpoint(str(tmp_path / "s.npz"))

    scene2, config2, ir2 = cornell_scene(res=24, spp=1)
    config2 = config2.replace(max_bounces=1)
    r2 = Renderer(config2, ir2)
    try:
        r2.load_checkpoint(str(tmp_path / "s.npz"))
        raise AssertionError("expected resolution mismatch error")
    except ValueError:
        pass
