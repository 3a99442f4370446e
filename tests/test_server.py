"""Server end-to-end over a real localhost socket (protocol parity)."""

import threading
import time

import numpy as np
import pytest

from elevenrender_tpu.server.client import RenderClient
from elevenrender_tpu.server.tcp import RenderServer

from scenes import CORNELL_OBJ

PORT = 5873


@pytest.fixture(scope="module")
def server():
    srv = RenderServer(host="127.0.0.1", port=PORT)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    time.sleep(0.3)
    yield srv
    srv.shutdown()


def test_full_session(server):
    c = RenderClient("127.0.0.1", PORT, timeout=300)

    info = c.get_device_info()
    assert len(info["devices"]) >= 1

    c.load_config(x_res=24, y_res=24, sample_target=2)
    c.load_camera({
        "position": {"x": 0.0, "y": 1.0, "z": -3.5},
        "rotation": {"x": 0.0, "y": 0.0, "z": 0.0},
        "focal_length": 0.035, "sensor_width": 0.036,
        "sensor_height": 0.024, "aperture": 2.8,
        "focus_distance": 1e6, "bokeh": False})
    c.load_brdf_material({"name": "white",
                          "albedo": {"r": 0.7, "g": 0.7, "b": 0.7}})
    c.load_brdf_material({"name": "lamp",
                          "albedo": {"r": 0, "g": 0, "b": 0},
                          "emission": {"r": 10, "g": 10, "b": 10}})
    c.load_hdri(np.full((2, 4, 3), 0.1, np.float32))
    c.load_object(CORNELL_OBJ, mtl_text="newmtl white\nnewmtl lamp\n")

    c.start()
    deadline = time.time() + 240
    while time.time() < deadline:
        if c.get_info().get("samples", 0) >= 2:
            break
        time.sleep(1)
    assert c.get_info()["samples"] >= 2

    img = c.get_pass("beauty")
    assert img.shape == (24 * 24 * 4,)
    assert np.isfinite(img).all()
    assert img.max() > 0

    c.close()

    # Server survives and re-accepts (main.cpp:201-235).
    c2 = RenderClient("127.0.0.1", PORT, timeout=30)
    c2.command("--abort")
    msg = c2.recv()
    assert msg.get_string_data() == "ok"
    c2.close()


def test_point_light_over_wire(server):
    """load_point_light + native-mode config: the light must actually
    illuminate the scene (the reference can't express point lights on the
    wire at all, and its shading for them is dead code,
    kernel.cpp:269-301)."""
    c = RenderClient("127.0.0.1", PORT, timeout=300)
    c.load_config(x_res=16, y_res=16, sample_target=2, compat=False)
    c.load_camera({
        "position": {"x": 0.0, "y": 1.0, "z": -3.5},
        "rotation": {"x": 0.0, "y": 0.0, "z": 0.0},
        "focal_length": 0.035, "sensor_width": 0.036,
        "sensor_height": 0.024, "aperture": 2.8,
        "focus_distance": 1e6, "bokeh": False})
    c.load_brdf_material({"name": "white",
                          "albedo": {"r": 0.7, "g": 0.7, "b": 0.7}})
    c.load_brdf_material({"name": "lamp",
                          "albedo": {"r": 0.7, "g": 0.7, "b": 0.7}})
    c.load_hdri(np.zeros((2, 4, 3), np.float32))  # black env
    c.load_object(CORNELL_OBJ, mtl_text="newmtl white\nnewmtl lamp\n")
    c.load_point_light([0.0, 1.5, -1.0], [20.0, 20.0, 20.0])

    c.start()
    deadline = time.time() + 240
    while time.time() < deadline:
        if c.get_info().get("samples", 0) >= 2:
            break
        time.sleep(1)
    img = c.get_pass("beauty")
    assert np.isfinite(img).all()
    # Black env + no emissive materials: any light is the point light's.
    assert img.reshape(-1, 4)[:, :3].max() > 1e-3
    c.abort()
    c.close()


def test_osl_material_over_wire(server):
    """load_osl_material binds a NAMED registry shader to a material's
    albedo slot over TCP — the command the reference declares but never
    handles (main.cpp:60, shader.h:5-18).  Binding the 'yellow'
    placeholder to every wall must strip blue from the render."""
    c = RenderClient("127.0.0.1", PORT, timeout=300)
    c.load_config(x_res=16, y_res=16, sample_target=2)
    c.load_camera({
        "position": {"x": 0.0, "y": 1.0, "z": -3.5},
        "rotation": {"x": 0.0, "y": 0.0, "z": 0.0},
        "focal_length": 0.035, "sensor_width": 0.036,
        "sensor_height": 0.024, "aperture": 2.8,
        "focus_distance": 1e6, "bokeh": False})
    c.load_brdf_material({"name": "white",
                          "albedo": {"r": 0.7, "g": 0.7, "b": 0.7}})
    c.load_brdf_material({"name": "lamp",
                          "albedo": {"r": 0.7, "g": 0.7, "b": 0.7}})
    c.load_hdri(np.full((2, 4, 3), 0.3, np.float32))
    c.load_object(CORNELL_OBJ, mtl_text="newmtl white\nnewmtl lamp\n")
    c.load_osl_material("white", "yellow", slot=0)
    c.load_osl_material("lamp", "yellow", slot=0)

    c.start()
    deadline = time.time() + 240
    while time.time() < deadline:
        if c.get_info().get("samples", 0) >= 2:
            break
        time.sleep(1)
    img = c.get_pass("beauty").reshape(-1, 4)[:, :3]
    assert np.isfinite(img).all() and img.max() > 0
    # Yellow albedo kills the blue channel of every surface interaction;
    # residual blue can only come from direct env misses.
    assert img[:, 0].sum() > 1.5 * img[:, 2].sum()

    # Unknown shader name / unloaded material: reference-parity no-op.
    c.command("--load_osl_material --material white --shader nope")
    assert c.recv().get_string_data() == "ok"
    c.command("--load_osl_material --material ghost --shader yellow")
    assert c.recv().get_string_data() == "ok"
    c.abort()
    c.close()


def test_help_over_wire(server):
    """--help returns the command vocabulary (main.cpp:48-86)."""
    c = RenderClient("127.0.0.1", PORT, timeout=60)
    txt = c.help()
    for word in ("--load_object", "--load_osl_material", "--get_pass",
                 "--start"):
        assert word in txt
    c.close()


def test_device_probe(server):
    """get_sycl_info must report a REAL compatibility probe (the analog
    of sycl::is_compatible, kernel.cpp:708-720), not a hardcoded True."""
    c = RenderClient("127.0.0.1", PORT, timeout=60)
    info = c.get_device_info()
    assert len(info["devices"]) >= 1
    for d in info["devices"]:
        assert isinstance(d["is_compatible"], bool)
    # The default device renders our tests, so it must probe compatible.
    assert info["devices"][0]["is_compatible"] is True
    c.close()


def test_pause_resume_abort(server):
    """pause keeps progress and start resumes it; abort discards it.
    (The reference declares both commands as no-ops, main.cpp:81-82.)"""
    c = RenderClient("127.0.0.1", PORT, timeout=300)
    target = 2000  # big enough that the pause lands mid-render
    c.load_config(x_res=16, y_res=16, sample_target=target)
    c.load_camera({
        "position": {"x": 0.0, "y": 1.0, "z": -3.5},
        "rotation": {"x": 0.0, "y": 0.0, "z": 0.0},
        "focal_length": 0.035, "sensor_width": 0.036,
        "sensor_height": 0.024, "aperture": 2.8,
        "focus_distance": 1e6, "bokeh": False})
    c.load_brdf_material({"name": "white",
                          "albedo": {"r": 0.7, "g": 0.7, "b": 0.7}})
    c.load_brdf_material({"name": "lamp",
                          "albedo": {"r": 0, "g": 0, "b": 0},
                          "emission": {"r": 10, "g": 10, "b": 10}})
    c.load_hdri(np.full((2, 4, 3), 0.1, np.float32))
    c.load_object(CORNELL_OBJ, mtl_text="newmtl white\nnewmtl lamp\n")

    c.start()
    deadline = time.time() + 240
    while time.time() < deadline:
        if c.get_info().get("samples", 0) >= 4:
            break
        time.sleep(0.05)

    c.pause()
    s1 = c.get_info()["samples"]
    assert 4 <= s1 < target
    time.sleep(0.3)
    assert c.get_info()["samples"] == s1, "samples advanced while paused"

    c.start()  # bare start after pause = resume, not rebuild
    deadline = time.time() + 240
    while time.time() < deadline:
        s = c.get_info()["samples"]
        assert s >= s1, "resume dropped accumulated progress"
        if s >= target:
            break
        time.sleep(0.2)
    assert c.get_info()["samples"] == target

    c.abort()
    assert c.get_info()["samples"] == 0
    c.close()
