"""Drive the ElevenRender-TPU server end-to-end over a real localhost
socket — the verification drive for the TCP surface.

Usage: python scripts/drive_server.py [port] [res] [spp]
Defaults: port 5591, 32x32, 4 spp, CPU backend (fast compiles).
"""
import os
import sys
import threading
import time

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np

from elevenrender_tpu.server.tcp import RenderServer
from elevenrender_tpu.server.client import RenderClient
from scenes import CORNELL_OBJ

PORT = int(sys.argv[1]) if len(sys.argv) > 1 else 5591
RES = int(sys.argv[2]) if len(sys.argv) > 2 else 32
SPP = int(sys.argv[3]) if len(sys.argv) > 3 else 4

server = RenderServer(host="127.0.0.1", port=PORT)
threading.Thread(target=server.serve_forever, daemon=True).start()
time.sleep(0.5)

c = RenderClient("127.0.0.1", PORT, timeout=600)
print("HANDSHAKE OK")
print("DEVICES:", c.get_device_info())

c.load_config(x_res=RES, y_res=RES, sample_target=SPP)
c.load_camera({
    "position": {"x": 0.0, "y": 1.0, "z": -3.5},
    "rotation": {"x": 0.0, "y": 0.0, "z": 0.0},
    "focal_length": 0.035, "sensor_width": 0.036, "sensor_height": 0.024,
    "aperture": 2.8, "focus_distance": 1e6, "bokeh": False})
for name, albedo, emission in (
        ("white", (0.73, 0.73, 0.73), (0, 0, 0)),
        ("red", (0.65, 0.05, 0.05), (0, 0, 0)),
        ("green", (0.12, 0.45, 0.15), (0, 0, 0)),
        ("lamp", (0.0, 0.0, 0.0), (15.0, 15.0, 15.0))):
    c.load_brdf_material({
        "name": name,
        "albedo": {"r": albedo[0], "g": albedo[1], "b": albedo[2]},
        "emission": {"r": emission[0], "g": emission[1], "b": emission[2]},
        "roughness": 1.0, "metalness": 0.0})
c.load_hdri(np.full((4, 8, 3), 0.05, np.float32))
c.load_object(CORNELL_OBJ,
              mtl_text="newmtl white\nnewmtl red\nnewmtl green\nnewmtl lamp\n")
print("LOADS OK")

c.start()
for _ in range(300):
    info = c.get_info()
    if info.get("samples", 0) >= SPP:
        break
    time.sleep(1)
print("INFO:", c.get_info())

img = c.get_pass("beauty").reshape(RES, RES, 4)
print("BEAUTY max:", img[..., :3].max(), "mean:", round(float(img[..., :3].mean()), 4),
      "finite:", bool(np.isfinite(img).all()))
nrm = c.get_pass("normal").reshape(RES, RES, 4)
print("NORMAL center:", nrm[RES // 2, RES // 2, :3])

c.command("--bogus_command_xyz")
print("AFTER-BOGUS INFO:", c.get_info())
img2 = c.get_pass("nonexistent_pass").reshape(RES, RES, 4)
print("UNKNOWN PASS == BEAUTY:", bool(np.allclose(img2, img)))

# Pause keeps progress; bare start resumes the remaining samples.
c.load_config(x_res=RES, y_res=RES, sample_target=2000)
c.start()
for _ in range(600):
    if c.get_info().get("samples", 0) >= 4:
        break
    time.sleep(0.05)
c.pause()
s1 = c.get_info()["samples"]
time.sleep(0.3)
s2 = c.get_info()["samples"]
print(f"PAUSED at {s1} samples; still {s2} after 0.3s:", s1 == s2)
c.start()
for _ in range(600):
    if c.get_info()["samples"] >= 2000:
        break
    time.sleep(0.1)
print("RESUMED to", c.get_info()["samples"], "(target 2000)")
c.abort()
print("ABORT discards progress; samples now:", c.get_info()["samples"])

c.close()
c2 = RenderClient("127.0.0.1", PORT, timeout=60)
print("RECONNECT OK")
c2.close()
server.shutdown()
print("ALL DONE")
