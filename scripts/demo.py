"""Render the demo scenes to PNG — the framework's showcase script.

Usage: python scripts/demo.py [outdir] [res] [spp]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

if os.environ.get("ELEVENRT_DEVICE", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

from elevenrender_tpu.render.renderer import Renderer  # noqa: E402
from scenes import cornell_scene, heightfield_scene  # noqa: E402

outdir = sys.argv[1] if len(sys.argv) > 1 else "out"
res = int(sys.argv[2]) if len(sys.argv) > 2 else 256
spp = int(sys.argv[3]) if len(sys.argv) > 3 else 32
os.makedirs(outdir, exist_ok=True)

for name, build in (("cornell", lambda: cornell_scene(res=res, spp=spp,
                                                      compat=False)),
                    ("heightfield", lambda: heightfield_scene(
                        grid=96, res=res, spp=spp, compat=False))):
    t0 = time.time()
    scene, config, ir = build()
    r = Renderer(config, ir)
    r.step(spp)
    r.save_pass("beauty", os.path.join(outdir, f"{name}.png"))
    r.save_pass("normal", os.path.join(outdir, f"{name}_normal.png"))
    r.save_pass("denoise", os.path.join(outdir, f"{name}_denoised.png"))
    print(f"{name}: {res}x{res} {spp}spp in {time.time() - t0:.1f}s")
