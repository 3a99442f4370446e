"""Before/after for the round-2 texture-fetch rework, on the real chip.

Renders the bench heightfield WITH a checker albedo + normal map bound,
twice:
  before: round-1 behavior forced — all 7 map slots fetched per bounce,
          mixed-filter sampling (bilinear AND nearest evaluated, then
          selected) — via config tex_slots_used=(True,)*7,
          tex_uniform_filter=-1;
  after:  as built — only bound slots fetched (static elision), single
          compiled sampler when the atlas is uniform-filter.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from scenes import heightfield_mesh
from elevenrender_tpu.render.integrator import init_state, render_sample_jit
from elevenrender_tpu.scene.hdri import HDRI
from elevenrender_tpu.scene.material import Material
from elevenrender_tpu.scene.scene import Scene
from elevenrender_tpu.scene.texture import Texture

RES = int(os.environ.get("BENCH_RES", "1024"))
GRID = int(os.environ.get("BENCH_GRID", "182"))
REPS = int(os.environ.get("REPS", "4"))

scene = Scene()
scene.add_mesh(heightfield_mesh(GRID))

checker = np.zeros((64, 64, 3), np.float32)
yy, xx = np.mgrid[0:64, 0:64]
checker[..., 0] = ((xx // 8 + yy // 8) % 2).astype(np.float32)
checker[..., 1] = 0.5
checker[..., 2] = 0.3
nmap = np.full((32, 32, 3), 0.5, np.float32)
nmap[..., 2] = 1.0
scene.add_texture(Texture("checker", checker, Texture.FILTER_BILINEAR))
scene.add_texture(Texture("nmap", nmap, Texture.FILTER_BILINEAR))

mat = Material(name="terrain", roughness=0.6, metallic=0.1)
mat.albedo_map = "checker"
mat.normal_map = "nmap"
mat.compute_aniso_alphas()
scene.add_material(mat)
scene.pair_textures()

sky = np.zeros((16, 32, 3), np.float32)
sky[:8] = [0.6, 0.7, 0.9]
sky[8:] = [0.2, 0.2, 0.2]
scene.add_hdri(HDRI(Texture("sky", sky)))
scene.camera.position = np.array([0.0, 1.5, -4.0], np.float32)
scene.camera.rotation = np.array([15.0, 0.0, 0.0], np.float32)
scene.x_res = scene.y_res = RES

config, ir = scene.build()
config = config.replace(compat=False)
print("as built: slots_used =", config.tex_slots_used,
      "uniform_filter =", config.tex_uniform_filter)

rays = 2.0 * config.max_bounces * RES * RES


def timeit(name, cfg):
    state = init_state(cfg)
    state = render_sample_jit(cfg, ir, state)
    float(jnp.sum(state["samples"]))
    t0 = time.time()
    for _ in range(REPS):
        state = render_sample_jit(cfg, ir, state)
    float(jnp.sum(state["samples"]))
    dt = (time.time() - t0) / REPS
    print(f"{name:44s} {dt*1e3:9.2f} ms  ({rays/dt/1e6:.2f} Mrays/s)")
    return dt


t_old = timeit("before (all 7 slots, mixed-filter select)",
               config.replace(tex_slots_used=(True,) * 7,
                              tex_uniform_filter=-1))
t_new = timeit("after (bound slots only, static filter)", config)
print(f"speedup on the textured bench scene: {t_old/t_new:.2f}x")
