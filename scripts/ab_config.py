"""Generic RenderConfig-knob A/B on the full sample step (real chip).

Times render_sample_jit_safe on the bench heightfield for each value of
ONE RenderConfig field, transient-proof (every config compiles + a 60 s
burn before any timed cell — docs/PERF.md measurement notes).

Usage:
  AB_FIELD=shadow_sort AB_VALUES=False,True python scripts/ab_config.py
  AB_FIELD=env_sampler AB_VALUES=cdf,alias HDRI_RES=2048 ...
Env: BENCH_GRID (182), BENCH_RES (1024), REPS (3), HDRI_RES (0 = scene
default; else replace the env with a random HDRI_RES x HDRI_RES/2 one).
"""
import ast
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

from scenes import heightfield_scene
from elevenrender_tpu.render.integrator import (init_state,
                                                render_sample_jit_safe)

RES = int(os.environ.get("BENCH_RES", "1024"))
GRID = int(os.environ.get("BENCH_GRID", "182"))
REPS = int(os.environ.get("REPS", "3"))
FIELD = os.environ["AB_FIELD"]
VALUES = []
for tok in os.environ["AB_VALUES"].split(","):
    try:
        VALUES.append(ast.literal_eval(tok))
    except (ValueError, SyntaxError):
        VALUES.append(tok)  # plain string value

scene, config, ir = heightfield_scene(grid=GRID, res=RES, spp=64,
                                      compat=False)
HDRI_RES = int(os.environ.get("HDRI_RES", "0"))
if HDRI_RES:
    from elevenrender_tpu.ops.hdri import pack_hdri
    from elevenrender_tpu.scene.hdri import HDRI
    from elevenrender_tpu.scene.texture import Texture
    rng = np.random.default_rng(0)
    big = rng.uniform(0.05, 1.0,
                      (HDRI_RES // 2, HDRI_RES, 3)).astype(np.float32)
    big[HDRI_RES // 8, HDRI_RES // 3] = [200.0, 180.0, 150.0]
    ir = dict(ir)
    ir["env"] = pack_hdri(HDRI(Texture("big", big)), alias_table=True)
    print(f"env replaced: {HDRI_RES}x{HDRI_RES // 2}", flush=True)

cfgs = [config.replace(**{FIELD: v}) for v in VALUES]
print(f"tris={ir['tris']['verts'].shape[0]} field={FIELD} values={VALUES}",
      flush=True)

# Sacrificial pass: compile every cell, then burn the tunnel transient.
t0 = time.time()
for cfg in cfgs:
    st = render_sample_jit_safe(cfg, ir, init_state(cfg))
    float(jnp.sum(st["passes"].ravel()[:8]))
st = init_state(cfgs[0])
while time.time() - t0 < 60.0:
    st = render_sample_jit_safe(cfgs[0], ir, st)
    float(jnp.sum(st["passes"].ravel()[:8]))
print(f"[burn] {time.time() - t0:.0f} s", flush=True)

for v, cfg in zip(VALUES, cfgs):
    st = init_state(cfg)
    st = render_sample_jit_safe(cfg, ir, st)
    float(jnp.sum(st["passes"].ravel()[:8]))
    t0 = time.time()
    for _ in range(REPS):
        st = render_sample_jit_safe(cfg, ir, st)
    float(jnp.sum(st["passes"].ravel()[:8]))
    dt = (time.time() - t0) / REPS
    print(f"{FIELD}={v}: {dt * 1e3:8.1f} ms/sample", flush=True)
