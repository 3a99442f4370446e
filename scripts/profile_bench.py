"""Component-level timing of the bench scene on the real chip.

Times, separately: full sample step, Pallas traversal on coherent
(primary) rays, traversal on shuffled (incoherent) rays, Morton sort,
and the shading-only residual (trace stubbed to a constant hit).
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

from scenes import heightfield_scene
from elevenrender_tpu.render.integrator import init_state, render_sample_jit
from elevenrender_tpu.ops.bvh_pallas import traverse_pallas
from elevenrender_tpu.ops.sort import sort_for_packets
from elevenrender_tpu.ops.camera import camera_ray

RES = int(os.environ.get("BENCH_RES", "1024"))
GRID = int(os.environ.get("BENCH_GRID", "182"))
REPS = int(os.environ.get("REPS", "4"))

scene, config, ir = heightfield_scene(grid=GRID, res=RES, spp=64,
                                      compat=False)
npix = RES * RES
interp = jax.default_backend() == "cpu"


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    # axon tunnel: force a real materialization
    float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:8].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:8].astype(jnp.float32)))
    dt = (time.time() - t0) / REPS
    print(f"{name:42s} {dt*1e3:9.2f} ms")
    return dt


# --- primary rays -----------------------------------------------------------
idx = jnp.arange(npix, dtype=jnp.int32)
px, py = idx % RES, idx // RES
z = jnp.full((npix,), 0.5, jnp.float32)
cam = dict(ir["camera"])
cam["bokeh"] = config.bokeh
ray_o, ray_d = camera_ray(cam, RES, RES, px, py, z, z, z, z, z)

bp = ir["bvh_packed"]


@jax.jit
def trav(o, d):
    # sub MUST match the render path's config.pallas_sub — an earlier
    # version used the kernel default and measured 3x off (docs/PERF.md
    # "measurement notes").
    return traverse_pallas(bp["nodes"], bp["leaf"], bp["tris9"], o, d,
                           depth=config.bvh_depth,
                           max_leaf=config.bvh_max_leaf, interpret=interp,
                           sub=config.pallas_sub)


@jax.jit
def srt(o, d):
    order, inverse = sort_for_packets(
        o, d, ir["bvh"]["node_bmin"][0], ir["bvh"]["node_bmax"][0])
    return o[order], d[order], inverse


# incoherent: shuffle primary rays
perm = jax.random.permutation(jax.random.PRNGKey(0), npix)
ray_o_inc, ray_d_inc = ray_o[perm], ray_d[perm]

state = init_state(config)
state = render_sample_jit(config, ir, state)
float(jnp.sum(state["samples"]))
t0 = time.time()
for _ in range(REPS):
    state = render_sample_jit(config, ir, state)
float(jnp.sum(state["samples"]))
t_full = (time.time() - t0) / REPS
print(f"{'full sample step':42s} {t_full*1e3:9.2f} ms")
t_trav = timeit("traverse 1M primary (coherent)", trav, ray_o, ray_d)
t_inc = timeit("traverse 1M shuffled (incoherent)", trav, ray_o_inc, ray_d_inc)


@jax.jit
def sort_then_trav(o, d):
    so, sd, inv = srt(o, d)
    i, t = trav(so, sd)
    return i[inv], t[inv]


t_st = timeit("sort + traverse 1M shuffled", sort_then_trav, ray_o_inc, ray_d_inc)
t_sort = timeit("morton sort 1M", srt, ray_o_inc, ray_d_inc)

n_trace = 2 * config.max_bounces
n_sort = config.max_bounces  # ONE sort per bounce since r3 (2f878f1)
print(f"\nfull step = {t_full*1e3:.1f} ms; {n_trace} traces + "
      f"{n_sort} sorts/step")
model = n_trace * t_trav + n_sort * t_sort
print(f"  if traces cost coherent + {n_sort} sorts: {model*1e3:.1f} ms")
print(f"  residual (incoherence premium + shading): "
      f"{(t_full - model)*1e3:.1f} ms")
