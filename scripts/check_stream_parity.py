"""Compiled-path parity spot-check at scale (VERDICT r2 ask #1).

Runs on the REAL chip (not interpret mode): traverses a >=200k-tri scene
with the HBM-streaming Pallas kernel (stream=True), the VMEM-resident
Pallas kernel where it still fits, and the jnp packet traversal
(ops/bvh.py, itself parity-pinned against the per-ray reference walk in
tests/test_bvh.py), and asserts exact agreement of hit ids and distances
on primary AND shuffled (incoherent) rays.

Usage: python scripts/check_stream_parity.py  [GRID=317] [RES=512]
"""
import os
import sys

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
from elevenrender_tpu.ops import bvh as bvh_ops
from elevenrender_tpu.ops.bvh_pallas import traverse_pallas
from elevenrender_tpu.ops.camera import camera_ray

GRID = int(os.environ.get("GRID", "318"))   # 2*317^2 = 200,978 tris
RES = int(os.environ.get("RES", "512"))

scene, config, ir = heightfield_scene(grid=GRID, res=RES, spp=1,
                                      compat=False)
T = ir["tris"]["verts"].shape[0]
print(f"tris={T} depth={config.bvh_depth} max_leaf={config.bvh_max_leaf}")
assert T >= 200_000, "spot check must run at >=200k tris"

npix = RES * RES
idx = jnp.arange(npix, dtype=jnp.int32)
px, py = idx % RES, idx // RES
z = jnp.full((npix,), 0.5, jnp.float32)
cam = dict(ir["camera"])
cam["bokeh"] = config.bokeh
ray_o, ray_d = camera_ray(cam, RES, RES, px, py, z, z, z, z, z)

# Incoherent set: shuffled primaries (what bounce/shadow rays look like
# before the Morton sort).
perm = jax.random.permutation(jax.random.PRNGKey(0), npix)
rays = {"coherent": (ray_o, ray_d),
        "shuffled": (ray_o[perm], ray_d[perm])}

bp = ir["bvh_packed"]
interp = jax.default_backend() == "cpu"
fits_vmem = T <= 120_000

for name, (o, d) in rays.items():
    i_ref, t_ref = bvh_ops.traverse_packet(
        ir["bvh"], ir["tris"]["verts"], o, d, depth=config.bvh_depth,
        max_leaf=config.bvh_max_leaf, tile=config.packet_tile)
    i_ref, t_ref = np.asarray(i_ref), np.asarray(t_ref)

    i_s, t_s = traverse_pallas(bp["nodes"], bp["leaf"], bp["tris9"], o, d,
                               depth=config.bvh_depth,
                               max_leaf=config.bvh_max_leaf,
                               interpret=interp, stream=True,
                               sub=config.pallas_sub)
    i_s, t_s = np.asarray(i_s), np.asarray(t_s)
    n_hit = int((i_ref >= 0).sum())
    diff = i_s != i_ref
    # A ray through a shared mesh edge hits two triangles at IDENTICAL t;
    # the strict-'<' nearest rule keeps whichever the kernel visits
    # first, so equal-t id differences are legitimate ties, not errors.
    fin = np.isfinite(t_ref)
    ties = diff & fin & (t_s == t_ref)
    mis = int((diff & ~ties).sum())
    print(f"{name:9s} stream vs packet: {mis}/{npix} real mismatches, "
          f"{int(ties.sum())} equal-t ties ({n_hit} hits); max|dt|="
          f"{np.abs((t_s - t_ref)[fin]).max():.3g}")
    assert mis == 0, f"{name}: stream path disagrees with packet reference"
    assert (np.isfinite(t_s) == fin).all()
    assert np.allclose(t_s[fin], t_ref[fin], rtol=1e-5, atol=1e-5)

    if fits_vmem:
        i_v, t_v = traverse_pallas(bp["nodes"], bp["leaf"], bp["tris9"],
                                   o, d, depth=config.bvh_depth,
                                   max_leaf=config.bvh_max_leaf,
                                   interpret=interp, stream=False,
                                   sub=config.pallas_sub)
        assert (np.asarray(i_v) == i_ref).all()

    # 8-wide kernel (experiments/bvh_wide.py, demoted r4), streaming variant, same bar.
    from elevenrender_tpu.experiments.bvh_wide import (pack_bvh_wide,
                                                       traverse_wide)
    wb = {k: np.asarray(ir["bvh"][k]) for k in
          ("node_bmin", "node_bmax", "node_from", "node_to")}
    wb["depth"] = config.bvh_depth
    bw = dict(zip(("nodes", "leaf"), pack_bvh_wide(wb)))
    i_w, t_w = traverse_wide(bw["nodes"], bw["leaf"], bp["tris9"], o, d,
                             depth=config.bvh_depth,
                             max_leaf=config.bvh_max_leaf,
                             interpret=interp, stream=True,
                             sub=config.pallas_sub)
    i_w, t_w = np.asarray(i_w), np.asarray(t_w)
    diff = i_w != i_ref
    ties = diff & fin & (t_w == t_ref)
    mis = int((diff & ~ties).sum())
    print(f"{name:9s} wide   vs packet: {mis}/{npix} real mismatches, "
          f"{int(ties.sum())} equal-t ties")
    assert mis == 0, f"{name}: wide path disagrees with packet reference"
    assert np.allclose(t_w[fin], t_ref[fin], rtol=1e-5, atol=1e-5)

print("STREAM PARITY OK")
