"""At-scale hardware regression: compiled-path correctness on the REAL
chip, machine-readable (VERDICT r3 ask #4).

One command; asserts exact agreement of every compiled traversal path at
scale and writes a JSON result file a judge (or CI on real hardware) can
read.  Covers, per scene scale (318k and 1M tris by default):

  - HBM-streaming Pallas kernel vs the jnp packet traversal (itself
    parity-pinned against the per-ray reference walk in tests/test_bvh.py)
    on coherent AND shuffled rays: exact hit ids (equal-t ties allowed —
    shared mesh edges), distances to 1e-5;
  - VMEM-resident kernel where the scene fits;
  - 8-wide streaming kernel (experiments/, demoted r4 — still parity-gated here), same bar;
  - ANY-HIT occlusion mode, exactly: with exclude=-1 and a finite
    per-ray t_max the occlusion flag must equal the packet reference's
    (t_nearest < t_max) — same predicate, independent path; plus the
    exclusion invariants (never reports the excluded tri; exclusion can
    only clear flags, never add).

Usage:
    python scripts/hw_regression.py                 # -> .runlogs/hw_regression.json
    OUT=.runlogs/hw_regression_r04.json GRIDS=318,708 python scripts/hw_regression.py

The reference traverses arbitrary-T scenes from device memory as a matter
of course (/root/reference/src/BVH.cpp:63-120); this file is the evidence
that the TPU stream path does too, correctly.
"""
import json
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
from elevenrender_tpu.ops import bvh as bvh_ops
from elevenrender_tpu.ops.bvh_pallas import traverse_pallas
from elevenrender_tpu.experiments.bvh_wide import (pack_bvh_wide,
                                                       traverse_wide)
from elevenrender_tpu.ops.camera import camera_ray

GRIDS = [int(g) for g in os.environ.get("GRIDS", "318,708").split(",")]
RES = int(os.environ.get("RES", "512"))
OUT = os.environ.get("OUT", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".runlogs", "hw_regression.json"))

results = {"backend": jax.default_backend(),
           "device": str(jax.devices()[0]),
           "res": RES, "scenes": []}
interp = jax.default_backend() == "cpu"
ok_all = True


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def check(rec, name, cond, detail=""):
    global ok_all
    rec["checks"].append({"name": name, "ok": bool(cond), "detail": detail})
    ok_all = ok_all and bool(cond)
    log(f"  {'PASS' if cond else 'FAIL'} {name} {detail}")


for GRID in GRIDS:
    scene, config, ir = heightfield_scene(grid=GRID, res=RES, spp=1,
                                          compat=False)
    T = ir["tris"]["verts"].shape[0]
    rec = {"grid": GRID, "tris": T, "depth": config.bvh_depth,
           "max_leaf": config.bvh_max_leaf, "checks": []}
    results["scenes"].append(rec)
    log(f"scene grid={GRID}: tris={T} depth={config.bvh_depth} "
        f"max_leaf={config.bvh_max_leaf}")

    npix = RES * RES
    idx = jnp.arange(npix, dtype=jnp.int32)
    px, py = idx % RES, idx // RES
    z = jnp.full((npix,), 0.5, jnp.float32)
    cam = dict(ir["camera"])
    cam["bokeh"] = config.bokeh
    ray_o, ray_d = camera_ray(cam, RES, RES, px, py, z, z, z, z, z)
    perm = jax.random.permutation(jax.random.PRNGKey(0), npix)
    bp = ir["bvh_packed"]
    fits_vmem = T <= 120_000
    # 8-wide left the supported IR in r4 (demoted to experiments/);
    # regression still covers it by packing its tables on demand.
    wb = {k: __import__("numpy").asarray(ir["bvh"][k]) for k in
          ("node_bmin", "node_bmax", "node_from", "node_to")}
    wb["depth"] = config.bvh_depth
    bw = dict(zip(("nodes", "leaf"), pack_bvh_wide(wb)))

    # Single-dispatch wall time must stay under the worker watchdog
    # (~60 s, docs/PERF.md): at 1M tris the jnp packet reference on
    # shuffled rays blows it in one 262k-ray dispatch (found the hard
    # way), so every traversal here is driven in ray slices.
    n_slices = 4 if T > 400_000 else 1
    sl = npix // n_slices

    def sliced(fn, o, d, *extra):
        outs = [fn(o[i * sl:(i + 1) * sl], d[i * sl:(i + 1) * sl],
                   *[e[i * sl:(i + 1) * sl] for e in extra])
                for i in range(n_slices)]
        return tuple(np.concatenate([np.asarray(x[j]) for x in outs])
                     for j in range(2))

    for name, (o, d) in (("coherent", (ray_o, ray_d)),
                         ("shuffled", (ray_o[perm], ray_d[perm]))):
        i_ref, t_ref = sliced(
            lambda o, d: bvh_ops.traverse_packet(
                ir["bvh"], ir["tris"]["verts"], o, d,
                depth=config.bvh_depth, max_leaf=config.bvh_max_leaf,
                tile=config.packet_tile), o, d)
        fin = np.isfinite(t_ref)

        def against_ref(i_x, t_x, label):
            i_x, t_x = np.asarray(i_x), np.asarray(t_x)
            diff = i_x != i_ref
            # A ray through a shared mesh edge hits two triangles at
            # (near-)identical t; the strict-'<' nearest rule keeps
            # whichever the float path ranks closer, and the packed
            # kernel's Möller-Trumbore/slab arithmetic differs from the
            # jnp packet's in op order — so id differences within float
            # noise of each other are boundary ties, not traversal
            # errors (measured: 1 lane in 262k at 1M tris, dt = 2e-7
            # relative, ADJACENT tri ids).  Anything beyond rtol 1e-6
            # counts as real.
            ties = diff & fin & (
                np.abs(t_x - t_ref) <= 1e-6 * np.maximum(np.abs(t_ref), 1.0))
            real = diff & ~ties
            mis = int(real.sum())
            t_ok = (np.isfinite(t_x) == fin).all() and \
                np.allclose(t_x[fin], t_ref[fin], rtol=1e-5, atol=1e-5)
            detail = (f"{mis} real mismatches, {int(ties.sum())} equal-t "
                      f"ties, {int(fin.sum())} hits")
            if mis:
                lanes = np.nonzero(real)[0][:5]
                detail += "".join(
                    f"; lane {k}: got (idx={i_x[k]}, t={t_x[k]:.9g}) "
                    f"vs ref (idx={i_ref[k]}, t={t_ref[k]:.9g})"
                    for k in lanes)
            check(rec, f"{name}/{label}", mis == 0 and t_ok, detail)

        t0 = time.time()
        i_s, t_s = sliced(
            lambda o, d: traverse_pallas(
                bp["nodes"], bp["leaf"], bp["tris9"], o, d,
                depth=config.bvh_depth, max_leaf=config.bvh_max_leaf,
                interpret=interp, stream=True, sub=config.pallas_sub),
            o, d)
        against_ref(i_s, t_s, "stream")
        rec[f"{name}_stream_ms"] = round((time.time() - t0) * 1e3, 1)

        if fits_vmem:
            i_v, t_v = sliced(
                lambda o, d: traverse_pallas(
                    bp["nodes"], bp["leaf"], bp["tris9"], o, d,
                    depth=config.bvh_depth, max_leaf=config.bvh_max_leaf,
                    interpret=interp, stream=False, sub=config.pallas_sub),
                o, d)
            against_ref(i_v, t_v, "vmem")

        if True:  # wide tables packed on demand (experiments/, r4)
            i_w, t_w = sliced(
                lambda o, d: traverse_wide(
                    bw["nodes"], bw["leaf"], bp["tris9"], o, d,
                    depth=config.bvh_depth, max_leaf=config.bvh_max_leaf,
                    interpret=interp, stream=True, sub=config.pallas_sub),
                o, d)
            against_ref(i_w, t_w, "wide_stream")

        # --- any-hit occlusion, exact predicate check --------------------
        # Alternate lanes: t_max = 0.9 * t_nearest (flag must CLEAR —
        # no hit can be closer than the nearest) and 1.1 * t_nearest
        # (flag must SET — the nearest itself qualifies); misses get a
        # mid-scene constant (must stay clear).  With exclude=-1 the
        # kernel's flag must equal (t_nearest < t_max) exactly.
        fac = np.where(np.arange(npix) % 2 == 0, 0.9, 1.1)
        t_max = jnp.asarray(np.where(fin, fac * np.where(fin, t_ref, 1.0),
                                     3.0).astype(np.float32))
        none_excl = jnp.full((npix,), -1, jnp.int32)
        ssub = config.shadow_pallas_sub or config.pallas_sub

        def anyhit(o, d, excl, tm):
            return traverse_pallas(bp["nodes"], bp["leaf"], bp["tris9"],
                                   o, d, depth=config.bvh_depth,
                                   max_leaf=config.bvh_max_leaf,
                                   interpret=interp, stream=True,
                                   sub=ssub, exclude=excl, t_max=tm)

        i_a, _ = sliced(anyhit, o, d, none_excl, t_max)
        flag = i_a >= 0
        want = t_ref < np.asarray(t_max)
        mism = int((flag != want).sum())
        check(rec, f"{name}/anyhit_tmax", mism == 0,
              f"{mism} flag mismatches vs nearest predicate "
              f"({int(want.sum())} occluded)")

        # Exclusion invariants: excluding the nearest hit never reports
        # it, and can only clear flags relative to no-exclusion (both
        # with t_max=inf).
        inf_t = jnp.full((npix,), jnp.inf, jnp.float32)
        i_e, _ = sliced(anyhit, o, d, jnp.asarray(i_ref), inf_t)
        i_n, _ = sliced(anyhit, o, d, none_excl, inf_t)
        self_hits = int(((i_e >= 0) & (i_e == i_ref)).sum())
        monotone = int(((i_e >= 0) & (i_n < 0)).sum())
        check(rec, f"{name}/anyhit_exclude",
              self_hits == 0 and monotone == 0,
              f"{self_hits} self-hits, {monotone} monotonicity violations "
              f"({int((i_n >= 0).sum())} -> {int((i_e >= 0).sum())} occl)")

results["ok"] = ok_all
os.makedirs(os.path.dirname(OUT), exist_ok=True)
with open(OUT, "w") as f:
    json.dump(results, f, indent=1)
log(f"{'ALL PASS' if ok_all else 'FAILURES'} -> {OUT}")
sys.exit(0 if ok_all else 1)
