"""Probe the 1M-tri stream-composition crash envelope (r4, VERDICT #1).

r3's single attempt at the full 1M-tri integrator (an 8-sample
executable, ~80 dynamic stream-kernel executions) crashed the TPU worker
while the ISOLATED 1M stream traversal runs clean (565 ms,
.runlogs/bisect_1m_fix.log).  The integrator's bounce/sample loops are
lax.fori_loop, so the crashing executable contained only ~3 STATIC
pallas_calls executed ~80 times — which splits the suspects:

  (a) aggregate DYNAMIC executions per dispatch (DMA/semaphore state
      carried across loop trips),
  (b) single-dispatch WALL TIME (a worker/tunnel watchdog — would also
      explain r3's monolithic 64-spp accumulator crash at 66k tris,
      ~300 s in one dispatch, fixed by 8-sample chunks ~20 s each),
  (c) something specific to the integrator composition (sorts, gathers,
      the any-hit variant interleaved).

This script dissociates (a)/(b) from (c): ONE compiled program whose
traverse count N is a RUNTIME argument (fori_loop bound), alternating
nearest + any-hit stream traversals at 1M tris exactly like the
integrator's per-bounce pair.  Run it at increasing N in separate
processes (a crash wedges remote compiles, but the cached executable
still loads):

    N=10  python scripts/multilaunch.py   # ~6 s dispatch — 1 sample's worth
    N=40  python scripts/multilaunch.py   # ~23 s
    N=80  python scripts/multilaunch.py   # ~45 s — the r3 crash count
    N=160 python scripts/multilaunch.py   # ~90 s
    N=240 python scripts/multilaunch.py   # ~135 s

If crashes track wall time, (b): bound samples-per-dispatch by scene
scale.  If they track N at equal time, (a).  If nothing crashes, (c):
bisect the integrator itself (SORT=1 adds the per-trace gather
permutations to the loop).
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
from elevenrender_tpu.ops.bvh_pallas import traverse_pallas
from elevenrender_tpu.ops.camera import camera_ray


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


GRID = int(os.environ.get("GRID", "708"))
SUB = int(os.environ.get("SUB", "32"))
RES = int(os.environ.get("RES", "1024"))
N = int(os.environ.get("N", "10"))
SORT = bool(int(os.environ.get("SORT", "0")))
npix = RES * RES

scene, config, ir = heightfield_scene(grid=GRID, res=RES, spp=1, compat=False)
T = ir["tris"]["verts"].shape[0]
depth, max_leaf = config.bvh_depth, config.bvh_max_leaf
log(f"tris={T} depth={depth} max_leaf={max_leaf} sub={SUB} N={N} sort={SORT}")

idx = jnp.arange(npix, dtype=jnp.int32)
px, py = idx % RES, idx // RES
z = jnp.full((npix,), 0.5, jnp.float32)
cam = dict(ir["camera"])
cam["bokeh"] = config.bokeh
ray_o, ray_d = camera_ray(cam, RES, RES, px, py, z, z, z, z, z)
bp = ir["bvh_packed"]
bmin0 = ir["bvh"]["node_bmin"][0]
bmax0 = ir["bvh"]["node_bmax"][0]


@jax.jit
def prog(n, nodes, leaf, tris9, o, d):
    tmax = jnp.full((npix,), jnp.inf, jnp.float32)

    def body(k, carry):
        o, d, acc = carry
        if SORT:
            from elevenrender_tpu.ops.sort import sort_for_packets
            order, inverse = sort_for_packets(o, d, bmin0, bmax0)
            o, d = o[order], d[order]
        i1, t1 = traverse_pallas(nodes, leaf, tris9, o, d, depth=depth,
                                 max_leaf=max_leaf, stream=True, sub=SUB)
        i2, t2 = traverse_pallas(nodes, leaf, tris9, o, d, depth=depth,
                                 max_leaf=max_leaf, stream=True, sub=SUB,
                                 exclude=i1, t_max=tmax)
        if SORT:
            i1, t1 = i1[inverse], t1[inverse]
            i2 = i2[inverse]
            o, d = o[inverse], d[inverse]
        acc = acc + jnp.sum((i1 >= 0).astype(jnp.float32)) \
            + jnp.sum((i2 >= 0).astype(jnp.float32))
        # Dependent perturbation: keeps every trip a real traversal and
        # keeps XLA from hoisting anything out of the loop.
        tt = jnp.where(jnp.isfinite(t1), t1, 0.0)
        o = o + d * (tt * 1e-5)[:, None]
        return o, d, acc

    o, d, acc = jax.lax.fori_loop(
        0, (n + 1) // 2, body, (o, d, jnp.zeros((), jnp.float32)))
    return acc


log("compiling (cached after first process)")
t0 = time.time()
n_dev = jnp.asarray(N, jnp.int32)
acc = prog(n_dev, bp["nodes"], bp["leaf"], bp["tris9"], ray_o, ray_d)
log(f"dispatched; materializing (compile+exec from t0={time.time()-t0:.1f}s)")
v = float(acc)
dt = time.time() - t0
log(f"EXEC OK: N={N} traverses, hits-acc={v:.0f}, "
    f"total {dt:.1f}s (compile incl on first run)")

t0 = time.time()
acc = prog(n_dev, bp["nodes"], bp["leaf"], bp["tris9"], ray_o, ray_d)
v = float(acc)
dt = time.time() - t0
log(f"EXEC2 OK: N={N}, hits-acc={v:.0f}, dispatch wall {dt:.1f}s "
    f"({dt / N * 1e3:.0f} ms/traverse)")
