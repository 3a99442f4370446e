"""Speed-of-light analysis of the flagship traversal kernel (VERDICT r2
ask #2): measured time vs hardware bounds, with EXACT work counters from
the kernel itself (traverse_pallas(count_steps=True)).

Per ray-regime (coherent camera rays / Morton-sorted shuffled rays):
  - measured wall time of the uncounted kernel (burn-in first — the axon
    tunnel's first executions run ~2.4x slow, docs/PERF.md),
  - per-tile node visits V, leaf rows scanned L, leaf-parent visits B,
  - scalar-walk floor: every visit serializes a dependency chain on the
    scalar core (row fetch -> lane rotate -> slab -> 2 horizontal
    reductions -> branch); reported as measured cycles/visit,
  - VPU floor: vector flops actually issued (2 slab tests ~ 33 ops/visit
    + 8 MT tests ~ 66 ops/leaf-row, each over sub*128 f32 lanes) at
    4096 f32 lanes/cycle (VPU_F32_PER_CYC) @ 0.94 GHz,
  - HBM floor (stream mode): B DMA bursts x rows2*512 B + ray/result IO
    at 819 GB/s (v5e).

The gap between measured and max(floors) is the serialized scalar walk —
the number this script exists to pin (docs/PERF.md "speed of light").
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

from scenes import heightfield_scene
from elevenrender_tpu.ops.bvh_pallas import traverse_pallas
from elevenrender_tpu.ops.camera import camera_ray
from elevenrender_tpu.ops.sort import sort_for_packets

RES = int(os.environ.get("BENCH_RES", "1024"))
GRID = int(os.environ.get("BENCH_GRID", "182"))
REPS = int(os.environ.get("REPS", "4"))
CLOCK = 0.94e9          # v5e TensorCore clock
VPU_F32_PER_CYC = 4096  # 4 VPU sub-units x (8,128)
HBM_BPS = 819e9         # v5e HBM bandwidth

npix = RES * RES
interp = jax.default_backend() == "cpu"

scene, config, ir = heightfield_scene(grid=GRID, res=RES, spp=64,
                                      compat=False)
T = ir["tris"]["verts"].shape[0]
stream = T > 120_000
sub = config.pallas_sub
tile = sub * 128
NT = -(-npix // tile)
# Mirror the kernel's DMA window exactly, including the 8-row alignment
# (ops/bvh_pallas.py traverse_pallas; ADVICE r3 — the unaligned figure
# understated bytes/burst).
rows2 = (2 * config.bvh_max_leaf + 7) // 8 + 1
rows2 = -(-rows2 // 8) * 8
print(f"tris={T} depth={config.bvh_depth} max_leaf={config.bvh_max_leaf} "
      f"sub={sub} stream={stream} tiles={NT}")

idx = jnp.arange(npix, dtype=jnp.int32)
px, py = idx % RES, idx // RES
z = jnp.full((npix,), 0.5, jnp.float32)
cam = dict(ir["camera"])
cam["bokeh"] = config.bokeh
ray_o, ray_d = camera_ray(cam, RES, RES, px, py, z, z, z, z, z)
perm = jax.random.permutation(jax.random.PRNGKey(0), npix)


@jax.jit
def sorted_rays(o, d):
    order, _ = sort_for_packets(o, d, ir["bvh"]["node_bmin"][0],
                                ir["bvh"]["node_bmax"][0])
    return o[order], d[order]


ray_o_inc, ray_d_inc = sorted_rays(ray_o[perm], ray_d[perm])
bp = ir["bvh_packed"]


def trav(o, d, count=False):
    return traverse_pallas(bp["nodes"], bp["leaf"], bp["tris9"], o, d,
                           depth=config.bvh_depth,
                           max_leaf=config.bvh_max_leaf, interpret=interp,
                           stream=stream, sub=sub, count_steps=count)


# Burn-in: the tunnel transient is TIME-based (docs/PERF.md) — burn
# for a duration, not a count.
_deadline = time.time() + 20.0
while time.time() < _deadline:
    i, t = trav(ray_o, ray_d)
    float(jnp.sum(t.ravel()[:8]))

for name, o, d in (("coherent", ray_o, ray_d),
                   ("sorted-incoherent", ray_o_inc, ray_d_inc)):
    i, t = trav(o, d)
    float(jnp.sum(t.ravel()[:8]))
    t0 = time.time()
    for _ in range(REPS):
        i, t = trav(o, d)
    float(jnp.sum(t.ravel()[:8]) + jnp.sum(i.ravel()[:8].astype(jnp.float32)))
    dt = (time.time() - t0) / REPS

    _, _, counts = trav(o, d, count=True)
    c = np.asarray(counts)
    V, L, B = c[:, 0].sum(), c[:, 1].sum(), c[:, 2].sum()

    # Floors.
    vec_flops = (V * 2 * 33 + L * 8 * 66) * tile
    t_vpu = vec_flops / (VPU_F32_PER_CYC * CLOCK)
    io_bytes = npix * (24 + 8)  # rays in, (idx, t) out
    dma_bytes = B * rows2 * 512 if stream else 0
    table_bytes = 0 if not stream else 0  # nodes/leaf resident
    t_hbm = (io_bytes + dma_bytes + table_bytes) / HBM_BPS
    floor = max(t_vpu, t_hbm)

    cyc_per_visit = dt / V * CLOCK
    print(f"\n[{name}] measured {dt*1e3:8.2f} ms "
          f"({npix/dt/1e6:.1f} Mrays/s)")
    print(f"  visits/tile {V/NT:8.0f}   leafrows/tile {L/NT:8.0f}   "
          f"leafparents/tile {B/NT:6.0f}")
    print(f"  VPU floor {t_vpu*1e3:8.2f} ms   HBM floor {t_hbm*1e3:8.2f} ms"
          f"   (DMA {dma_bytes/1e6:.0f} MB)")
    print(f"  fraction of max(floor): {floor/dt*100:5.1f}%   "
          f"scalar-walk cost: {cyc_per_visit:6.0f} cyc/visit "
          f"(dep-chain floor ~100)")
