"""Multi-chip scaling throughput harness (VERDICT r3 ask #6).

Measures the sharded render step at each device count N in 1..all,
reporting rays/s, rays/s/device, and scaling efficiency vs N=1 — the
instrument for BASELINE.md:24's >=80% scaling goal.  Correctness of the
sharded path is already covered by __graft_entry__.dryrun_multichip and
tests/test_mesh.py; this adds the missing PERF measurement so a real
multi-chip slice is a one-command number.

On this environment only a virtual CPU mesh is available (the numbers
are meaningless for TPU projection — CPU executes devices sequentially
— but they verify the PLUMBING: the harness builds per-N meshes, times
the shard_map step, computes efficiency).  On a real v5e slice run it
unmodified; multi-host composes via jax.distributed
(parallel/distributed.py) with per-process device counts.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      RES=256 GRID=64 SPP=2 python scripts/multichip_bench.py
  (real slice) python scripts/multichip_bench.py

Prints one JSON line per N plus a summary line; exits nonzero if the
harness itself fails (not on low efficiency — that is a report, not a
gate).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor an explicit CPU request before jax initializes the axon TPU
# (see .claude/skills/verify: JAX_PLATFORMS alone is overridden by the
# sandbox sitecustomize).
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from scenes import heightfield_scene
from elevenrender_tpu.parallel import mesh as mesh_mod
from elevenrender_tpu.render.integrator import init_state

RES = int(os.environ.get("RES", "1024"))
GRID = int(os.environ.get("GRID", "182"))
SPP = int(os.environ.get("SPP", "4"))

scene, config, ir = heightfield_scene(grid=GRID, res=RES, spp=SPP,
                                      compat=False)
rays_per_sample = 2.0 * config.max_bounces * RES * RES
all_devices = jax.devices()
counts = [n for n in (1, 2, 4, 8, 16, 32, 64, 128, 256)
          if n <= len(all_devices)]
npix = RES * RES
counts = [n for n in counts if npix % n == 0]
print(f"devices={len(all_devices)} ({all_devices[0].platform}) "
      f"grid={GRID} res={RES} spp={SPP}", file=sys.stderr, flush=True)

base_rate = None
rows = []
for n in counts:
    m = mesh_mod.make_mesh(n)
    ir_d = mesh_mod.replicate_ir(ir, m)
    state = mesh_mod.shard_render_state(init_state(config), m)
    step = mesh_mod.shard_map_render_step(config, m)(ir_d)
    # Warm up: compile + one sample fully materialized.
    state = step(ir_d, state)
    float(jnp.sum(state["samples"]))
    t0 = time.time()
    for _ in range(SPP):
        state = step(ir_d, state)
    float(jnp.sum(state["samples"]))
    dt = (time.time() - t0) / SPP
    rate = rays_per_sample / dt
    if base_rate is None:
        base_rate = rate
    eff = rate / (base_rate * n)
    row = {"devices": n, "ms_per_sample": round(dt * 1e3, 1),
           "rays_per_sec": round(rate, 1),
           "rays_per_sec_per_device": round(rate / n, 1),
           "scaling_efficiency_vs_1": round(eff, 4)}
    rows.append(row)
    print(json.dumps(row), flush=True)

print(json.dumps({
    "summary": "multichip scaling",
    "platform": all_devices[0].platform,
    "max_devices": counts[-1] if counts else 0,
    "efficiency_at_max": rows[-1]["scaling_efficiency_vs_1"] if rows else None,
    "goal": ">=0.80 on a real ICI-connected slice (BASELINE.md:24)",
}), flush=True)
