"""Decompose the headline fwd+bwd pipeline (render/grad.py two-pass
accumulator) into its dispatch units at the bench shape:

  - plain fwd chunk      (_accum_fwd_chunk, no recording)
  - record fwd chunk     (_accum_fwd_chunk_record — pass 1)
  - replay VJP chunk     (_accum_bwd_chunk with caches — pass 2)

Per-sample numbers steer the gradient levers (docs/PERF.md "next
levers"): the record overhead (record - plain) and the replay floor are
the two remaining gradient costs now that pass 2 runs zero traversals.

Measurement discipline per docs/PERF.md: warmup executions burned per
program before timing, persistent compile cache, scalar materialization
as the sync boundary (block_until_ready does not wait through the axon
tunnel).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from scenes import heightfield_scene
from elevenrender_tpu.render import grad as g
from elevenrender_tpu.render.integrator import init_state


def main():
    res = int(os.environ.get("BENCH_RES", "1024"))
    grid = int(os.environ.get("BENCH_GRID", "182"))
    chunk = int(os.environ.get("BENCH_ACCUM_CHUNK", "8"))
    reps = int(os.environ.get("REPS", "3"))
    scene, config, ir = heightfield_scene(grid=grid, res=res, spp=64,
                                          compat=False)
    mf = os.environ.get("BENCH_MATFETCH")
    if mf:  # A/B knob: gather (default) vs onehot material fetch
        config = config.replace(material_fetch=mf)
    params = {"materials": g.float_subtree(ir["materials"])}
    merged = g._merge(ir, params)
    target = jnp.zeros((res * res, 3), jnp.float32)

    def sync(x):
        return float(jnp.sum(jax.tree.leaves(x)[0]))

    rows = []

    def cell(name, make_state, fn):
        # warmup: compile + 2 executions (first-kernel transient)
        for _ in range(2):
            st = make_state()
            sync(fn(st))
        best = None
        for _ in range(reps):
            st = make_state()
            t0 = time.time()
            sync(fn(st))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        rows.append((name, best / chunk * 1e3))
        print(f"{name:28s} {best/chunk*1e3:8.1f} ms/sample "
              f"({best:.2f} s/chunk of {chunk})", flush=True)

    cell("plain fwd (no record)",
         lambda: init_state(config),
         lambda st: g._accum_fwd_chunk(config, merged, st, chunk))

    cache_box = {}

    def record_fn(st):
        st2, cache = g._accum_fwd_chunk_record(config, merged, st, chunk)
        cache_box["c"] = cache
        return st2

    cell("record fwd (pass 1)",
         lambda: init_state(config), record_fn)

    seed = jnp.full((res * res, 3), 1e-6, jnp.float32)
    rng0 = init_state(config)["rng"]
    cell("replay VJP (pass 2)",
         lambda: rng0,
         lambda rng: g._accum_bwd_chunk(config, ir, params, seed, rng,
                                        chunk, cache_box["c"]))

    # Replay FORWARD only (no VJP): splits pass 2 into its fwd-recompute
    # and backward halves.
    from elevenrender_tpu.render.integrator import sample_radiance
    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def replay_fwd(config, merged, rng, caches):
        def body(i, carry):
            acc, rng = carry
            ci = jax.tree.map(lambda a: a[i], caches)
            out, rng = sample_radiance(config, merged, rng, res * res,
                                       trace_cache=ci)
            return acc + jnp.sum(out["light"]), rng
        return jax.lax.fori_loop(0, chunk, body, (jnp.zeros(()), rng))

    cell("replay fwd only",
         lambda: rng0,
         lambda rng: replay_fwd(config, merged, rng, cache_box["c"]))

    rec = dict(rows)
    print(f"\nrecord overhead: {rec['record fwd (pass 1)'] - rec['plain fwd (no record)']:.1f} "
          f"ms/sample; two-pass total: "
          f"{rec['record fwd (pass 1)'] + rec['replay VJP (pass 2)']:.1f} ms/sample")


if __name__ == "__main__":
    main()
