"""Benchmark: rays/sec/chip on the BASELINE metric.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

HEADLINE metric (BASELINE.md:21 / BASELINE.json:2): rays/sec/chip
**forward+backward** at 1024x1024 — one differentiable render step
(render + MSE loss + material-parameter gradients, render/grad.py) per
sample.  A "ray" is one wavefront path or NEE shadow segment: the lockstep
integrator launches 2 * max_bounces rays per pixel per sample (masked
lanes still occupy the vector units); the same fixed work unit is used for
fwd-only so rounds stay comparable.  ``extra`` additionally reports:
  - fwd_rays_per_sec: forward-only progressive rendering (the serving
    path), stepped in 8-sample single-dispatch chunks
    (integrator.render_samples_jit) to amortize launch overhead;
  - alive_rays_per_sec: honest accounting — only lanes actually needing a
    trace result (path alive / shadow launched), measured by the
    integrator's count_rays instrumentation on the same scene.

Scene: a 65k-triangle heightfield + HDRI sky + glossy Disney terrain
(BASELINE config 5 shaped, VMEM-resident so the Pallas packet-traversal
kernel is exercised), rendered at 1024x1024 in native mode.

Timing note: on the tunneled TPU (axon), block_until_ready does NOT wait
for remote execution — every timing boundary materializes a scalar
reduction instead.

vs_baseline compares against our recorded number in BASELINE_SELF.json
(the reference publishes none, BASELINE.md); 1.0 on the recording run.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    res = int(os.environ.get("BENCH_RES", "1024"))
    spp = int(os.environ.get("BENCH_SPP", "64"))
    grid = int(os.environ.get("BENCH_GRID", "182"))  # ~65k tris

    import jax
    # Persistent compile cache: the integrator at 1024x1024/65k tris takes
    # ~2min to compile on the tunneled TPU; cached reruns skip it.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from scenes import heightfield_scene
    from elevenrender_tpu.render.grad import fwd_bwd_step, fwd_bwd_step_accum
    from elevenrender_tpu.render.integrator import (init_state,
                                                    render_samples_jit)

    scene, config, ir = heightfield_scene(grid=grid, res=res, spp=spp,
                                          compat=False)
    order = os.environ.get("BENCH_ORDER")
    if order:  # A/B knob: near (default) vs sign child ordering
        config = config.replace(trace_order=order)
    if os.environ.get("BENCH_DIRMAJOR"):  # A/B knob: octant-major sort
        config = config.replace(sort_dir_major=True)
    ssub = int(os.environ.get("BENCH_SHADOW_SUB", "0"))
    if ssub:  # A/B knob: narrow any-hit shadow tiles
        config = config.replace(shadow_pallas_sub=ssub)

    def sync(state):
        return float(jnp.sum(state["samples"]))

    rays_per_sample = 2.0 * config.max_bounces * res * res

    # ---- forward-only: chunked single-dispatch progressive sampling -----
    chunk = int(os.environ.get("BENCH_CHUNK", "8"))
    state = init_state(config)
    state = render_samples_jit(config, ir, state, chunk)
    sync(state)  # compile + first chunk fully materialized

    n_bench = min(max(spp - chunk, chunk),
                  int(os.environ.get("BENCH_STEPS", "16")))
    n_bench -= n_bench % chunk
    t0 = time.time()
    for _ in range(n_bench // chunk):
        state = render_samples_jit(config, ir, state, chunk)
    sync(state)
    dt_fwd = time.time() - t0
    fwd_rays_per_sec = rays_per_sample * n_bench / dt_fwd
    # Stage results to stderr as they land (stdout stays the one-line
    # JSON contract): a crash in a later stage must not lose these.
    print(f"[stage] fwd {fwd_rays_per_sec:.0f} rays/s "
          f"({dt_fwd/n_bench*1e3:.0f} ms/sample)", file=sys.stderr)

    # ---- alive-ray accounting (instrumented, not timed) ------------------
    cfg_count = config.replace(count_rays=True)
    st = init_state(cfg_count)
    st = render_samples_jit(cfg_count, ir, st, 2)
    alive_per_sample = float(st["ray_count"]) / 2.0
    alive_rays_per_sec = alive_per_sample * n_bench / dt_fwd

    # ---- fwd+bwd: the BASELINE headline AT ITS OWN SHAPE ------------------
    # One differentiable render at the metric's full spp (BASELINE.md:21:
    # 1024x1024, 64 spp) via the flat-memory two-pass accumulator
    # (render/grad.py:render_loss_and_grad_accum) — direct AD through a
    # 64-sample loop would store 64 wavefronts of residuals.
    target = jnp.zeros((res * res, 3), jnp.float32)
    grad_spp = int(os.environ.get("BENCH_GRAD_SPP", str(spp)))
    accum_chunk = int(os.environ.get("BENCH_ACCUM_CHUNK", "8"))
    loss, grads = fwd_bwd_step_accum(config, ir, target, grad_spp,
                                     chunk=accum_chunk)
    float(loss)  # compile + materialize
    float(jnp.sum(grads["materials"]["albedo"]))
    t0 = time.time()
    loss, grads = fwd_bwd_step_accum(config, ir, target, grad_spp,
                                     chunk=accum_chunk)
    float(loss)
    float(jnp.sum(grads["materials"]["albedo"]))
    dt_bwd = time.time() - t0
    fwdbwd_rays_per_sec = rays_per_sample * grad_spp / dt_bwd
    print(f"[stage] fwd+bwd {grad_spp}spp {fwdbwd_rays_per_sec:.0f} rays/s",
          file=sys.stderr)

    # Legacy 1-spp direct-AD step (round-2 comparability).
    loss, grads = fwd_bwd_step(config, ir, target, 1)
    float(loss)
    n_grad = int(os.environ.get("BENCH_GRAD_STEPS", "4"))
    t0 = time.time()
    for _ in range(n_grad):
        loss, grads = fwd_bwd_step(config, ir, target, 1)
    float(loss)
    float(jnp.sum(grads["materials"]["albedo"]))
    fwdbwd_1spp = rays_per_sample * n_grad / (time.time() - t0)

    # ---- config-5-shaped hard stage (VERDICT r3 ask #3) ------------------
    # Textured ~1M-tri stream-residency scene, run in a SUBPROCESS so a
    # worker fault in the hard stage cannot lose the headline numbers
    # (scripts/bench_config5.py prints one JSON line).
    config5 = {}
    if os.environ.get("BENCH_CONFIG5", "1") != "0":
        import subprocess
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "scripts", "bench_config5.py")],
                capture_output=True, text=True, timeout=3600)
            sys.stderr.write(proc.stderr)
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() \
                else ""
            if proc.returncode == 0 and line.startswith("{"):
                config5 = json.loads(line)
            else:
                config5 = {"config5_error":
                           f"exit {proc.returncode}: {line[:200]}"}
        except Exception as e:  # timeout / crash — report, don't die
            config5 = {"config5_error": repr(e)[:200]}
        print(f"[stage] config5 {config5}", file=sys.stderr)

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_SELF.json")
    vs = 1.0
    if os.path.exists(base_path):
        with open(base_path) as f:
            recorded = json.load(f)
        base = recorded.get("fwd_bwd_rays_per_sec")
        if base:
            vs = fwdbwd_rays_per_sec / base

    print(json.dumps({
        "metric": f"rays/sec/chip fwd+bwd, {(grid-1)*(grid-1)*2//1000}k tris "
                  f"at {res}x{res}, {grad_spp} spp accumulated",
        "value": round(fwdbwd_rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 4),
        "extra": {
            "fwd_rays_per_sec": round(fwd_rays_per_sec, 1),
            "fwd_bwd_1spp_rays_per_sec": round(fwdbwd_1spp, 1),
            "alive_rays_per_sec": round(alive_rays_per_sec, 1),
            "alive_fraction": round(alive_per_sample / rays_per_sample, 4),
            "fwd_samples_per_dispatch": chunk,
            **config5,
        },
    }))


if __name__ == "__main__":
    main()
