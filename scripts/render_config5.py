"""BASELINE config 5, for real: ~1M tris, 1024x1024, 1000 spp
(VERDICT r3 ask #1 'Done' condition).

Drives the donating single-dispatch path (render_samples_jit, 1 sample
per dispatch — the hardware-validated shape for stream scale,
.runlogs/integrator_1m_n1.log and docs/PERF.md's dispatch-wall-time
envelope) over the textured 1M-tri scene through auto-selected
pallas_stream, with periodic checkpoints and a PNG at the end.  Single
chip here; the N>=2-host sharding axis of config 5 is exercised
separately (parallel/, scripts/multichip_bench.py) since this
environment exposes one TPU.

The scene/config are built EXACTLY as scripts/bench_config5.py builds
them (sample_target included — RenderConfig is a static jit arg), so
the compiled program comes straight from .jax_cache.

    SPP=1000 OUT=.runlogs/config5 python -u scripts/render_config5.py

Writes progress lines, <OUT>.npz checkpoints every CKPT samples, and
<OUT>_beauty.png at the end (also on SIGTERM — resumable via RESUME=1,
the default, when the checkpoint exists).
"""
import os
import signal
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

from scenes import textured_heightfield_scene
from elevenrender_tpu.render.integrator import init_state, render_samples_jit

GRID = int(os.environ.get("GRID", "708"))
RES = int(os.environ.get("RES", "1024"))
SPP = int(os.environ.get("SPP", "1000"))
CKPT = int(os.environ.get("CKPT", "64"))
OUT = os.environ.get("OUT", ".runlogs/config5")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


# Build exactly like bench_config5 (spp default 16) so the jitted
# program hash matches the already-cached executable.
scene, config, ir = textured_heightfield_scene(grid=GRID, res=RES,
                                               compat=False)
T = int(ir["tris"]["verts"].shape[0])
log(f"config5: {T} tris, {RES}x{RES}, target {SPP} spp")

state = init_state(config)
done = 0
if os.path.exists(f"{OUT}.npz") and os.environ.get("RESUME", "1") != "0":
    data = np.load(f"{OUT}.npz")
    state = {"passes": jnp.asarray(data["passes"]),
             "samples": jnp.asarray(data["samples"]),
             "rng": jnp.asarray(data["rng"])}
    done = int(data["samples"].max())
    log(f"resumed from {OUT}.npz at {done} samples")


def snapshot(state):
    return {k: np.asarray(v) for k, v in state.items()}


def write_out(snap, done):
    np.savez_compressed(f"{OUT}.npz", **snap)
    img = snap["passes"][0, :, :3].reshape(RES, RES, 3)
    from elevenrender_tpu.utils.image import write_png
    png = np.clip(np.abs(np.concatenate(
        [img, np.ones((RES, RES, 1), np.float32)], -1)), 0.0, None) \
        ** (1.0 / 2.2)
    write_png(f"{OUT}_beauty.png", np.clip(png, 0.0, 1.0))
    log(f"checkpoint + PNG written at {done} spp")


_last_snap = snapshot(state)
_last_done = done


def on_term(signum, frame):
    # _last_snap is the most recent CHECKPOINT's data — up to CKPT-1
    # samples behind `done`; label it with its own count.
    log(f"SIGTERM at {done} samples; flushing snapshot from {_last_done}")
    write_out(_last_snap, _last_done)
    sys.exit(0)


signal.signal(signal.SIGTERM, on_term)

t0 = time.time()
t_rep = t0
start0 = done
while done < SPP:
    state = render_samples_jit(config, ir, state, 1)
    done += 1
    if done % CKPT == 0 or done == SPP:
        _last_snap = snapshot(state)  # syncs the device
        _last_done = done
        write_out(_last_snap, done)
        rate = (done - start0) / (time.time() - t0)
        log(f"{done}/{SPP} samples ({rate*3600:.0f} spp/h, "
            f"ETA {((SPP-done)/max(rate,1e-9))/60:.0f} min)")
    else:
        # Dispatches are async and the axon tunnel STALLS under a deep
        # outstanding-dispatch queue (two 15-min hangs with ~64 queued
        # 1-sample dispatches, zero progress; known-good flows kept <=8
        # in flight).  Materialize one scalar per sample to keep the
        # queue depth at ~1; the sync costs microseconds next to a
        # 10 s dispatch.
        s = float(jnp.max(state["samples"]))
        if time.time() - t_rep > 120:
            rate = (done - start0) / (time.time() - t0)
            log(f"{s:.0f}/{SPP} samples ({rate*3600:.0f} spp/h)")
            t_rep = time.time()

log(f"DONE: {done} spp in {(time.time()-t0)/3600:.2f} h "
    f"({(time.time()-t0)/max(done-start0,1):.1f} s/sample)")
