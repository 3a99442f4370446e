"""BASELINE config 5, for real: ~1M tris, 1024x1024, 1000 spp
(VERDICT r3 ask #1 'Done' condition).

Drives the PRODUCTION surface (Renderer: async progressive loop with
auto-bounded samples-per-dispatch, periodic checkpoints, pass readback)
on the textured 1M-tri scene through the auto-selected pallas_stream
path.  Single chip here; the N>=2-host sharding axis of config 5 is
exercised separately (parallel/, scripts/multichip_bench.py) since this
environment exposes one TPU.

    SPP=1000 OUT=.runlogs/config5 python -u scripts/render_config5.py

Writes <OUT>_progress.log lines, <OUT>.npz checkpoints every CKPT
samples, and <OUT>_beauty.png at the end (or at whatever sample count
the process is stopped — the checkpoint makes it resumable, the PNG is
written from the latest snapshot on SIGTERM too).
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

from scenes import textured_heightfield_scene
from elevenrender_tpu.render.renderer import Renderer

GRID = int(os.environ.get("GRID", "708"))
RES = int(os.environ.get("RES", "1024"))
SPP = int(os.environ.get("SPP", "1000"))
CKPT = int(os.environ.get("CKPT", "64"))
OUT = os.environ.get("OUT", ".runlogs/config5")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


scene, config, ir = textured_heightfield_scene(grid=GRID, res=RES, spp=SPP,
                                               compat=False)
T = int(ir["tris"]["verts"].shape[0])
log(f"config5: {T} tris, {RES}x{RES}, target {SPP} spp")

r = Renderer(config, ir)


def finish(signum=None, frame=None):
    done = r.get_render_info()["samples"]
    r.stop()
    r.join()
    r.save_checkpoint(f"{OUT}.npz")
    r.save_pass("beauty", f"{OUT}_beauty.png")
    log(f"stopped at {done} samples; checkpoint + PNG written")
    sys.exit(0)


signal.signal(signal.SIGTERM, finish)

resume = f"{OUT}.npz"
if os.path.exists(resume) and os.environ.get("RESUME", "1") != "0":
    r.load_checkpoint(resume)
    log(f"resumed from {resume} at {r.get_render_info()['samples']} samples")

t0 = time.time()
last = r.get_render_info()["samples"]
start0 = last
r.start(SPP)
while True:
    time.sleep(30)
    done = r.get_render_info()["samples"]
    rate = (done - start0) / max(time.time() - t0, 1e-9)
    log(f"{done}/{SPP} samples ({rate*3600:.0f} spp/h, "
        f"{(done-last)/30.0:.3f} spp/s inst)")
    if done > last and done // CKPT != last // CKPT:
        r.save_checkpoint(f"{OUT}.npz")
    last = done
    if done >= SPP or (r._thread is not None and not r._thread.is_alive()
                       and done >= SPP):
        break
    if r._thread is not None and not r._thread.is_alive() and done < SPP:
        log("render thread exited early; restarting")
        r.start(SPP)

finish()
