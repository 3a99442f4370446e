"""Render lifecycle: progressive loop, pass/progress readback, saving.

Equivalent of RenderingManager (/root/reference/src/Managers.h:41-67,
Managers.cpp:211-302): the reference launches a render thread that submits
one kernel per sample and reads passes/progress through a second SYCL
queue while rendering.  Here a background thread steps a NON-donating jit
(``render_sample_jit_safe``) and snapshots are taken between steps — same
progressive-readback semantics without data races: JAX arrays are
immutable, a snapshot is just a reference, and because the step does not
donate, a snapshot handed to get_pass stays valid while the next sample
runs.
"""

from __future__ import annotations

import threading

import numpy as np

import jax

from ..utils.logging import get_logger
from . import denoise as denoise_mod
from .integrator import (BEAUTY, BITANGENT, DENOISE, NORMAL, PASSES_COUNT,
                         TANGENT, init_state, render_sample_jit_safe,
                         render_samples_jit_safe)

log = get_logger()

_PASS_NAMES = {"beauty": BEAUTY, "denoise": DENOISE, "normal": NORMAL,
               "tangent": TANGENT, "bitangent": BITANGENT}


def parse_pass(name: str) -> int:
    """parsePass (kernel.cpp:50-73): case-insensitive, default beauty."""
    return _PASS_NAMES.get(name.lower(), BEAUTY)


def find_device(name: str):
    """Device pick by name, the NameSelector analog (Managers.cpp:191-208:
    the reference matches "name|platform").  Accepts "kind:id|platform",
    "kind:id", bare platform ("tpu"), or "" -> default device."""
    devices = jax.devices()
    if not name:
        return devices[0]
    for d in devices:
        full = f"{d.device_kind}:{d.id}|{d.platform}"
        if name in (full, f"{d.device_kind}:{d.id}", d.platform, str(d.id)):
            return d
    log.warning("Device %r not found; using default", name)
    return devices[0]


class Renderer:
    """Progressive path tracer over a built scene IR."""

    def __init__(self, config, ir, device=None):
        self.config = config
        if device is None and config.device:
            device = find_device(config.device)
        self.ir = jax.device_put(ir, device)
        self.state = (init_state(config) if device is None
                      else jax.device_put(init_state(config), device))
        self._snapshot = self.state
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()
        self._lock = threading.Lock()

    # -- stepping ---------------------------------------------------------
    def step(self, n: int = 1) -> None:
        """Run n progressive samples synchronously."""
        for _ in range(n):
            self.state = render_sample_jit_safe(self.config, self.ir, self.state)
        with self._lock:
            self._snapshot = self.state

    def start(self, sample_target: int | None = None,
              samples_per_dispatch: int | None = None) -> None:
        """Asynchronous render (start_rendering, Managers.cpp:234-275).

        Steps ``samples_per_dispatch`` progressive samples per device
        dispatch (render_samples_jit_safe) to amortize launch overhead —
        the analog of enqueueing several sample kernels back-to-back
        (kernel.cpp:689-699) — while still snapshotting between chunks so
        get_pass stays progressive.  Defaults to ``config.block_size``:
        the reference's block_size sets its kernel dispatch granularity
        (work-group edge, kernel.cpp:659-660); ours sets the dispatch
        granularity on the progressive-sample axis."""
        target = sample_target or self.config.sample_target
        if samples_per_dispatch is None:
            from .integrator import recommended_samples_per_dispatch
            samples_per_dispatch = min(
                max(1, int(self.config.block_size)),
                recommended_samples_per_dispatch(self.config, self.ir))
        chunk = max(1, min(samples_per_dispatch, target))
        if self._thread is not None and self._thread.is_alive():
            # Restart while rendering: stop at the next chunk boundary,
            # then continue accumulating under the new target.
            self._stop.set()
            self._thread.join()
        self._stop.clear()

        def run():
            log.info("Rendering %dx%d at %d samples (%d per dispatch)",
                     self.config.x_res, self.config.y_res, target, chunk)
            done = 0
            while done < target and not self._stop.is_set():
                n = min(chunk, target - done)
                self.state = render_samples_jit_safe(
                    self.config, self.ir, self.state, n)
                # Sync before enqueueing the next chunk: dispatches are
                # async and an unbounded outstanding queue (a) stalls
                # the tunnel-attached TPU worker outright at production
                # scale and (b) makes every snapshot lag arbitrarily
                # behind real progress (docs/PERF.md).  Materializing
                # one element is the reliable barrier on the remote
                # backend (block_until_ready is not).
                np.asarray(self.state["samples"][:1])
                done += n
                with self._lock:
                    self._snapshot = self.state
            jax.block_until_ready(self.state["passes"])
            log.info("Render thread finished")

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()

    def join(self) -> None:
        if self._thread is not None:
            self._thread.join()

    # -- readback ---------------------------------------------------------
    def get_pass(self, name: str, apply_denoise: bool | None = None) -> np.ndarray:
        """Snapshot one pass as float4 [H*W*4] (get_pass,
        Managers.cpp:287-302 + CommandManager.cpp:250-280).

        Deviation from the reference: asking for the 'denoise' pass returns
        the denoised beauty (the reference returns its never-written zero
        buffer); the config.denoise flag still denoises any requested pass.
        """
        with self._lock:
            snap = self._snapshot
        pid = parse_pass(name)
        w, h = self.config.x_res, self.config.y_res
        if pid == DENOISE:
            # Normal + first-hit-albedo guided (the DENOISE slot carries
            # the albedo AOV — integrator.render_sample).
            raw = np.asarray(snap["passes"][BEAUTY]).reshape(-1)
            nrm = np.asarray(snap["passes"][NORMAL]).reshape(-1)
            alb = np.asarray(snap["passes"][DENOISE]).reshape(-1)
            return np.asarray(denoise_mod.denoise(w, h, raw, nrm, alb),
                              np.float32)
        raw = np.asarray(snap["passes"][pid], np.float32).reshape(-1)
        if apply_denoise is None:
            apply_denoise = self.config.denoise
        if apply_denoise:
            raw = np.asarray(denoise_mod.denoise(w, h, raw), np.float32)
            raw[3::4] = 1.0  # alpha := 1 patch (CommandManager.cpp:269-271)
        return raw

    def get_render_info(self) -> dict:
        """Progress as the first pixel's sample count — the intent of the
        broken get_render_info (Managers.cpp:211-232)."""
        with self._lock:
            snap = self._snapshot
        samples = int(np.asarray(snap["samples"][0]))
        if self.config.compat:
            samples -= 1  # setup initializes to 1
        return {"samples": samples}

    # -- checkpoint / resume ----------------------------------------------
    def save_checkpoint(self, path: str) -> None:
        """Serialize the progressive accumulation state (passes + per-pixel
        sample counts + RNG streams) so a render can resume exactly.

        The reference's accumulator is resumable only in device memory
        (SURVEY.md §5); this persists it: the carry IS the checkpoint.
        """
        with self._lock:
            snap = self._snapshot
        np.savez_compressed(
            path,
            passes=np.asarray(snap["passes"]),
            samples=np.asarray(snap["samples"]),
            rng=np.asarray(snap["rng"]),
            x_res=self.config.x_res, y_res=self.config.y_res)
        log.info("Checkpoint saved to %s", path)

    def load_checkpoint(self, path: str) -> None:
        import jax.numpy as jnp
        data = np.load(path)
        if (int(data["x_res"]) != self.config.x_res
                or int(data["y_res"]) != self.config.y_res):
            raise ValueError("checkpoint resolution mismatch")
        self.state = {
            "passes": jnp.asarray(data["passes"]),
            "samples": jnp.asarray(data["samples"]),
            "rng": jnp.asarray(data["rng"]),
        }
        with self._lock:
            self._snapshot = self.state
        log.info("Checkpoint loaded from %s", path)

    # -- profiling --------------------------------------------------------
    def profile(self, path: str, n_samples: int = 4) -> None:
        """Capture a jax.profiler trace of n progressive samples
        (viewable in TensorBoard / Perfetto)."""
        jax.block_until_ready(self.state["passes"])
        with jax.profiler.trace(path):
            self.step(n_samples)
            jax.block_until_ready(self.state["passes"])
        log.info("Profile written to %s", path)

    def save_pass(self, name: str, path: str) -> None:
        """save_pass (CommandManager.cpp:403-422): gamma 1/2.2 -> PNG."""
        from ..utils.image import write_png
        data = self.get_pass(name).reshape(
            self.config.y_res, self.config.x_res, 4)
        img = np.clip(np.abs(data), 0.0, None) ** (1.0 / 2.2)
        write_png(path, np.clip(img, 0.0, 1.0))
        log.info("Saved %s", path)
