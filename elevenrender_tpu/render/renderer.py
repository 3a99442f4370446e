"""Render lifecycle: progressive loop, pass/progress readback, saving.

Equivalent of RenderingManager (/root/reference/src/Managers.h:41-67,
Managers.cpp:211-302): the reference launches a render thread that submits
one kernel per sample and reads passes/progress through a second SYCL
queue while rendering.  Here the accumulator state is a donated jit carry;
a background thread steps ``render_sample_jit`` and snapshots are taken
between steps — same progressive-readback semantics without data races
(JAX arrays are immutable; a snapshot is just a reference).
"""

from __future__ import annotations

import threading

import numpy as np

import jax

from ..utils.logging import get_logger
from . import denoise as denoise_mod
from .integrator import (BEAUTY, BITANGENT, DENOISE, NORMAL, PASSES_COUNT,
                         TANGENT, init_state, render_sample_jit)

log = get_logger()

_PASS_NAMES = {"beauty": BEAUTY, "denoise": DENOISE, "normal": NORMAL,
               "tangent": TANGENT, "bitangent": BITANGENT}


def parse_pass(name: str) -> int:
    """parsePass (kernel.cpp:50-73): case-insensitive, default beauty."""
    return _PASS_NAMES.get(name.lower(), BEAUTY)


class Renderer:
    """Progressive path tracer over a built scene IR."""

    def __init__(self, config, ir):
        self.config = config
        self.ir = jax.device_put(ir)
        self.state = init_state(config)
        self._snapshot = self.state
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()
        self._lock = threading.Lock()

    # -- stepping ---------------------------------------------------------
    def step(self, n: int = 1) -> None:
        """Run n progressive samples synchronously."""
        for _ in range(n):
            self.state = render_sample_jit(self.config, self.ir, self.state)
        with self._lock:
            self._snapshot = self.state

    def start(self, sample_target: int | None = None) -> None:
        """Asynchronous render (start_rendering, Managers.cpp:234-275)."""
        target = sample_target or self.config.sample_target
        self._stop.clear()

        def run():
            log.info("Rendering %dx%d at %d samples",
                     self.config.x_res, self.config.y_res, target)
            for s in range(target):
                if self._stop.is_set():
                    break
                self.state = render_sample_jit(self.config, self.ir, self.state)
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
            raw = np.asarray(snap["passes"][BEAUTY]).reshape(-1)
            guide = np.asarray(snap["passes"][NORMAL]).reshape(-1)
            return np.asarray(denoise_mod.denoise(w, h, raw, guide),
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

    def save_pass(self, name: str, path: str) -> None:
        """save_pass (CommandManager.cpp:403-422): gamma 1/2.2 -> PNG."""
        from ..utils.image import write_png
        data = self.get_pass(name).reshape(
            self.config.y_res, self.config.x_res, 4)
        img = np.clip(np.abs(data), 0.0, None) ** (1.0 / 2.2)
        write_png(path, np.clip(img, 0.0, 1.0))
        log.info("Saved %s", path)
