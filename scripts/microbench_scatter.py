"""Microbench: backward of a [M, K] table gather at wavefront scale.

The material fetch is ``row = table[m]`` with m [N] (N ~ 1M pixels,
M ~ a handful of materials).  Reverse mode turns that gather into a
scatter-add of [N, K] cotangents into [M, K] — a maximally-colliding
scatter.  Candidate replacement: one-hot matmul reduce
(onehot[N, M].T @ ct, precision=HIGHEST) which rides the MXU.

Times, per call at N=1M / K=19, for several M:
  - XLA scatter-add     (the autodiff default)
  - one-hot matmul      (dot_general over the N axis)
  - M masked reductions (where + sum per material row)
"""
from __future__ import annotations

import os
import sys
import time

import functools

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = int(os.environ.get("N", str(1024 * 1024)))
K = int(os.environ.get("K", "19"))
REPS = int(os.environ.get("REPS", "5"))


@functools.partial(jax.jit, static_argnums=2)
def scatter_add(m, ct, M):
    return jnp.zeros((M, K), jnp.float32).at[m].add(ct)


@functools.partial(jax.jit, static_argnums=2)
def onehot_mm(m, ct, M):
    oh = (m[:, None] == jnp.arange(M, dtype=jnp.int32)[None, :]
          ).astype(jnp.float32)
    return jax.lax.dot_general(oh, ct, (((0,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnums=2)
def masked_sums(m, ct, M):
    rows = [jnp.sum(jnp.where((m == j)[:, None], ct, 0.0), axis=0)
            for j in range(M)]
    return jnp.stack(rows)


def bench(fn, *args):
    for _ in range(3):
        float(jnp.sum(fn(*args)))
    best = None
    for _ in range(REPS):
        t0 = time.time()
        float(jnp.sum(fn(*args)))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best * 1e3


def main():
    key = jax.random.PRNGKey(0)
    ct = jax.random.normal(key, (N, K), jnp.float32)
    for M in (2, 8, 32):
        m = jax.random.randint(jax.random.PRNGKey(M), (N,), 0, M,
                               jnp.int32)
        a = bench(scatter_add, m, ct, M)
        b = bench(onehot_mm, m, ct, M)
        c = bench(masked_sums, m, ct, M)
        ref = scatter_add(m, ct, M)
        err_b = float(jnp.max(jnp.abs(onehot_mm(m, ct, M) - ref)))
        err_c = float(jnp.max(jnp.abs(masked_sums(m, ct, M) - ref)))
        print(f"M={M:3d}  scatter {a:7.2f} ms   onehot-mm {b:7.2f} ms "
              f"(err {err_b:.2e})   masked-sum {c:7.2f} ms (err {err_c:.2e})",
              flush=True)


if __name__ == "__main__":
    main()
