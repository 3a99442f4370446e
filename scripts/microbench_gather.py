"""Microbench: what a wavefront-scale gather costs on this chip.

The r5 step is built from ~10+ million-index gathers per bounce (sort
payloads, trace-result inverses, tri attributes, material rows, env
texels).  This measures XLA's lowering for the shapes the integrator
actually uses, against the HBM roofline, to decide whether a custom
gather path is worth building:

  A. row gather   src[idx]        src [1M, 8]  f32, idx [1M] random perm
  B. row gather   src[idx]        src [1M, 8]  f32, idx sorted (identity)
  C. row gather   src[idx]        src [66k, 40] f32, idx [1M] random
  D. scalar gather src[idx]       src [2M]     f32, idx [1M] random
  E. row gather   src[idx]        src [1M, 2]  f32 (trace-result inverse)
  F. wide gather  src[idx]        src [1M, 40] f32
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 1024 * 1024
REPS = int(os.environ.get("REPS", "5"))


@jax.jit
def g(src, idx):
    return src[idx]


def bench(name, src, idx, bytes_moved):
    for _ in range(3):
        float(jnp.sum(g(src, idx)))
    best = None
    for _ in range(REPS):
        t0 = time.time()
        float(jnp.sum(g(src, idx)))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    gbps = bytes_moved / best / 1e9
    print(f"{name:44s} {best*1e3:8.2f} ms  ({gbps:6.1f} GB/s effective)",
          flush=True)


def main():
    k = jax.random.PRNGKey(0)
    perm = jax.random.permutation(k, N).astype(jnp.int32)
    srt = jnp.arange(N, dtype=jnp.int32)
    r66 = jax.random.randint(k, (N,), 0, 66000, jnp.int32)
    r2m = jax.random.randint(k, (N,), 0, 2 * N, jnp.int32)

    bench("A [1M,8] random perm", jax.random.normal(k, (N, 8)), perm,
          N * 8 * 4)
    bench("B [1M,8] identity   ", jax.random.normal(k, (N, 8)), srt,
          N * 8 * 4)
    bench("C [66k,40] random   ", jax.random.normal(k, (66000, 40)), r66,
          N * 40 * 4)
    bench("D [2M] scalar random", jax.random.normal(k, (2 * N,)), r2m,
          N * 4)
    bench("E [1M,2] random perm", jax.random.normal(k, (N, 2)), perm,
          N * 2 * 4)
    bench("F [1M,40] random perm", jax.random.normal(k, (N, 40)), perm,
          N * 40 * 4)





def marginal():
    """Marginal (in-jit, launch-amortized) gather cost: a chain of R
    dependent gathers in ONE executable; (chain(R2) - chain(R1)) /
    (R2 - R1) isolates the per-gather cost from dispatch overhead."""
    import functools

    @functools.partial(jax.jit, static_argnums=2)
    def chain(src, idx, r):
        def body(i, acc):
            rows = src[(idx + acc.astype(jnp.int32)) % src.shape[0]]
            return acc + rows[:, 0] * 1e-20
        return jax.lax.fori_loop(0, r, body, jnp.zeros(idx.shape,
                                                       jnp.float32))

    k = jax.random.PRNGKey(0)
    perm = jax.random.permutation(k, N).astype(jnp.int32)
    for name, src in (("[1M,8]", jax.random.normal(k, (N, 8))),
                      ("[66k,40]", jax.random.normal(k, (66000, 40))),
                      ("[66k,64]", jax.random.normal(k, (66000, 64))),
                      ("[262k,4]", jax.random.normal(k, (262144, 4)))):
        idx = perm % src.shape[0]
        ts = {}
        for r in (4, 16):
            for _ in range(3):
                float(jnp.sum(chain(src, idx, r)))
            best = None
            for _ in range(REPS):
                t0 = time.time()
                float(jnp.sum(chain(src, idx, r)))
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            ts[r] = best
        per = (ts[16] - ts[4]) / 12 * 1e3
        print(f"marginal {name:10s} {per:7.2f} ms/gather "
              f"(chain4 {ts[4]*1e3:.1f} ms, chain16 {ts[16]*1e3:.1f} ms)",
              flush=True)




def fold():
    """Where is the table-row-count cliff, and does FOLDING a tall table
    into fewer, wider rows (gather idx>>k, select group idx&(2^k-1))
    beat the direct gather?"""
    import functools
    k = jax.random.PRNGKey(0)
    perm = jax.random.permutation(k, N).astype(jnp.int32)

    @jax.jit
    def direct(src, idx):
        return src[idx]

    @functools.partial(jax.jit, static_argnums=2)
    def folded(srcf, idx, kbits):
        g = srcf[idx >> kbits]                     # [N, (2^k)*C]
        C = srcf.shape[1] >> kbits
        grp = g.reshape(g.shape[0], 1 << kbits, C)
        sub = (idx & ((1 << kbits) - 1))
        return jnp.take_along_axis(
            grp, sub[:, None, None].astype(jnp.int32), axis=1)[:, 0]

    def t(fn, *a):
        for _ in range(3):
            float(jnp.sum(fn(*a)))
        best = None
        for _ in range(REPS):
            t0 = time.time()
            float(jnp.sum(fn(*a)))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best * 1e3

    for rows in (65536, 131072, 262144, 524288, 1048576):
        src = jax.random.normal(k, (rows, 8))
        idx = perm % rows
        print(f"direct [{rows//1024}k,8]   {t(direct, src, idx):7.2f} ms",
              flush=True)
    src = jax.random.normal(k, (N, 8))
    for kbits in (3, 4):
        srcf = src.reshape(N >> kbits, (1 << kbits) * 8)
        err = float(jnp.max(jnp.abs(folded(srcf, perm, kbits)
                                    - direct(src, perm))))
        print(f"folded [1M,8]->[{N>>kbits>>10}k,{(1<<kbits)*8}] "
              f"{t(folded, srcf, perm, kbits):7.2f} ms (err {err:.1e})",
              flush=True)


if __name__ == "__main__":
    import sys
    if "--marginal" in sys.argv:
        marginal()
    elif "--fold" in sys.argv:
        fold()
    else:
        main()
