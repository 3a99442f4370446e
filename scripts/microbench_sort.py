"""Micro-bench the primitives behind the per-bounce sort (PERF.md 'next
levers' #1): is a counting/radix sort worth building, or does the
scatter it needs cost as much as the argsort it would replace?

Cells (1M elements, REPS each, after a 30 s burn-in):
  argsort32      jnp.argsort of 1M uint32 keys (the current cost, x5/step)
  argsort_apply  argsort + one 3-vector gather (what sort_for_packets pays)
  scatter_perm   out.at[pos].set(iota) with a known permutation — the
                 apply step any counting sort needs
  hist_matmul    256-bucket histogram via one-hot matmul + cumsum — the
                 counting side
  cumsum_8k      per-chunk one-hot prefix ranks (8k x 256) x 128 chunks

Run: python -u scripts/microbench_sort.py | tee .runlogs/microbench_sort.log
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

N = int(os.environ.get("N", str(1 << 20)))
REPS = int(os.environ.get("REPS", "5"))
key = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, 1 << 30,
                         dtype=jnp.int32).astype(jnp.uint32)
vec = jax.random.normal(jax.random.PRNGKey(1), (N, 3), jnp.float32)
perm = jax.random.permutation(jax.random.PRNGKey(2), N)
iota = jnp.arange(N, dtype=jnp.int32)


@jax.jit
def argsort32(k):
    return jnp.argsort(k)


@jax.jit
def argsort_apply(k, v):
    o = jnp.argsort(k)
    return v[o], o


@jax.jit
def scatter_perm(pos):
    return jnp.zeros((N,), jnp.int32).at[pos].set(iota, unique_indices=True)


@jax.jit
def hist_matmul(k):
    kb = (k >> 22).astype(jnp.int32)  # 256 buckets
    chunks = kb.reshape(64, -1)
    oh = (chunks[:, :, None] == jnp.arange(256)[None, None, :]
          ).astype(jnp.bfloat16)
    h = jnp.sum(oh, axis=(0, 1)).astype(jnp.int32)
    return jnp.cumsum(h)


@jax.jit
def cumsum_ranks(k):
    kb = (k >> 22).astype(jnp.int32).reshape(128, -1)       # [128, 8192]
    oh = (kb[:, :, None] == jnp.arange(256)[None, None, :]
          ).astype(jnp.float32)                              # [128,8k,256]
    pref = jnp.cumsum(oh, axis=1)
    return jnp.take_along_axis(
        pref, kb[:, :, None].astype(jnp.int32), axis=2)[..., 0]


def bench(label, fn, *args):
    out = fn(*args)
    jax.tree.map(lambda x: float(jnp.sum(x.ravel()[:4].astype(jnp.float32))),
                 out if isinstance(out, tuple) else (out,))
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.tree.map(lambda x: float(jnp.sum(x.ravel()[:4].astype(jnp.float32))),
                 out if isinstance(out, tuple) else (out,))
    dt = (time.time() - t0) / REPS * 1e3
    print(f"{label:16s} {dt:8.2f} ms", flush=True)


deadline = time.time() + 30.0
while time.time() < deadline:
    o = argsort32(key)
    float(jnp.sum(o[:4].astype(jnp.float32)))

bench("argsort32", argsort32, key)
bench("argsort_apply", argsort_apply, key, vec)
bench("scatter_perm", scatter_perm, perm)
bench("hist_matmul", hist_matmul, key)
bench("cumsum_ranks", cumsum_ranks, key)
