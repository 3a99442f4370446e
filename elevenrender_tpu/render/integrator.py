"""The path-tracing integrator: one progressive sample over all pixels.

TPU-native replacement for the SYCL megakernel
(/root/reference/src/kernel.cpp:477-646 renderingKernel).  Instead of one
thread per pixel with divergent control flow, the whole image is a flat
wavefront of rays advanced in lockstep; every branch of the reference
becomes a lane mask, so the program is pure vector arithmetic + gathers
that XLA fuses and schedules on the VPU, with the BVH walk as the only
while_loop.

Parity notes (compat=True replicates the reference's quirks structurally
— draw order, gating, estimator shape — as verified against this repo's
scalar oracle port of kernel.cpp, tests/oracle.py; the SYCL binary has
never produced pixels to compare against, and texture paths CANNOT be
bit-equal anyway: the reference's fast_pow gamma is broken and returns 0
for every input, see scene/texture.py:apply_gamma — so "compat" means
faithful-to-intent with documented bounds, not bit-identical):
- RNG draw order per pixel/sample: 5 camera draws, then per bounce
  1 opacity draw + (3+1) sampling draws only on the shaded path
  (kernel.cpp:492-545; C++ arg evaluation assumed left-to-right).
- env is added unweighted both via NEE and on BRDF-ray miss — the
  reference computes MIS weights but never applies them
  (kernel.cpp:569-575); compat keeps that, native applies balance
  heuristic MIS and adds point-light NEE (the reference's pointLight()
  is dead code, kernel.cpp:269-301).
- roughness/metallic are raised to 2.2 after fetch (kernel.cpp:151-153).
- progressive average starts at sample count 1 (setupKernel,
  kernel.cpp:202), so compat images converge to sum/(N+1); native starts
  at 0.
- NaN samples are discarded entirely (kernel.cpp:600) but still advance
  the RNG (kernel.cpp:645).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import rng as rng_mod
from ..core.vecmath import dot, normalize, where3
from ..ops import bvh as bvh_ops
from ..ops import hdri as hdri_ops
from ..ops.disney import disney_eval, disney_pdf, disney_sample
from ..ops.intersect import full_hit, gather_tri
from ..ops.texture import (reverse_spherical_mapping, sample_filtered,
                           sample_nearest, spherical_mapping)
from . import shaders as shader_registry

# Pass indices (kernel.h:8).
BEAUTY, DENOISE, NORMAL, TANGENT, BITANGENT = range(5)
PASSES_COUNT = 5


def init_state(config) -> dict:
    """Fresh accumulation state (setupKernel, kernel.cpp:176-213)."""
    npix = config.x_res * config.y_res
    passes = jnp.zeros((PASSES_COUNT, npix, 4), jnp.float32)
    passes = passes.at[:, :, 3].set(1.0)
    samples0 = 1 if config.compat else 0
    state = {
        "passes": passes,
        "samples": jnp.full((npix,), samples0, jnp.uint32),
        "rng": rng_mod.init_state(jnp.arange(npix, dtype=jnp.uint32)),
    }
    if config.count_rays:
        state["ray_count"] = jnp.zeros((), jnp.float64 if jax.config.x64_enabled
                                       else jnp.float32)
    return state


def _resolve_trace_mode(config, ir) -> str:
    """Static trace-path selection: tiny scenes brute-force (vectorized
    intersect-all beats any traversal overhead), everything else packet
    traversal — per-ray stack walks gather per lane, which TPUs execute
    near-serially."""
    tris = ir["tris"]["verts"]
    mode = config.trace_mode
    if not config.use_bvh:
        mode = "brute"
    if mode == "auto":
        if tris.shape[0] <= 64:
            mode = "brute"
        elif jax.default_backend() == "cpu":
            mode = "per_ray"  # CPU gathers are fine; Pallas would interpret
        elif tris.shape[0] <= 120_000 and config.bvh_depth <= 15:
            # VMEM-resident limit: ~8MB tris AND a 2^(depth+8)-byte node
            # table (depth 15 = 8MB; an explicit deeper depth must fall
            # through to the packet warning below, ADVICE r3).
            mode = "pallas"
        elif config.bvh_depth <= 15:
            # HBM-streaming kernel, ANY triangle count (the node/leaf
            # tables stay VMEM: 2^(depth+8) bytes, 8MB at depth 15 —
            # matches the reference's arbitrary-T device traversal,
            # BVH.cpp:63-120).  r3's auto mode clamped this to 360k
            # because the full composition crashed the worker at 1M;
            # r4 root-caused that to single-dispatch WALL TIME (the
            # tunnel worker dies somewhere between 46 s and 140 s per
            # dispatch — scripts/multilaunch.py ladder, docs/PERF.md),
            # not to the kernel or the integrator: the fix is bounding
            # samples per dispatch (recommended_samples_per_dispatch),
            # which every driver now applies.
            mode = "pallas_stream"  # tris DMA-streamed from HBM
        else:
            # Only reachable with an EXPLICIT bvh_depth > 15 (auto depth
            # clamps at STREAM_MAX_DEPTH, ops/bvh.default_depth); the
            # jnp packet path is ~10x the Pallas kernel — say so.
            from ..utils.logging import get_logger
            get_logger().warning(
                "bvh_depth=%d exceeds the Pallas VMEM ceiling (15): "
                "falling back to the slow jnp packet traversal; rebuild "
                "with depth<=15 (auto) for the fast path",
                config.bvh_depth)
            mode = "packet"
    if mode in ("pallas_wide", "pallas_wide_stream"):
        # The 8-wide collapse left the supported matrix in r4: it lost
        # the full 1M-tri integrator step 11.4 s vs 7.9 s against the
        # binary kernel (docs/PERF.md "8-wide fate"); the kernel lives
        # on in experiments/bvh_wide.py for measurement scripts.
        from ..utils.logging import get_logger
        get_logger().warning(
            "trace_mode=%r moved to experiments/ (r4, docs/PERF.md); "
            "using the binary kernel", mode)
        mode = "pallas" if mode == "pallas_wide" else "pallas_stream"
    return mode


def recommended_samples_per_dispatch(config, ir, default: int = 8) -> int:
    """Samples per jitted dispatch, bounded so one dispatch's WALL TIME
    stays inside the execution envelope the hardware path tolerates.

    The axon-tunneled v5e worker dies when a single dispatch runs
    somewhere past ~1-2 minutes (r4 scripts/multilaunch.py: the same
    cached 1M-tri stream program survives 46 s and dies at ~140 s; r3's
    monolithic 64-spp gradient executable, ~300 s, and its 8-sample
    1M-tri chunk, ~150-250 s, both died the same way — docs/PERF.md).
    A 1M-tri stream-mode sample step is ~15-25 s, so at stream scale one
    sample per dispatch keeps a comfortable margin; the 66k VMEM-mode
    step is ~2.3 s, so the default 8 stays.  This is a perf/stability
    knob only — results are identical at any chunking.

    Overrides (VERDICT r4 weak #6 — the ~60 s watchdog is a property of
    THIS tunnel, not of TPUs): config.samples_per_dispatch > 0 wins over
    the auto heuristic, and the ELEVENRT_SAMPLES_PER_DISPATCH env var
    wins over both — so a non-tunneled server can batch dispatches
    without code changes.
    """
    import os
    env = os.environ.get("ELEVENRT_SAMPLES_PER_DISPATCH")
    if env:
        try:
            return max(int(env), 1)
        except ValueError:
            from ..utils.logging import get_logger
            get_logger().warning(
                "ELEVENRT_SAMPLES_PER_DISPATCH=%r is not an integer; "
                "ignoring the override", env)
    if getattr(config, "samples_per_dispatch", 0) > 0:
        return config.samples_per_dispatch
    tris = ir["tris"]["verts"].shape[0]
    mode = _resolve_trace_mode(config, ir)
    if mode in ("pallas_stream", "packet") and tris > 360_000:
        return 1
    if mode in ("pallas_stream", "packet") and tris > 120_000:
        return min(default, 4)
    return default


def _uses_sort(config, ir) -> bool:
    """True when the selected trace path reorders rays for packet
    coherence — the integrator then carries ONE permutation per bounce
    (computed at the hit points) shared by the shadow launch and the next
    bounce's path trace, instead of sorting inside every trace."""
    return (config.sort_rays
            and _resolve_trace_mode(config, ir) in ("pallas", "pallas_stream", "packet"))


def _trace(config, ir, ray_o, ray_d, mask=None, perm=None,
           exclude=None, t_max=None, sort=True):
    """Nearest-hit query (throwRay, kernel.cpp:218-240).

    ``sort=False`` skips the packing permutation entirely for rays the
    caller KNOWS are already coherent (the peeled bounce-0 camera rays,
    which are pixel-ordered): applying the identity permutation is not
    free — a gather at iota indices costs the same per-index price as a
    random one (scripts/microbench_gather.py) — so bounce 0 was paying
    two full wavefront gathers to reorder nothing.

    Mode selection is static (baked into the jitted program) — see
    _resolve_trace_mode.

    ``mask``: lanes that need a result.  Dead lanes are replaced with a
    ray that misses the root AABB on step one and (when sorting) packed
    into the tail tiles, so they cost ~nothing; their (idx, t) come back
    as (-1, inf), which every caller already masks out.

    ``perm``: optional precomputed (order, inverse) permutation pair; the
    trace then skips its own Morton sort and packs rays with the given
    ordering.  The integrator exploits that bounce and shadow rays
    originate at the SAME hit points: one sort per bounce serves both
    (VERDICT r2: the per-trace sorts were 22% of the step).

    ``exclude`` [N] i32 + ``t_max`` [N] f32: OCCLUSION query (native
    shadow rays) — returns idx >= 0 iff some tri other than
    exclude[lane] is hit closer than t_max[lane]; t is not a distance.
    On the Pallas paths this is the kernel's any-hit mode (lanes go
    inert on first hit, fully-occluded tiles stop walking); other modes
    emulate with nearest + filter, which can miss an occluder hiding
    behind an excluded nearest hit — exactly the reference's own
    nearest-based self-hit semantics (kernel.cpp:556).
    """
    tris = ir["tris"]["verts"]
    mode = _resolve_trace_mode(config, ir)
    occl = exclude is not None

    def emulate(idx, t):
        """Nearest-based occlusion emulation for non-any-hit paths."""
        if not occl:
            return idx, t
        good = (idx >= 0) & (idx != exclude) & (t < t_max)
        return jnp.where(good, idx, -1), t

    if mode == "brute":
        idx, t = bvh_ops.brute_force(tris, ray_o, ray_d)
        if mask is not None:
            idx = jnp.where(mask, idx, -1)
            t = jnp.where(mask, t, jnp.inf)
        return emulate(idx, t)

    if mask is not None:
        # Instant-miss substitute: origin far above the root AABB looking
        # away, so the root slab test fails and the lane idles (or, in a
        # fully-dead sorted tile, the whole tile terminates at the root).
        far = ir["bvh"]["node_bmax"][0] + 1e7
        ray_o = where3(mask, ray_o, far)
        ray_d = where3(mask, ray_d,
                       jnp.asarray([0.0, 0.0, 1.0], ray_d.dtype))

    if mode in ("pallas", "pallas_stream", "packet") and config.sort_rays \
            and sort:
        # Packet coherence: tiles must be spatially compact (ops/sort.py).
        if perm is not None:
            order, inverse = perm
        else:
            from ..ops.sort import sort_for_packets
            order, inverse = sort_for_packets(
                ray_o, ray_d, ir["bvh"]["node_bmin"][0],
                ir["bvh"]["node_bmax"][0], mask=mask,
                dir_major=config.sort_dir_major, impl=config.sort_impl,
                dir_bits=config.sort_dir_bits)
        # Only the Pallas any-hit kernels consume per-lane exclude/t_max
        # in SORTED order; packet/per_ray emulate occlusion after the
        # inverse, against the original-order arrays.
        sort_occl = occl and mode in ("pallas", "pallas_stream")
        # Tri ids must survive the float row exactly: VALUE conversion
        # (not bitcast — measured: XLA routes the rows through float
        # paths that FLUSH subnormal payloads to 0 and canonicalize the
        # NaN that -1 bitcasts to).  int32 -> float32 is exact below
        # 2^24; scenes at/past 16.7M tris fall back to narrow gathers.
        packed_io = (config.packed_sort_io
                     and tris.shape[0] < (1 << 24))
        if packed_io:
            # ONE wide-row gather for every per-lane payload instead of
            # 2-4 narrow ones: TPU gather cost is per-INDEX (near-serial
            # lanes), so o+d(+exclude+t_max) ride one [N, 6|8] row.
            cols = [ray_o, ray_d]
            if sort_occl:
                cols += [exclude.astype(jnp.float32)[:, None],
                         t_max[:, None]]
            packed = jnp.concatenate(cols, axis=1)[order]
            ray_o = packed[:, 0:3]
            ray_d = packed[:, 3:6]
            if sort_occl:
                exclude = packed[:, 6].astype(jnp.int32)
                t_max = packed[:, 7]
        else:
            ray_o = ray_o[order]
            ray_d = ray_d[order]
            if sort_occl:
                exclude = exclude[order]
                t_max = t_max[order]
    else:
        order = inverse = None
        packed_io = False

    if mode in ("pallas", "pallas_stream"):
        from ..ops.bvh_pallas import traverse_pallas
        bp = ir["bvh_packed"]
        sub = config.pallas_sub
        if occl and config.shadow_pallas_sub:
            sub = config.shadow_pallas_sub
        idx, t = traverse_pallas(bp["nodes"], bp["leaf"], bp["tris9"],
                                 ray_o, ray_d, depth=config.bvh_depth,
                                 max_leaf=config.bvh_max_leaf,
                                 interpret=jax.default_backend() == "cpu",
                                 stream=mode == "pallas_stream",
                                 sub=sub,
                                 order=config.trace_order,
                                 leaf_aabb=config.leaf_aabb,
                                 exclude=exclude, t_max=t_max)
        if inverse is not None:
            if packed_io:
                # The two result arrays ride one inverse-gather too
                # (value conversion — see packed_io above).
                res = jnp.stack([idx.astype(jnp.float32), t],
                                axis=1)[inverse]
                idx = res[:, 0].astype(jnp.int32)
                t = res[:, 1]
            else:
                idx = idx[inverse]
                t = t[inverse]
        return idx, t
    elif mode == "packet":
        idx, t = bvh_ops.traverse_packet(ir["bvh"], tris, ray_o, ray_d,
                                         depth=config.bvh_depth,
                                         max_leaf=config.bvh_max_leaf,
                                         tile=config.packet_tile)
    else:
        idx, t = bvh_ops.traverse(ir["bvh"], tris, ray_o, ray_d,
                                  depth=config.bvh_depth,
                                  max_leaf=config.bvh_max_leaf)
        return emulate(idx, t)
    if inverse is not None:
        if packed_io:
            res = jnp.stack([idx.astype(jnp.float32), t],
                            axis=1)[inverse]
            idx = res[:, 0].astype(jnp.int32)
            t = res[:, 1]
        else:
            idx = idx[inverse]
            t = t[inverse]
    return emulate(idx, t)


@jax.custom_vjp
def _gather_rows_mm_bwd(table, m):
    """``table[m]`` whose backward is a one-hot matmul reduce instead of
    the scatter-add autodiff would emit.

    The cotangent of a [npix]-indexed gather into a tiny [M, K] table is
    a maximally-colliding scatter-add — 38 ms per bounce per VJP at 1M
    lanes (scripts/microbench_scatter.py).  The matmul form
    (onehot[npix, M].T @ ct at Precision.HIGHEST) rides the MXU's
    reduction tree instead: same result up to f32 summation order,
    ~25% faster per backward.  Forward values are bit-identical to the
    gather (it IS the gather)."""
    return table[m]


def _gather_rows_fwd(table, m):
    return table[m], (m, table.shape[0])


def _gather_rows_bwd(res, ct):
    m, M = res
    oh = (m[..., None] == jnp.arange(M, dtype=m.dtype)).astype(ct.dtype)
    dt = jax.lax.dot_general(oh, ct, (((0,), (0,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST)
    return dt, None


_gather_rows_mm_bwd.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def _generate_hitdata(config, ir, hit, ray_d):
    """generateHitData (kernel.cpp:76-172): texture-or-constant fetch per
    channel, tangent-space normal mapping, the ^2.2 quirk.

    Map slots no material binds are STATICALLY skipped
    (config.tex_slots_used, computed at scene build), so an untextured
    scene compiles to zero atlas gathers; a uniform-filter atlas
    (config.tex_uniform_filter) compiles sample_filtered down to one
    sampler.  The reference branches per pixel instead
    (kernel.cpp:88-133)."""
    mats = ir["materials"]
    atlas = ir["atlas"]
    m = hit["mat"]
    tex = mats["tex"][m]  # [..., 7] slot order: see MAP_SLOT_ORDER
    tu, tv = hit["tu"], hit["tv"]
    used = config.tex_slots_used

    # ONE packed [M, 19] gather for every float material parameter
    # instead of ~20 per-field gathers: the forward difference is noise,
    # but in reverse mode each gather's backward is a 1M-lane scatter-add
    # into the tiny table — per bounce, per VJP.  Collapsing them to one
    # scatter cut the gradient accumulator's replay pass measurably
    # (docs/PERF.md r5).  The concat is over [M, *] leaves (tiny), so
    # parameter gradients still arrive on the NAMED leaves.
    _scalar_fields = ("roughness", "metallic", "opacity", "transmission",
                      "clearcoat", "anisotropic", "eta", "specular",
                      "subsurface", "sheen", "clearcoat_gloss",
                      "specular_tint", "sheen_tint")
    table = jnp.concatenate(
        [mats["albedo"], mats["emission"]]
        + [mats[s][:, None] for s in _scalar_fields], axis=1)
    if config.material_fetch == "mm_bwd" and table.shape[0] <= 64:
        # Gather forward, matmul backward (see RenderConfig
        # .material_fetch): the forward stays the cheap row gather; the
        # custom VJP replaces reverse mode's maximally-colliding
        # [npix] -> [M] scatter-add with a one-hot matmul reduce.
        row = _gather_rows_mm_bwd(table, m)
    elif config.material_fetch == "onehot" and table.shape[0] <= 64:
        # One-hot matmul BOTH ways — measured a wash end-to-end (the
        # matmul forward gives back what the matmul backward saves,
        # .runlogs/profile_grad_r05.log); kept as the measurement knob.
        oh = (m[..., None] == jnp.arange(table.shape[0], dtype=m.dtype)
              ).astype(jnp.float32)
        row = jax.lax.dot_general(
            oh, table, (((oh.ndim - 1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
    else:
        row = table[m]  # [..., 19] — the one gather
    base_albedo = row[..., 0:3]
    base_emission = row[..., 3:6]
    base_scalar = {s: row[..., 6 + i]
                   for i, s in enumerate(_scalar_fields)}

    def tex_rgb(slot, fallback_rgb):
        if not used[slot]:
            return fallback_rgb
        tid = tex[..., slot]
        val = sample_filtered(atlas, jnp.maximum(tid, 0), tu, tv,
                              uniform_filter=config.tex_uniform_filter)
        return where3(tid >= 0, val, fallback_rgb)

    def tex_x(slot, fallback):
        if not used[slot]:
            return fallback
        tid = tex[..., slot]
        val = sample_filtered(atlas, jnp.maximum(tid, 0), tu, tv,
                              uniform_filter=config.tex_uniform_filter)[..., 0]
        return jnp.where(tid >= 0, val, fallback)

    hd = {}
    hd["albedo"] = tex_rgb(0, base_albedo)
    hd["emission"] = tex_rgb(1, base_emission)
    hd["roughness"] = tex_x(2, base_scalar["roughness"])
    hd["metallic"] = tex_x(3, base_scalar["metallic"])
    hd["opacity"] = tex_x(5, base_scalar["opacity"])
    hd["transmission"] = tex_x(6, base_scalar["transmission"])

    # Normal mapping (kernel.cpp:135-149): nearest fetch, y flipped.
    if used[4]:
        ntid = tex[..., 4]
        ncolor = sample_nearest(atlas, jnp.maximum(ntid, 0), tu, tv)
        local_n = ncolor * 2.0 - 1.0
        world_n = normalize(local_n[..., 0:1] * hit["tangent"]
                            - local_n[..., 1:2] * hit["bitangent"]
                            + local_n[..., 2:3] * hit["normal"])
        hd["normal"] = where3(ntid >= 0, world_n, hit["normal"])
    else:
        hd["normal"] = hit["normal"]

    # Reference gamma quirk (kernel.cpp:151-153).
    hd["roughness"] = jnp.power(hd["roughness"], 2.2)
    hd["metallic"] = jnp.power(hd["metallic"], 2.2)

    for k in ("clearcoat", "anisotropic", "eta", "specular",
              "subsurface", "sheen"):
        hd[k] = base_scalar[k]
    hd["clearcoatGloss"] = base_scalar["clearcoat_gloss"]
    hd["specularTint"] = base_scalar["specular_tint"]
    hd["sheenTint"] = base_scalar["sheen_tint"]

    hd["gnormal"] = hit["gnormal"]
    hd["tangent"] = hit["tangent"]
    hd["bitangent"] = hit["bitangent"]
    hd["position"] = hit["position"]

    # ASL-analog programmable albedo (kernel.cpp:530-536); statically
    # elided when no material carries a shader id.
    if config.use_shaders:
        shader_id = mats["shader"][m]
        hd["albedo"] = shader_registry.apply_shaders(
            shader_id, hd["albedo"], hit["position"], ray_d, hd["normal"],
            hit["gnormal"], tu, tv)
    return hd


def sample_radiance(config, ir, rng, npix, pixel_offset=0,
                    trace_cache=None, record=False):
    """One full path-traced sample for every pixel: camera ray + bounce
    loop, WITHOUT the progressive accumulation (split out so the
    two-pass gradient accumulator in render/grad.py can VJP a single
    sample's radiance with flat memory).

    Returns (out, rng) where out = {"light" (post-clamp), "ok" (the NaN
    guard, kernel.cpp:600), "normal"/"tangent"/"bitangent"/"albedo"
    first-hit AOVs, "rays" instrumentation}.

    ``record=True``: additionally return out["trace"], the per-bounce
    DISCRETE trace results — path-hit tri ids and shadow occlusion bits
    ({"hit" [B, npix] i32, "occ" [B, npix] bool, +"locc" with point
    lights}).  ``trace_cache=<that pytree>``: REPLAY those results
    instead of tracing — the bounce loop then runs no BVH traversal and
    no ray sort at all.  Because the detached-sampling estimator treats
    every discrete decision as a constant of the backward pass anyway
    (hit selection is non-differentiable by construction), a replayed
    VJP is EXACTLY the gradient of the traced forward — this is what
    lets the gradient accumulator's pass 2 skip ~100% of traversal+sort
    (together ~all of the step; shading measured ~0%, docs/PERF.md).
    """
    x_res, y_res = config.x_res, config.y_res

    idx = pixel_offset + jnp.arange(npix, dtype=jnp.int32)
    px = idx % x_res
    py = idx // x_res

    rng, r1 = rng_mod.next_float(rng)
    rng, r2 = rng_mod.next_float(rng)
    rng, r3 = rng_mod.next_float(rng)
    rng, r4 = rng_mod.next_float(rng)
    rng, r5 = rng_mod.next_float(rng)
    from ..ops.camera import camera_ray
    cam = dict(ir["camera"])
    cam["bokeh"] = config.bokeh
    ray_o, ray_d = camera_ray(cam, x_res, y_res, px, py, r1, r2, r3, r4, r5)

    light = jnp.zeros((npix, 3), jnp.float32)
    reduction = jnp.ones((npix, 3), jnp.float32)
    aov_normal = jnp.zeros((npix, 3), jnp.float32)
    aov_tangent = jnp.zeros((npix, 3), jnp.float32)
    aov_bitangent = jnp.zeros((npix, 3), jnp.float32)
    # First-hit albedo, accumulated into the DENOISE slot as a denoiser
    # guide (the reference never writes that buffer, kernel.cpp:602-644;
    # get_pass("denoise") returns denoised beauty either way).
    aov_albedo = jnp.zeros((npix, 3), jnp.float32)
    alive = jnp.ones((npix,), bool)
    env = ir["env"]
    H, W, _ = env["img"].shape
    # Native MIS: brdf pdf of the previous bounce's sampled direction.
    prev_brdf_pdf = jnp.zeros((npix,), jnp.float32)
    had_bounce = jnp.zeros((npix,), bool)
    rays = jnp.zeros((), jnp.float32)

    # ONE Morton sort per bounce (ops/sort.py): bounce and shadow rays
    # originate at the same hit points, so a single permutation — computed
    # at those points — packs the shadow launch of this bounce AND the
    # path trace of the next.  The carry starts as the identity: camera
    # rays are already pixel-ordered (and share one origin), so a sort
    # would only shuffle by direction octant.  (Per-trace sorting was 22%
    # of the step, docs/PERF.md.)
    replay = trace_cache is not None
    use_sort = _uses_sort(config, ir) and not replay
    order0 = jnp.arange(npix, dtype=jnp.int32)
    merge_lights = (not config.compat) and config.n_lights > 0
    if record:
        cache0 = {"hit": jnp.zeros((config.max_bounces, npix), jnp.int32),
                  "occ": jnp.zeros((config.max_bounces, npix), bool)}
        if merge_lights:
            cache0["locc"] = jnp.zeros((config.max_bounces, npix), bool)
    else:
        cache0 = {}

    def bounce_body(bounce, carry, first=False):
        (rng, ray_o, ray_d, light, reduction, alive,
         aov_normal, aov_tangent, aov_bitangent, aov_albedo,
         prev_brdf_pdf, had_bounce, rays, order, inverse, cache) = carry
        if config.count_rays:
            rays = rays + jnp.sum(alive.astype(jnp.float32))
        if replay:
            hit_idx = jax.lax.stop_gradient(
                jnp.take(trace_cache["hit"], bounce, axis=0))
        else:
            # hit distance discarded: full_hit recomputes t/position
            # differentiably from the (detached) hit tri — this is also
            # why the replay branch above needs only the hit ids.
            # ``first`` (the peeled bounce 0): camera rays are already
            # pixel-ordered and every lane is alive, so the identity
            # permutation the carry holds is skipped outright — a gather
            # at iota indices costs full per-index price (_trace).
            hit_idx, _ = _trace(
                config, ir, ray_o, ray_d, mask=alive,
                perm=(order, inverse) if (use_sort and not first) else None,
                sort=use_sort and not first)

        miss = alive & (hit_idx < 0)
        if config.compat:
            env_val = hdri_ops.env_radiance(env, ray_d)
            light = light + where3(miss, reduction * env_val,
                                   jnp.zeros_like(light))
        else:
            # Native defers the miss-env contribution to the NEE block
            # below: the miss lanes and the NEE (shade) lanes are
            # DISJOINT, so one lane-selected texel gather serves the
            # miss radiance+MIS-pdf AND the NEE radiance+pdf (gathers
            # are per-index on TPU — every merged gather is step time
            # back).  Per-lane results are unchanged: each lane takes
            # exactly one of the two where3 terms, the other is 0.
            u_miss, v_miss = spherical_mapping(-ray_d)
        alive = alive & ~miss

        tri = gather_tri(ir["tris"], jnp.maximum(hit_idx, 0))
        hit = full_hit(ray_o, ray_d, tri)
        hd = _generate_hitdata(config, ir, hit, ray_d)

        rng, r_op = rng_mod.next_float_masked(rng, alive)
        shade = alive & (r_op <= hd["opacity"])
        pass_thru = alive & ~shade

        rng, r_hdri = rng_mod.next_float_masked(rng, shade)
        rng, rs1 = rng_mod.next_float_masked(rng, shade)
        rng, rs2 = rng_mod.next_float_masked(rng, shade)
        rng, rs3 = rng_mod.next_float_masked(rng, shade)

        wo = -ray_d
        n = hd["normal"]

        # --- HDRI NEE (kernel.cpp:543-567) ------------------------------
        if config.compat:
            sx, sy = hdri_ops.sample_env(env, r_hdri)
            nu = sx.astype(jnp.float32) / jnp.float32(W)
            nv = sy.astype(jnp.float32) / jnp.float32(H)
        else:
            if config.env_sampler == "alias":
                if "alias_prob" not in env:
                    raise ValueError(
                        "env_sampler='alias' but this IR was packed "
                        "without an alias table (pack_hdri skipped it — "
                        "large env under a compat/cdf build config). "
                        "Rebuild with the alias config, pack the env "
                        "with pack_hdri(..., alias_table=True), or set "
                        "env_sampler='cdf'.")
                # O(1) alias-table texel pick (two gathers) instead of
                # the log(H*W) CDF search; the threshold needs its own
                # draw (float32 fraction reuse is biased at large
                # HDRIs — see ops/hdri.sample_env_alias).
                rng, r_al = rng_mod.next_float_masked(rng, shade)
                sx, sy = hdri_ops.sample_env_alias(env, r_hdri, r_al)
            else:
                sx, sy = hdri_ops.sample_env_exact(env, r_hdri)
            # Uniform jitter WITHIN the chosen texel: the sampler's true
            # density is then piecewise-constant over (u, v) and
            # env_pdf_uv is exactly it.  Without the jitter a coarse env
            # (the 1x1 default, HDRI.cpp:18) pins every NEE ray to one
            # direction and the render acquires a directional bias.
            rng, ju = rng_mod.next_float_masked(rng, shade)
            rng, jv = rng_mod.next_float_masked(rng, shade)
            nu = (sx.astype(jnp.float32) + ju) / jnp.float32(W)
            nv = (sy.astype(jnp.float32) + jv) / jnp.float32(H)
        wihdri = -normalize(reverse_spherical_mapping(nu, nv))
        shadow_o = hd["position"] + n * 1e-3

        # --- BRDF directions are drawn here (stream-neutral: rs1-rs3 were
        # consumed above) so wi_l exists in time for the point-light ray to
        # join the HDRI shadow ray in ONE combined trace launch below.
        wibrdf = disney_sample(hd, wo, n, rs1, rs2, rs3)
        if not config.compat:
            wibrdf = jax.lax.stop_gradient(wibrdf)

        if use_sort:
            # The bounce's single sort: key = Morton(hit position) +
            # octant of the SAMPLED bounce direction (known already —
            # wibrdf is drawn above).  Shadow rays share the origins, so
            # the same tiles stay spatially compact for them too; dead
            # lanes (mask) pack into tail tiles.
            from ..ops.sort import sort_for_packets
            order, inverse = sort_for_packets(
                hd["position"], wibrdf, ir["bvh"]["node_bmin"][0],
                ir["bvh"]["node_bmax"][0], mask=alive,
                dir_major=config.sort_dir_major, impl=config.sort_impl,
                dir_bits=config.sort_dir_bits)

        if merge_lights:
            rng, r_l = rng_mod.next_float_masked(rng, shade)
            n_l = config.n_lights
            li = jnp.clip((r_l * n_l).astype(jnp.int32), 0, n_l - 1)
            lpos = ir["lights"]["pos"][li]
            lrad = ir["lights"]["rad"][li]
            to_light = lpos - hd["position"]
            ldist = jnp.sqrt(jnp.maximum(dot(to_light, to_light), 1e-12))
            wi_l = to_light / ldist[..., None]
            # Reuse the bounce permutation per half: each half is packed
            # with the same hit-point ordering (halves are tile-aligned
            # whenever npix is a tile multiple).  config.shadow_sort
            # replaces this with a dedicated gate-keyed sort below.
            perm2 = ((jnp.concatenate([order, order + npix]),
                      jnp.concatenate([inverse, inverse + npix]))
                     if use_sort else None)
        if not config.compat:
            # NEE contribution gate = DisneyEval's own gate
            # (Disney.cpp:166: transmission < 1 && NdotL > 0 && NdotV >
            # 0): where it fails, f_nee is exactly 0 and occlusion is
            # irrelevant — skip the shadow lane entirely.  Note the
            # shared per-bounce permutation is keyed on `alive`, so
            # gate-failed lanes stay scattered through live tiles as
            # instant-miss rays: the saving is per-lane (no tri work),
            # not whole-tile termination (ADVICE r3).
            g_common = shade & (dot(wo, n) > 0.0) \
                & (hd["transmission"] < 1.0)
            g_hdri = g_common & (dot(wihdri, n) > 0.0)
        if replay:
            occluded = jnp.take(trace_cache["occ"], bounce, axis=0)
            if merge_lights:
                g_l = g_common & (dot(wi_l, n) > 0.0)
                l_occluded = jnp.take(trace_cache["locc"], bounce, axis=0)
        elif merge_lights:
            g_l = g_common & (dot(wi_l, n) > 0.0)
            # Occlusion query (any-hit on the Pallas paths): source tri
            # excluded in-kernel, point-light half distance-limited.
            inf_col = jnp.full((npix,), jnp.inf, jnp.float32)
            so2 = jnp.concatenate(
                [shadow_o, hd["position"] + wi_l * 1e-3], 0)
            sd2 = jnp.concatenate([wihdri, wi_l], 0)
            g2 = jnp.concatenate([g_hdri, g_l], 0)
            if use_sort and config.shadow_sort:
                # Gate-keyed shadow permutation (VERDICT r4 #7): dead =
                # gate-failed lanes pack into tail tiles that terminate
                # at the root, instead of riding scattered through live
                # tiles under the alive-keyed bounce permutation.
                from ..ops.sort import sort_for_packets
                perm2 = sort_for_packets(
                    so2, sd2, ir["bvh"]["node_bmin"][0],
                    ir["bvh"]["node_bmax"][0], mask=g2,
                    dir_major=config.sort_dir_major,
                    impl=config.sort_impl,
                    dir_bits=config.sort_dir_bits)
            both_idx, both_t = _trace(
                config, ir, so2, sd2, mask=g2,
                perm=perm2,
                exclude=jnp.concatenate([hit_idx, hit_idx]),
                t_max=jnp.concatenate([inf_col, ldist - 1e-3]))
            occluded = both_idx[:npix] >= 0
            l_occluded = both_idx[npix:] >= 0
        elif config.compat:
            # Reference parity: plain nearest + self-hit comparison
            # (kernel.cpp:556); all shading lanes launch, as the
            # megakernel does.
            s_idx, _ = _trace(config, ir, shadow_o, wihdri, mask=shade,
                              perm=(order, inverse) if use_sort else None)
            occluded = (s_idx >= 0) & (s_idx != hit_idx)
        else:
            if use_sort and config.shadow_sort:
                from ..ops.sort import sort_for_packets
                perm_s = sort_for_packets(
                    shadow_o, wihdri, ir["bvh"]["node_bmin"][0],
                    ir["bvh"]["node_bmax"][0], mask=g_hdri,
                    dir_major=config.sort_dir_major, impl=config.sort_impl,
                dir_bits=config.sort_dir_bits)
            else:
                perm_s = (order, inverse) if use_sort else None
            s_idx, _ = _trace(config, ir, shadow_o, wihdri, mask=g_hdri,
                              perm=perm_s,
                              exclude=hit_idx,
                              t_max=jnp.full((npix,), jnp.inf, jnp.float32))
            occluded = s_idx >= 0
        if record:
            cache = dict(cache)
            cache["hit"] = cache["hit"].at[bounce].set(hit_idx)
            cache["occ"] = cache["occ"].at[bounce].set(occluded)
            if merge_lights:
                cache["locc"] = cache["locc"].at[bounce].set(l_occluded)
        f_nee = disney_eval(hd, wo, n, wihdri)
        if config.compat:
            hdri_val = hdri_ops.env_fetch_uv(env, nu, nv)
            hdri_val = where3(occluded, jnp.zeros_like(hdri_val), hdri_val)
            # Reference divides by the raw corner-pdf (NaN on zero-radiance
            # texels, later discarded by the NaN guard) with no MIS weight.
            hdri_pdf = hdri_ops.env_pdf(env, sx, sy)
            hdri_int = hdri_val * f_nee * jnp.abs(dot(wihdri, n))[..., None] / \
                hdri_pdf[..., None]
        else:
            # ONE texel gather for the whole bounce's env needs: the
            # miss lanes read (u_miss, v_miss), the NEE lanes read the
            # sampled (nu, nv) — disjoint sets, so a lane-select merges
            # the two fused fetches (radiance + pdf each,
            # ops/hdri.env_fetch_pdf_uv) into a single gather.
            sel_u = jnp.where(miss, u_miss, nu)
            sel_v = jnp.where(miss, v_miss, nv)
            env_rgb, env_pdf_sel = hdri_ops.env_fetch_pdf_uv(
                env, sel_u, sel_v)
            # Deferred miss-env contribution (see the trace site above):
            # balance-heuristic weight of the BRDF-sampled env hit
            # against the jittered env sampler's exact density.
            bw = hdri_ops.balance_heuristic(prev_brdf_pdf, env_pdf_sel)
            env_w = jnp.where(had_bounce, bw, 1.0)
            light = light + where3(
                miss, reduction * env_rgb * env_w[..., None],
                jnp.zeros_like(light))
            # NEE radiance + pdf; occlusion only zeroes the radiance.
            hdri_val = where3(occluded, jnp.zeros_like(env_rgb), env_rgb)
            hdri_pdf = env_pdf_sel
            nee_brdf_pdf = disney_pdf(hd, wo, n, wihdri)
            hw = hdri_ops.balance_heuristic(hdri_pdf, nee_brdf_pdf)
            hdri_int = (hdri_val * f_nee * jnp.abs(dot(wihdri, n))[..., None]
                        / jnp.maximum(hdri_pdf, 1e-12)[..., None]
                        * (hdri_pdf > 0)[..., None] * hw[..., None])

        # --- BRDF sampling (directions drawn above) ----------------------
        brdf_pdf = disney_pdf(hd, wo, n, wibrdf)
        f_brdf = disney_eval(hd, wo, n, wibrdf)

        contrib = hd["emission"] + hdri_int
        if merge_lights:
            # Point-light NEE (the reference's is dead code,
            # kernel.cpp:269-301).  Uniform 1/N pick cancels the N
            # multiplier; delta lights carry no MIS.
            f_l = disney_eval(hd, wo, n, wi_l)
            pl_c = (lrad / (ldist * ldist)[..., None]) * f_l * \
                jnp.abs(dot(wi_l, n))[..., None] * float(config.n_lights)
            contrib = contrib + where3(shade & ~l_occluded, pl_c,
                                       jnp.zeros_like(pl_c))
        light = light + where3(shade, reduction * contrib,
                               jnp.zeros_like(light))
        throughput = f_brdf * jnp.abs(dot(wibrdf, n))[..., None] / \
            (brdf_pdf[..., None] if config.compat
             else jnp.maximum(brdf_pdf, 1e-12)[..., None])
        reduction = where3(shade, reduction * throughput, reduction)

        # AOVs only at the first bounce (kernel.cpp:581-585); a bounce-0
        # opacity pass-through leaves them zero, like the reference.
        first = shade & (bounce == 0)
        aov_normal = where3(first, n, aov_normal)
        aov_tangent = where3(first, hd["tangent"], aov_tangent)
        aov_bitangent = where3(first, hd["bitangent"], aov_bitangent)
        aov_albedo = where3(first, hd["albedo"], aov_albedo)

        # --- next ray (kernel.cpp:587-592) ------------------------------
        next_o = where3(shade, hit["position"] + wibrdf * 1e-3,
                        hit["position"] + ray_d * 1e-3)
        next_d = where3(shade, normalize(wibrdf), ray_d)
        ray_o = where3(alive, next_o, ray_o)
        ray_d = where3(alive, next_d, ray_d)
        prev_brdf_pdf = jnp.where(shade, brdf_pdf, prev_brdf_pdf)
        had_bounce = had_bounce | shade
        if config.count_rays:
            # Shadow segments actually launched (gated lanes skipped in
            # native mode).
            if merge_lights:
                rays = rays + jnp.sum(g_hdri.astype(jnp.float32)) \
                    + jnp.sum(g_l.astype(jnp.float32))
            elif config.compat:
                rays = rays + jnp.sum(shade.astype(jnp.float32))
            else:
                rays = rays + jnp.sum(g_hdri.astype(jnp.float32))
        return (rng, ray_o, ray_d, light, reduction, alive,
                aov_normal, aov_tangent, aov_bitangent, aov_albedo,
                prev_brdf_pdf, had_bounce, rays, order, inverse, cache)

    carry = (rng, ray_o, ray_d, light, reduction, alive,
             aov_normal, aov_tangent, aov_bitangent, aov_albedo,
             prev_brdf_pdf, had_bounce, rays, order0, order0, cache0)
    body = (jax.checkpoint(bounce_body) if config.remat_bounces
            else bounce_body)
    # Peel bounce 0 so its path trace statically skips the identity
    # permutation (see bounce_body ``first``); bounces 1.. loop.
    first_body = functools.partial(bounce_body, first=True)
    if config.remat_bounces:
        first_body = jax.checkpoint(first_body)
    carry = first_body(0, carry)
    (rng, ray_o, ray_d, light, reduction, alive,
     aov_normal, aov_tangent, aov_bitangent, aov_albedo,
     prev_brdf_pdf, had_bounce, rays, _, _, cache) = jax.lax.fori_loop(
        1, config.max_bounces, body, carry)

    light = jnp.clip(light, 0.0, config.clamp_radiance)
    ok = ~jnp.any(jnp.isnan(light), axis=-1)
    out = {"light": light, "ok": ok, "normal": aov_normal,
           "tangent": aov_tangent, "bitangent": aov_bitangent,
           "albedo": aov_albedo, "rays": rays}
    if record:
        out["trace"] = cache
    return out, rng


def render_sample(config, ir, state, pixel_offset=0, record=False):
    """Advance the accumulators by ONE progressive sample for every pixel
    in ``state`` (the full image, or a shard of it).

    The jitted unit of work; the launch loop (renderer.py) replaces the
    reference's one-queue-submit-per-sample (kernel.cpp:689-699).

    ``pixel_offset``: global index of this state slice's first pixel —
    pass ``axis_index * local_npix`` under shard_map so camera rays and
    RNG streams stay globally correct (parallel/mesh.py).

    ``record=True``: returns (state, trace_cache) — the per-bounce
    discrete trace results the gradient accumulator replays in its
    backward pass (see sample_radiance).
    """
    npix = state["samples"].shape[0]
    out, rng = sample_radiance(config, ir, state["rng"], npix, pixel_offset,
                               record=record)
    light, ok = out["light"], out["ok"]
    aov_normal, aov_tangent = out["normal"], out["tangent"]
    aov_bitangent, aov_albedo = out["bitangent"], out["albedo"]
    rays = out["rays"]

    # --- progressive accumulation (kernel.cpp:597-645) -------------------
    sa = state["samples"].astype(jnp.float32)
    scale = jnp.where(sa > 0, sa / (sa + 1.0), 1.0)
    inv = 1.0 / (sa + 1.0)

    passes = state["passes"]
    rgb_scale = jnp.where(ok[None, :, None], scale[None, :, None], 1.0)
    rgb = passes[:, :, :3] * rgb_scale

    adds = jnp.zeros_like(rgb)
    # DENOISE carries the progressive first-hit albedo (denoiser guide);
    # the reference leaves it zeroed (kernel.cpp:602-644).
    for pid, val in ((BEAUTY, light), (NORMAL, aov_normal),
                     (TANGENT, aov_tangent), (BITANGENT, aov_bitangent),
                     (DENOISE, aov_albedo)):
        adds = adds.at[pid].set(jnp.where(ok[:, None], val * inv[:, None], 0.0))
    rgb = rgb + adds
    passes = passes.at[:, :, :3].set(rgb)

    new_state = {
        "passes": passes,
        "samples": state["samples"] + ok.astype(jnp.uint32),
        "rng": rng,
    }
    if config.count_rays:
        new_state["ray_count"] = state["ray_count"] + rays.astype(
            state["ray_count"].dtype)
    if record:
        return new_state, out["trace"]
    return new_state


@functools.partial(jax.jit, static_argnums=0, donate_argnums=2)
def render_sample_jit(config, ir, state):
    """Donating step: fastest, but invalidates the input state buffers —
    use when nothing else holds a reference (benchmarks, batch renders)."""
    return render_sample(config, ir, state)


@functools.partial(jax.jit, static_argnums=0)
def render_sample_jit_safe(config, ir, state):
    """Non-donating step for the interactive renderer: progressive
    snapshots handed to get_pass stay valid while the next sample runs
    (the reference's dual-queue readback relies on the same property,
    Managers.h:54-56)."""
    return render_sample(config, ir, state)


def _warn_oversized_dispatch(config, ir, n: int) -> None:
    """Trace-time guard: a single dispatch whose wall time exceeds the
    hardware execution envelope KILLS the tunnel-attached TPU worker
    (~60 s watchdog — scripts/multilaunch.py ladder, docs/PERF.md).
    Runs once per compile; results are unaffected."""
    rec = recommended_samples_per_dispatch(config, ir)
    if n > 4 * rec:
        from ..utils.logging import get_logger
        get_logger().warning(
            "%d samples in ONE dispatch at this scene scale (recommended "
            "<= %d) can exceed the worker's single-dispatch wall-time "
            "envelope and crash it (docs/PERF.md); drive a host loop of "
            "smaller dispatches instead.", n, rec)


@functools.partial(jax.jit, static_argnums=(0, 3), donate_argnums=2)
def render_samples_jit(config, ir, state, n: int):
    """n progressive samples in ONE dispatch (lax.fori_loop), amortizing
    per-launch overhead — the analog of enqueueing several sample kernels
    back-to-back (kernel.cpp:689-699) but without host round-trips."""
    _warn_oversized_dispatch(config, ir, n)
    return jax.lax.fori_loop(
        0, n, lambda i, st: render_sample(config, ir, st), state)


@functools.partial(jax.jit, static_argnums=(0, 3))
def render_samples_jit_safe(config, ir, state, n: int):
    """Non-donating n-sample dispatch for the interactive renderer: the
    previous snapshot stays valid for get_pass while the chunk runs."""
    _warn_oversized_dispatch(config, ir, n)
    return jax.lax.fori_loop(
        0, n, lambda i, st: render_sample(config, ir, st), state)
