"""Scene IR: the flat, device-ready pytree.

The reference deep-copies a pointer graph to the device (dev_Scene,
/root/reference/src/kernel.h:24-49 + SYCLCopy.cpp:3-104, 30+ sequential
memcpys).  The TPU-native equivalent is a single pytree of flat jnp arrays
— no pointers anywhere — moved to HBM in one ``jax.device_put``:

- triangles as SoA arrays *permuted into BVH leaf order* (a leaf is a
  contiguous slice; ``triIdx`` == sorted position, matching BVH.cpp:116),
- a flat node array with implicit children (preorder, BVH.cpp:122-130),
- a material SoA table, a packed texture atlas, the HDRI + CDF,
- camera parameters and point lights.

``RenderConfig`` carries everything shape-affecting or trace-affecting
(static under jit).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax.numpy as jnp

from ..ops.bvh import build_bvh
from ..ops.hdri import pack_hdri
from ..ops.texture import FILTER_NONE, pack_atlas

MAP_SLOT_ORDER = ("albedo", "emission", "roughness", "metallic", "normal",
                  "opacity", "transmission")


def _shader_registry_version() -> int:
    from ..render.shaders import registry_version
    return registry_version()

MAT_SCALARS = ("opacity", "roughness", "metallic", "clearcoat_gloss",
               "clearcoat", "anisotropic", "eta", "transmission", "specular",
               "specular_tint", "sheen_tint", "subsurface", "sheen")


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static (hashable) render configuration.

    Mirrors RenderParameters (kernel.h:51-69) plus structural facts the
    jitted program specializes on.
    """
    x_res: int = 1280          # kernel.h:68 defaults
    y_res: int = 720
    sample_target: int = 100
    denoise: bool = False
    device: str = ""
    block_size: int = 8
    # Per-pass enables (kernel.h:62-66, all-on default).
    passes_enabled: tuple = (True, True, True, True, True)

    bvh_depth: int = 1
    bvh_max_leaf: int = 1
    bokeh: bool = False
    n_lights: int = 0
    max_bounces: int = 5       # kernel.cpp:508 hard-coded 5
    clamp_radiance: float = 10.0  # kernel.cpp:597
    compat: bool = True        # replicate reference quirks exactly
    use_bvh: bool = True
    # Trace implementation: "auto" picks brute force for tiny scenes and
    # packet traversal otherwise; "per_ray" is the reference-shaped stack
    # walk (slow on TPU: per-lane gathers), "packet"/"brute" force one.
    trace_mode: str = "auto"
    packet_tile: int = 128
    # Pallas traversal tile = pallas_sub * 128 rays sharing one
    # scalar-driven BVH walk.  The kernel is scalar/loop-bound, so wider
    # tiles win until the tile's node union dominates: on v5e, 32 beat 8
    # by 2.2-7x on coherent AND sorted-incoherent rays
    # (scripts/sweep_tile.py, docs/PERF.md).
    pallas_sub: int = 32
    # Tile width for OCCLUSION (any-hit shadow) traces; 0 = use
    # pallas_sub.  Any-hit early termination is tile-granular (a tile
    # stops when every lane is resolved), so narrower shadow tiles can
    # win despite the wider-amortization rule for nearest traces.
    shadow_pallas_sub: int = 0
    # Child descent order in the Pallas walk: "near" = per-visit min
    # entry distance; "sign" = packed split-axis vs tile direction signs
    # (drops one horizontal reduction per interior visit — A/B knob, see
    # ops/bvh_pallas.traverse_pallas).
    trace_order: str = "near"
    # Leaf-row AABB pre-test in the Pallas leaf scan: 0 = off, 1 = one
    # packed box per 8-tri row, 2 = two boxes per row (4-tri halves).
    # The boxes ride in the tri rows' spare lanes (no extra traffic);
    # a failed test branches over the whole Möller-Trumbore block.
    # Results identical.  MEASURED NEGATIVE at the default sub=32 (r5):
    # a 4096-ray tile's union touches nearly every row, so the skip rate
    # (8-14% of slots) never covers the per-row test+branch — full step
    # 2128 (off) vs 2431 (+14%, mode 1) vs 2820 ms (+33%, mode 2),
    # .runlogs/ab_leafaabb_66k2.log + step probe; docs/PERF.md.  Kept as
    # the documented-negative A/B knob.
    leaf_aabb: int = 0
    # Morton-sort rays before packet/pallas traversal (ops/sort.py) so
    # tiles stay spatially compact; essential for secondary/shadow rays.
    sort_rays: bool = True
    # Sort-key layout: False = position-major Morton with octant low
    # bits; True = octant-major (pure-direction tiles).  Default True
    # since r4: measured 8% faster on the full sample step
    # (2296 -> 2113 ms, .runlogs/ab_dirmajor.log) — pure-octant tiles
    # help the bounce/shadow traces more than spatial compactness does.
    # Results are invariant (the permutation is inverted); only equal-t
    # shared-edge tie resolution can differ per tile grouping.
    sort_dir_major: bool = True
    # Direction-class bits for the direction-major sort keys: 3 = sign
    # octants (r4 behavior); >3 = an equirect direction grid with that
    # many total bits, trading position bits for finer direction cones
    # (ops/sort.morton_key).  A/B knob.
    sort_dir_bits: int = 3
    # Per-bounce sort implementation: "argsort" (full XLA comparison
    # sort) or "counting" (top-8-bit stable counting sort,
    # ops/sort.counting_order — O(n), tile-granular grouping; measured
    # 1.30x WORSE end-to-end, kept as the documented negative).  NOTE
    # (ADVICE r4): counting materializes a [C, chunk, 257] one-hot +
    # cumsum — ~1 GB transient per 1M keys, scaling linearly — so at
    # large resolutions it also risks HBM OOM on top of the slowdown.
    sort_impl: str = "argsort"
    # Pack every per-lane sort payload (rays + exclude/t_max, and the
    # trace results) into ONE wide row per gather: TPU gather cost is
    # per-index, so 2-4 narrow gathers per trace collapse to one.  Tri
    # ids ride as exact float32 VALUES (< 2^24; bitcasting was measured
    # corrupted — subnormal flush + NaN canonicalization); scenes past
    # 16.7M tris fall back automatically.  Default True since r5:
    # -11% on the full step (1518 -> 1351 ms/sample,
    # .runlogs/ab_packedio_66k.log); results invariant
    # (tests/test_bvh.py::test_packed_sort_io_does_not_change_render).
    packed_sort_io: bool = True
    # Samples per jitted dispatch: 0 = auto
    # (integrator.recommended_samples_per_dispatch, which encodes the
    # tunnel-attached worker's ~60 s single-dispatch wall-time envelope
    # — docs/PERF.md).  Deployments without that watchdog can raise it
    # here or via the ELEVENRT_SAMPLES_PER_DISPATCH env var (the env var
    # wins) to amortize launch overhead at stream scale.  Results are
    # identical at any chunking.
    samples_per_dispatch: int = 0
    # Dedicated shadow-launch sort keyed on the NEE gates (VERDICT r4
    # #7): the shared per-bounce permutation is keyed on `alive`, so
    # gate-failed lanes stay scattered through live tiles as
    # instant-miss rays; a dedicated sort keyed on g_hdri/g_l packs them
    # into dead TAIL tiles that terminate at the root — at the cost of
    # one extra argsort + gather/scatter set per bounce.  Default True
    # since r5: measured -5.4% on the full bench step (2128 -> 2013
    # ms/sample, .runlogs/ab_shadowsort.log); results invariant
    # (tests/test_bvh.py::test_shadow_sort_does_not_change_render).
    shadow_sort: bool = True
    # Native-mode env texel sampler: "alias" = O(1) Walker alias table
    # (two gathers; ops/hdri.sample_env_alias — consumes a dedicated
    # threshold draw on top of the texel draw, so its RNG stream is NOT
    # interchangeable with cdf's); "cdf" = exact searchsorted CDF
    # inversion (log(H*W) gather chain, one draw).  Both share the
    # jittered continuous pdf; estimates are different-but-unbiased
    # sample streams.  Default "alias" since r5:
    # -27% on the full step at a 2k x 1k HDRI (2659 -> 1945 ms/sample,
    # .runlogs/ab_envsampler_2k.log), parity-to-noise at small envs.
    # Compat mode always uses the reference's quirky binary search.
    env_sampler: str = "alias"
    # Material-parameter fetch: "gather" = table[m] row gather (backward
    # is a maximally-colliding [npix]->[M] scatter-add per bounce per
    # VJP); "mm_bwd" = same gather forward but a custom VJP whose
    # backward is a one-hot matmul reduce at Precision.HIGHEST (same
    # result up to f32 summation order; microbench: 38 -> 29 ms per
    # backward at 1M lanes / M=2, scripts/microbench_scatter.py);
    # "onehot" = one-hot matmul BOTH directions (exact forward too —
    # measured a wash end-to-end: the matmul forward costs what the
    # backward saves).  mm_bwd/onehot are guarded to M <= 64 at trace
    # time (the [npix, M] operand scales with the material count);
    # larger tables fall back to the gather.  Default "mm_bwd" since r5:
    # replay VJP 503 -> 453 ms/sample, forward unchanged — two-pass
    # fwd+bwd 1846 -> 1796 ms/sample (+2.8% headline,
    # .runlogs/profile_grad_r05_mmbwd.log); gradients equal up to f32
    # summation order (tests/test_grad_and_sharding.py).
    material_fetch: str = "mm_bwd"
    # Rematerialize each bounce in reverse-mode AD (jax.checkpoint on
    # the bounce body): the backward pass recomputes a bounce's
    # intermediates instead of storing them.  Required for gradients at
    # production scale — the 1M-tri 1024² accumulated backward holds
    # ~5 bounces of wavefront residuals and overflows HBM by 63MB
    # without it (.runlogs/bench_config5_r04.log); costs extra forward
    # FLOPs, so off by default at bench scale.
    remat_bounces: bool = False
    # Static shading facts (computed by build_ir from the host scene so
    # XLA compiles away unused fetch paths — see _generate_hitdata):
    # which of the 7 map slots any material actually binds, whether all
    # atlas textures share one filter (else -1), and whether any material
    # has a programmable shader.
    tex_slots_used: tuple = (True, True, True, True, True, True, True)
    tex_uniform_filter: int = -1
    use_shaders: bool = True
    # Shader-registry version at build time (render/shaders._VERSION):
    # shader bodies are read at TRACE time, so this static field makes a
    # rebind (load_osl_material / register_shader) a cache MISS instead
    # of silently reusing an executable with the old body baked in.
    shader_version: int = 0
    # Count ALIVE rays (path segments + shadow segments actually needing a
    # result) into state["ray_count"] — for honest bench accounting; the
    # lockstep wavefront always pays 2*max_bounces launches regardless.
    count_rays: bool = False

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


def materials_to_ir(materials) -> dict:
    """Material list -> SoA table.  Index 0 is the implicit default
    (Scene.cpp:107: unmatched tris get materialID 0)."""
    from .material import Material
    if not materials:
        materials = [Material.default()]
    M = len(materials)
    out = {
        "albedo": np.zeros((M, 3), np.float32),
        "emission": np.zeros((M, 3), np.float32),
        "tex": np.full((M, len(MAP_SLOT_ORDER)), -1, np.int32),
        "shader": np.full((M,), -1, np.int32),
    }
    for s in MAT_SCALARS:
        out[s] = np.zeros(M, np.float32)
    for i, m in enumerate(materials):
        out["albedo"][i] = m.albedo
        out["emission"][i] = m.emission
        for s in MAT_SCALARS:
            out[s][i] = getattr(m, s)
        for j, slot in enumerate(MAP_SLOT_ORDER):
            out["tex"][i, j] = getattr(m, f"{slot}_texture_id")
        out["shader"][i] = m.albedo_shader_id
    return {k: jnp.asarray(v) for k, v in out.items()}


def build_ir(scene, config: RenderConfig | None = None,
             bvh_depth: int | None = None,
             packed_attrs: bool = True) -> tuple[RenderConfig, dict]:
    """Flatten a host Scene into (RenderConfig, device IR pytree).

    packed_attrs (default True since r5) additionally stores a [T, 40]
    per-tri attribute matrix so hit shading gathers one row instead of
    six arrays — TPU gathers are near-serial per lane, so this measured
    -14% on the record-forward step and -45% on the gradient
    accumulator's replay VJP (docs/PERF.md r5).  Costs 160B/tri extra
    HBM (160 MB at 1M tris); pass False to trade the speed back."""
    if config is None:
        config = RenderConfig()

    # ---- triangles (all meshes concatenated, Scene.cpp:48-66) ----------
    verts, normals, uvs, tangents, signs, mats = [], [], [], [], [], []
    mat_index = {m.name: i for i, m in enumerate(scene.materials)}
    for mesh in scene.meshes:
        verts.append(mesh.verts)
        normals.append(mesh.normals)
        uvs.append(mesh.uvs)
        tangents.append(mesh.tangents)
        signs.append(mesh.tangent_signs)
        # Name-based tri->material pairing (Scene.cpp:102-120); default 0.
        mats.append(np.array([mat_index.get(n, 0) for n in mesh.mat_names],
                             np.int32))
    if verts:
        verts = np.concatenate(verts)
        normals = np.concatenate(normals)
        uvs = np.concatenate(uvs)
        tangents = np.concatenate(tangents)
        signs = np.concatenate(signs)
        mats = np.concatenate(mats)
    else:
        verts = np.zeros((0, 3, 3), np.float32)
        normals = np.zeros((0, 3, 3), np.float32)
        uvs = np.zeros((0, 3, 2), np.float32)
        tangents = np.zeros((0, 3, 3), np.float32)
        signs = np.zeros(0, np.float32)
        mats = np.zeros(0, np.int32)

    bvh = build_bvh(verts, depth=bvh_depth)
    perm = bvh["perm"]

    from ..ops.bvh_pallas import pack_bvh_for_pallas
    nodes_p, leaf_p, tris9_p = pack_bvh_for_pallas(bvh, verts[perm])

    # The 8-wide collapse moved to experiments/ (r4): it measured at
    # best +5% on fully-shuffled isolated traversals but lost the real
    # 1M-tri integrator step 11.4 s vs 7.9 s (docs/PERF.md) — its
    # tables are no longer built into the IR.  experiments.bvh_wide
    # packs them on demand for measurement scripts.

    tris_ir = {
        "verts": jnp.asarray(verts[perm]),
        "normals": jnp.asarray(normals[perm]),
        "uvs": jnp.asarray(uvs[perm]),
        "tangents": jnp.asarray(tangents[perm]),
        "sign": jnp.asarray(signs[perm]),
        "mat": jnp.asarray(mats[perm]),
    }
    if packed_attrs:
        from ..ops.intersect import pack_tri_attributes
        tris_ir["packed"] = jnp.asarray(pack_tri_attributes(
            verts[perm], normals[perm], uvs[perm], tangents[perm],
            signs[perm], mats[perm]))

    ir = {
        "bvh_packed": {"nodes": nodes_p, "leaf": leaf_p, "tris9": tris9_p},
        "tris": tris_ir,
        "bvh": {
            "node_bmin": jnp.asarray(bvh["node_bmin"]),
            "node_bmax": jnp.asarray(bvh["node_bmax"]),
            "node_from": jnp.asarray(bvh["node_from"]),
            "node_to": jnp.asarray(bvh["node_to"]),
        },
        "materials": materials_to_ir(scene.materials),
        "atlas": pack_atlas(scene.textures),
        # Force the alias table whenever the build config's env_sampler
        # is "alias" (the default) — keying on compat too broke the
        # ubiquitous build-then-replace(compat=False) pattern for large
        # envs.  A compat-only session with a big HDRI can skip the
        # build cost by setting env_sampler="cdf" in its config; an
        # explicit "cdf" build falls back to pack_hdri's size-gated
        # auto so later small-env knob flips keep working.
        "env": pack_hdri(scene.hdri,
                         alias_table=(True if config.env_sampler == "alias"
                                      else None)),
        "camera": {
            "position": jnp.asarray(scene.camera.position, jnp.float32),
            "rotation": jnp.asarray(scene.camera.rotation, jnp.float32),
            "focal_length": jnp.float32(scene.camera.focal_length),
            "sensor_width": jnp.float32(scene.camera.sensor_width),
            "sensor_height": jnp.float32(scene.camera.sensor_height),
            "aperture": jnp.float32(scene.camera.aperture),
            "focus_distance": jnp.float32(scene.camera.focus_distance),
        },
        "lights": {
            "pos": jnp.asarray(
                np.stack([l.position for l in scene.point_lights])
                if scene.point_lights else np.zeros((1, 3), np.float32)),
            "rad": jnp.asarray(
                np.stack([l.radiance for l in scene.point_lights])
                if scene.point_lights else np.zeros((1, 3), np.float32)),
        },
    }

    # Static shading facts: slots no material binds are compiled away,
    # a single-filter atlas drops the per-lane filter select, and the
    # shader pass vanishes when no material has a shader id.
    tex_table = np.asarray(ir["materials"]["tex"])
    filters = sorted({t.filter for t in scene.textures})
    shader_ids = np.asarray(ir["materials"]["shader"])

    config = config.replace(
        x_res=scene.x_res, y_res=scene.y_res,
        bvh_depth=bvh["depth"], bvh_max_leaf=bvh["max_leaf"],
        bokeh=bool(scene.camera.bokeh),
        n_lights=len(scene.point_lights),
        tex_slots_used=tuple(bool(b) for b in (tex_table >= 0).any(axis=0)),
        tex_uniform_filter=(filters[0] if len(filters) == 1
                            else (FILTER_NONE if not filters else -1)),
        use_shaders=bool((shader_ids >= 0).any()),
        shader_version=_shader_registry_version(),
    )
    return config, ir
