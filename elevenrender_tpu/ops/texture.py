"""Device texture sampling over a packed atlas.

TPU-native equivalent of the device-callable samplers in
/root/reference/src/Texture.cpp:172-292.  Instead of per-texture pointers,
all textures live in ONE flat float32 array with a per-texture metadata
table (offset/width/height/channels/filter) — gathers by computed flat
index, no pointer chasing, works under jit with any number of textures.

Wrap semantics replicate the reference exactly: C-style truncating ``%``
then absolute value (Texture.cpp:176-180), nearest fetch truncates
``u*width`` toward zero, bilinear interpolates 4 truncated fetches
(Texture.cpp:206-227).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.vecmath import PIF, lerp, limit_uv, vec3

FILTER_NONE = 0
FILTER_BILINEAR = 1


def pack_atlas(textures) -> dict:
    """Pack host Textures into flat device arrays.

    Returns {"data": [P, 4] f32 texel rows, "off"/"w"/"h"/"ch"/"filter":
    [K] i32} with ``off`` in TEXELS.  One texel = one padded 4-float row,
    so a fetch is a single row-gather — the same [T,40] trick as
    ops/intersect.pack_tri_attributes; TPU row-gathers move 4 lanes per
    index where scalar gathers move one (the reference chases per-texture
    float* instead, Texture.cpp:172-200).
    Always contains at least one (dummy) texture so gathers are safe.
    """
    datas = []
    off = []
    w = []
    h = []
    ch = []
    filt = []
    cursor = 0
    for t in textures:
        texels = t.data.reshape(-1, t.channels).astype(np.float32)
        rows = np.zeros((texels.shape[0], 4), np.float32)
        rows[:, :min(t.channels, 4)] = texels[:, :4]
        datas.append(rows)
        off.append(cursor)
        w.append(t.width)
        h.append(t.height)
        ch.append(t.channels)
        filt.append(t.filter)
        cursor += rows.shape[0]
    if not datas:
        datas = [np.zeros((1, 4), np.float32)]
        off, w, h, ch, filt = [0], [1], [1], [1], [FILTER_NONE]
    return {
        "data": jnp.asarray(np.concatenate(datas)),
        "off": jnp.asarray(np.array(off, np.int32)),
        "w": jnp.asarray(np.array(w, np.int32)),
        "h": jnp.asarray(np.array(h, np.int32)),
        "ch": jnp.asarray(np.array(ch, np.int32)),
        "filter": jnp.asarray(np.array(filt, np.int32)),
    }


def _trunc_mod_abs(x, m):
    """C++ ``x %= m; if (x < 0) x = -x`` for int32 x, m > 0."""
    q = jnp.abs(x) // m
    r = jnp.abs(x) - q * m  # |x| mod m == |trunc-mod| for these semantics
    return r


def fetch_texel(atlas, tex_id, x, y):
    """getValueFromCoordinates (Texture.cpp:172-200) -> [..., 3].

    ONE row-gather per texel (the [P,4] texel-row layout from pack_atlas)
    instead of three scalar gathers."""
    off = atlas["off"][tex_id]
    w = atlas["w"][tex_id]
    h = atlas["h"][tex_id]
    ch = atlas["ch"][tex_id]
    x = _trunc_mod_abs(x.astype(jnp.int32), w)
    y = _trunc_mod_abs(y.astype(jnp.int32), h)
    base = off + y * w + x
    P = atlas["data"].shape[0]
    row = atlas["data"][jnp.clip(base, 0, P - 1)]  # [..., 4]
    c0 = row[..., 0]
    # channels==1 -> grey broadcast; ==2 -> (x,y,0); >=3 -> rgb.
    r = c0
    g = jnp.where(ch >= 2, row[..., 1], c0)
    b = jnp.where(ch >= 3, row[..., 2], jnp.where(ch == 1, c0, 0.0))
    return vec3(r, g, b)


def _trunc_i32(f):
    """C float->int cast (toward zero)."""
    return jnp.trunc(f).astype(jnp.int32)


def sample_nearest(atlas, tex_id, u, v):
    """getValueFromUV (Texture.cpp:202-204)."""
    w = atlas["w"][tex_id].astype(jnp.float32)
    h = atlas["h"][tex_id].astype(jnp.float32)
    return fetch_texel(atlas, tex_id, _trunc_i32(u * w), _trunc_i32(v * h))


def sample_bilinear(atlas, tex_id, u, v):
    """getValueBilinear (Texture.cpp:206-227)."""
    w = atlas["w"][tex_id].astype(jnp.float32)
    h = atlas["h"][tex_id].astype(jnp.float32)
    x = u * w
    y = v * h
    t1x = jnp.floor(x)
    t1y = jnp.floor(y)
    a = (x - t1x)[..., None]
    b = (y - t1y)[..., None]
    v1 = fetch_texel(atlas, tex_id, _trunc_i32(t1x), _trunc_i32(t1y))
    v2 = fetch_texel(atlas, tex_id, _trunc_i32(t1x + 1), _trunc_i32(t1y))
    v3 = fetch_texel(atlas, tex_id, _trunc_i32(t1x), _trunc_i32(t1y + 1))
    v4 = fetch_texel(atlas, tex_id, _trunc_i32(t1x + 1), _trunc_i32(t1y + 1))
    return lerp(lerp(v1, v2, a), lerp(v3, v4, a), b)


def sample_filtered(atlas, tex_id, u, v, uniform_filter: int = -1):
    """getValueFromUVFiltered (Texture.cpp:229-236): per-texture filter.

    ``uniform_filter`` is a STATIC hint from scene build: when every
    texture in the atlas shares one filter, dispatch compiles to just that
    sampler (1 or 4 gathers).  Mixed atlases (-1) take 4 gathers: the
    nearest-filter lanes collapse all four bilinear taps onto the nearest
    texel, so the lerp degenerates to it — versus the 5 gathers + select
    of evaluating both samplers.
    """
    if uniform_filter == FILTER_NONE:
        return sample_nearest(atlas, tex_id, u, v)
    if uniform_filter == FILTER_BILINEAR:
        return sample_bilinear(atlas, tex_id, u, v)

    w = atlas["w"][tex_id].astype(jnp.float32)
    h = atlas["h"][tex_id].astype(jnp.float32)
    bil = atlas["filter"][tex_id] == FILTER_BILINEAR
    x = u * w
    y = v * h
    t1x = jnp.floor(x)
    t1y = jnp.floor(y)
    a = jnp.where(bil, x - t1x, 0.0)[..., None]
    b = jnp.where(bil, y - t1y, 0.0)[..., None]
    # Nearest truncates toward zero (not floor); collapse the 4 taps.
    nx = _trunc_i32(x).astype(jnp.float32)
    ny = _trunc_i32(y).astype(jnp.float32)
    x0 = jnp.where(bil, t1x, nx)
    y0 = jnp.where(bil, t1y, ny)
    x1 = jnp.where(bil, t1x + 1, nx)
    y1 = jnp.where(bil, t1y + 1, ny)
    v1 = fetch_texel(atlas, tex_id, _trunc_i32(x0), _trunc_i32(y0))
    v2 = fetch_texel(atlas, tex_id, _trunc_i32(x1), _trunc_i32(y0))
    v3 = fetch_texel(atlas, tex_id, _trunc_i32(x0), _trunc_i32(y1))
    v4 = fetch_texel(atlas, tex_id, _trunc_i32(x1), _trunc_i32(y1))
    return lerp(lerp(v1, v2, a), lerp(v3, v4, a), b)


def spherical_mapping(p):
    """Direction -> equirect UV (Texture.cpp:239-251 with origin=0, r=1).

    The caller passes ``-ray_direction`` exactly as the reference does.
    """
    theta = jnp.arccos(jnp.clip(-p[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(-p[..., 2], p[..., 0]) + PIF
    u = phi / (2.0 * PIF)
    v = theta / PIF
    return limit_uv(u, v)


def reverse_spherical_mapping(u, v):
    """Equirect UV -> direction (Texture.cpp:280-292)."""
    phi = u * 2.0 * PIF
    theta = v * PIF
    px = jnp.cos(phi - PIF)
    py = -jnp.cos(theta)
    pz = -jnp.sin(phi - PIF)
    a = jnp.sqrt(jnp.maximum(0.0, 1.0 - py * py))
    return vec3(a * px, py, a * pz)
