"""Scalar compat-mode oracle: a pure-numpy, one-pixel-at-a-time port of
the reference megakernel (renderingKernel, /root/reference/src/
kernel.cpp:477-646) driven directly off the flat scene IR.

This is the independent parity check VERDICT r1 asked for: the wavefront
integrator (render/integrator.py, compat=True) is an aggressively
vectorized re-expression of the same spec — masks instead of branches,
fori_loops instead of early exits, a shared RNG lattice instead of one
stream.  The oracle is the OPPOSITE program shape: plain Python control
flow, one pixel, one bounce at a time, scalar float32 arithmetic.  If the
two agree per-pixel across samples, the masking/stream bookkeeping of the
wavefront is right.

Scope (widened r3, VERDICT r2 item 6): constant AND textured materials
(nearest + bilinear atlas fetch), tangent-space normal mapping,
stochastic opacity, and thin-lens bokeh — the featured-scene path.  No
point lights (dead code in the reference; native-only here).  All
formulas cite the same reference lines as the modules they check.
"""

from __future__ import annotations

import numpy as np

F = np.float32
PIF = F(3.14159265358979323846)


# --- RNG (kernel.cpp:25-47) -----------------------------------------------

def jenkins(seed: int) -> int:
    h = 0
    for i in range(4):
        h = (h + ((seed >> (i * 8)) & 0xFF)) & 0xFFFFFFFF
        h = (h + (h << 10)) & 0xFFFFFFFF
        h ^= h >> 6
    h = (h + (h << 3)) & 0xFFFFFFFF
    h ^= h >> 11
    h = (h + (h << 15)) & 0xFFFFFFFF
    return h


class Rng:
    def __init__(self, pixel_idx: int):
        self.s = jenkins((pixel_idx + 1) & 0xFFFFFFFF)

    def next(self) -> F:
        s = self.s
        s = (s ^ (s << 13)) & 0xFFFFFFFF
        s ^= s >> 17
        s = (s ^ (s << 5)) & 0xFFFFFFFF
        self.s = s
        return F(F(s) / F(4294967295.0))


# --- small vector helpers (float32 scalars) --------------------------------

def v3(x, y, z):
    return np.array([x, y, z], F)


def dot(a, b):
    return F(a[0] * b[0] + a[1] * b[1] + a[2] * b[2])


def cross(a, b):
    return v3(a[1] * b[2] - a[2] * b[1],
              a[2] * b[0] - a[0] * b[2],
              a[0] * b[1] - a[1] * b[0])


def normalize(a):
    n = F(np.sqrt(dot(a, a)))
    return a / max(n, F(1e-12))


def lerp(a, b, t):
    return a + t * (b - a)


def reflect(i, n):
    return i - F(2.0) * dot(i, n) * n


# --- camera (kernel.cpp:371-473) --------------------------------------------

def _rot_xyz(d, rot):
    # XYZ Euler (kernel.cpp:410-427).
    y1 = d[1] * np.cos(rot[0]) - d[2] * np.sin(rot[0])
    z1 = d[1] * np.sin(rot[0]) + d[2] * np.cos(rot[0])
    x1 = d[0]
    x2 = x1 * np.cos(rot[1]) + z1 * np.sin(rot[1])
    z2 = z1 * np.cos(rot[1]) - x1 * np.sin(rot[1])
    x3 = x2 * np.cos(rot[2]) - y1 * np.sin(rot[2])
    y3 = x2 * np.sin(rot[2]) + y1 * np.cos(rot[2])
    return v3(F(x3), F(y3), F(z2))


def uniform_circle_sampling(u1, u2, u3):
    """Sampling.h:20-28 (triangle-profile radius quirk)."""
    t = F(2.0) * PIF * u1
    u = F(u2 + u3)
    r = F(2.0) - u if u > F(1.0) else u
    return F(r * np.cos(t)), F(r * np.sin(t))


def camera_ray(cam, x_res, y_res, x, y, r1, r2, r3=F(0), r4=F(0), r5=F(0),
               bokeh=False):
    pos = cam["position"]
    fx = F(x) / F(x_res)
    fy = F(y) / F(y_res)
    dx = F(pos[0] + fx * cam["sensor_width"])
    dy = F(pos[1] + fy * cam["sensor_height"])
    odx = F(-cam["sensor_width"] / F(2.0) + dx)
    ody = F(-cam["sensor_height"] / F(2.0) + dy)
    rx = F(F(1.0) / F(x_res) * (r1 - F(0.5)) * cam["sensor_width"])
    ry = F(F(1.0) / F(y_res) * (r2 - F(0.5)) * cam["sensor_height"])
    sp = v3(odx + rx, ody + ry, F(pos[2] + cam["focal_length"]))
    rot = cam["rotation"] * (PIF / F(180.0))
    o = pos.astype(F)
    d = normalize(_rot_xyz(sp - pos, rot))
    if not bokeh:
        return o, d
    # Thin-lens path (kernel.cpp:433-472): iris point in the lens plane,
    # focus point along the UNperturbed ray at focus_distance+focal.
    diameter = F(cam["focal_length"] / cam["aperture"])
    l = F(cam["focus_distance"] + cam["focal_length"])
    focus_point = o + d * l
    ipx, ipy = uniform_circle_sampling(r3, r4, r5)
    ip = _rot_xyz(v3(F(ipx * diameter * F(0.5)),
                     F(ipy * diameter * F(0.5)), F(0.0)), rot)
    new_o = o + ip
    return new_o, normalize(focus_point - new_o)


# --- intersection (Tri.h:41-144, brute force ascending) ---------------------

def nearest_hit(verts, o, d):
    """Strict-'<' nearest over sorted tris, ascending (matches both the
    traversal's leaf order result and ops/bvh.brute_force tie behavior)."""
    best_i, best_t, best_uv = -1, F(np.inf), (F(0), F(0))
    for i in range(verts.shape[0]):
        got = moller_trumbore(o, d, verts[i, 0], verts[i, 1], verts[i, 2])
        if got is None:
            continue
        t, u, v = got
        if t < best_t:
            best_i, best_t, best_uv = i, t, (u, v)
    return best_i, best_t, best_uv


def moller_trumbore(o, d, v0, v1, v2):
    e1 = v1 - v0
    e2 = v2 - v0
    p = cross(d, e2)
    det = dot(e1, p)
    inv = F(1.0) / (det if abs(det) >= F(1e-30) else F(1e-30))
    tv = o - v0
    u = dot(tv, p) * inv
    q = cross(tv, e1)
    v = dot(d, q) * inv
    t = dot(e2, q) * inv
    if (abs(det) > F(1e-7) and F(0.0) <= u <= F(1.0) and v >= F(0.0)
            and u + v <= F(1.0) and t >= F(0.0)):
        return F(t), F(u), F(v)
    return None


def project_on_plane(p, origin, normal):
    return p - dot(p - origin, normal) * normal


def full_hit(o, d, tri):
    v0, v1, v2 = tri["verts"]
    got = moller_trumbore(o, d, v0, v1, v2)
    t, u, v = got if got is not None else (F(0), F(0), F(0))
    n0, n1, n2 = tri["normals"]
    geom_pos = o + d * t
    normal = normalize(n0 + (n1 - n0) * u + (n2 - n0) * v)
    gn = normalize(cross(v1 - v0, v2 - v0))
    if dot(gn, d) > F(0.0):
        gn = -gn
    tg0, tg1, tg2 = tri["tangents"]
    tangent = tg0 + (tg1 - tg0) * u + (tg2 - tg0) * v
    # Shadow-terminator fix (Tri.h:104-117).
    p0 = project_on_plane(geom_pos, v0, n0)
    p1 = project_on_plane(geom_pos, v1, n1)
    p2 = project_on_plane(geom_pos, v2, n2)
    sp = p0 + (p1 - p0) * u + (p2 - p0) * v
    position = sp if dot(sp - geom_pos, normal) > F(0.0) else geom_pos
    uv0, uv1, uv2 = tri["uvs"]
    tuv = uv0 + (uv1 - uv0) * u + (uv2 - uv0) * v
    bitangent = tri["sign"] * cross(normal, tangent)
    return dict(t=t, position=position, normal=normal, gnormal=gn,
                tangent=tangent, bitangent=bitangent,
                tu=F(tuv[0]), tv=F(tuv[1]))


# --- Disney BRDF, scalar (Disney.cpp) ---------------------------------------

def schlick(u):
    m = min(max(F(1.0) - u, F(0.0)), F(1.0))
    return F(m * m * m * m * m)


def gtr1(ndh, a):
    if a >= F(1.0):
        return F(1.0) / PIF
    a2 = a * a
    t = F(1.0) + (a2 - F(1.0)) * ndh * ndh
    return F((a2 - F(1.0)) / (PIF * np.log(a2) * t))


def gtr2_aniso(ndh, hdx, hdy, ax, ay):
    a = hdx / ax
    b = hdy / ay
    c = a * a + b * b + ndh * ndh
    return F(F(1.0) / (PIF * ax * ay * c * c))


def smith_g(ndv, ag):
    a = ag * ag
    b = ndv * ndv
    return F(F(1.0) / (ndv + np.sqrt(a + b - a * b)))


def smith_g_aniso(ndv, vdx, vdy, ax, ay):
    a = vdx * ax
    b = vdy * ay
    return F(F(1.0) / (ndv + np.sqrt(a * a + b * b + ndv * ndv)))


def aniso_alphas(rough, aniso):
    aspect = F(np.sqrt(F(1.0) - aniso * F(0.9)))
    return max(F(0.001), F(rough / aspect)), max(F(0.001), F(rough * aspect))


def disney_pdf(hd, v, n, l):
    if dot(n, l) <= F(0.0):
        return F(1.0)
    h = normalize(l + v)
    ndh = abs(dot(n, h))
    cc_a = lerp(F(0.1), F(0.001), hd["clearcoatGloss"])
    dr = F(0.5) * (F(1.0) - hd["metallic"])
    ax, ay = aniso_alphas(hd["roughness"], hd["anisotropic"])
    p2 = gtr2_aniso(ndh, dot(h, hd["tangent"]), dot(h, hd["bitangent"]),
                    ax, ay) * ndh
    p1 = gtr1(ndh, cc_a) * ndh
    ratio = F(1.0) / (F(1.0) + hd["clearcoat"])
    pspec = lerp(p1, p2, ratio) / (F(4.0) * abs(dot(l, h)) + F(1e-12))
    pdiff = abs(dot(l, n)) * (F(1.0) / PIF)
    return F(dr * pdiff + (F(1.0) - dr) * pspec)


def disney_sample(hd, v, n, r1, r2, r3):
    t, b = hd["tangent"], hd["bitangent"]
    dr = F(0.5) * (F(1.0) - hd["metallic"])
    if r3 < dr:
        r = F(np.sqrt(r1))
        phi = F(2.0) * PIF * r2
        x = F(r * np.cos(phi))
        y = F(r * np.sin(phi))
        z = F(np.sqrt(max(F(0.0), F(1.0) - x * x - y * y)))
        return t * x + b * y + n * z
    a = max(F(0.001), hd["roughness"])
    phi = r1 * PIF * F(2.0)
    ct = F(np.sqrt((F(1.0) - r2) / (F(1.0) + (a * a - F(1.0)) * r2)))
    st = min(max(F(np.sqrt(max(F(0.0), F(1.0) - ct * ct))), F(0.0)), F(1.0))
    h = t * F(st * np.cos(phi)) + b * F(st * np.sin(phi)) + n * ct
    return reflect(-v, h)


def disney_eval(hd, v, n, l):
    if not (hd["transmission"] < F(1.0) and dot(n, l) > F(0.0)
            and dot(n, v) > F(0.0)):
        return np.zeros(3, F)
    t, b = hd["tangent"], hd["bitangent"]
    h = normalize(l + v)
    ndl = abs(dot(n, l))
    ndv = abs(dot(n, v))
    ndh = abs(dot(n, h))
    ldh = abs(dot(l, h))
    cd = hd["albedo"]
    cdlum = F(0.3) * cd[0] + F(0.6) * cd[1] + F(0.1) * cd[2]
    ctint = cd / max(cdlum, F(1e-12)) if cdlum > F(0.0) else np.ones(3, F)
    cspec0 = lerp(hd["specular"] * F(0.08)
                  * lerp(np.ones(3, F), ctint, hd["specularTint"]),
                  cd, hd["metallic"])
    csheen = lerp(np.ones(3, F), ctint, hd["sheenTint"])
    fl = schlick(ndl)
    fv = schlick(ndv)
    fd90 = F(0.5) + F(2.0) * ldh * ldh * hd["roughness"]
    fd = lerp(F(1.0), fd90, fl) * lerp(F(1.0), fd90, fv)
    fss90 = ldh * ldh * hd["roughness"]
    fss = lerp(F(1.0), fss90, fl) * lerp(F(1.0), fss90, fv)
    ss = F(1.25) * (fss * (F(1.0) / max(ndl + ndv, F(1e-12)) - F(0.5))
                    + F(0.5))
    ax, ay = aniso_alphas(hd["roughness"], hd["anisotropic"])
    ds = gtr2_aniso(ndh, dot(h, t), dot(h, b), ax, ay)
    fh = schlick(ldh)
    fs = lerp(cspec0, np.ones(3, F), fh)
    gs = (smith_g_aniso(ndl, dot(l, t), dot(l, b), ax, ay)
          * smith_g_aniso(ndv, dot(v, t), dot(v, b), ax, ay))
    fsheen = fh * hd["sheen"] * csheen
    drc = gtr1(ndh, lerp(F(0.1), F(0.001), hd["clearcoatGloss"]))
    frc = lerp(F(0.04), F(1.0), fh)
    grc = smith_g(ndl, F(0.25)) * smith_g(ndv, F(0.25))
    return ((F(1.0) / PIF) * lerp(fd, ss, hd["subsurface"]) * cd + fsheen) \
        * (F(1.0) - hd["metallic"]) + gs * ds * fs \
        + F(0.25) * hd["clearcoat"] * grc * frc * drc * np.ones(3, F)


# --- HDRI, compat semantics (HDRI.cpp) ---------------------------------------

def spherical_mapping(p):
    theta = F(np.arccos(min(max(-p[1], F(-1.0)), F(1.0))))
    phi = F(np.arctan2(-p[2], p[0])) + PIF
    u = F(phi / (F(2.0) * PIF))
    v = F(theta / PIF)
    # limit_uv (Math.hpp:48-51)
    u = u - F(1.0) if u > F(1.0) else (u + F(1.0) if u < F(0.0) else u)
    v = v - F(1.0) if v > F(1.0) else (v + F(1.0) if v < F(0.0) else v)
    return u, v


def reverse_spherical_mapping(u, v):
    phi = u * F(2.0) * PIF
    theta = v * PIF
    px = F(np.cos(phi - PIF))
    py = F(-np.cos(theta))
    pz = F(-np.sin(phi - PIF))
    a = F(np.sqrt(max(F(0.0), F(1.0) - py * py)))
    return v3(a * px, py, a * pz)


def env_fetch_uv(img, u, v):
    h, w, _ = img.shape
    x = abs(int(np.trunc(u * w))) % w
    y = abs(int(np.trunc(v * h))) % h
    return img[y, x]


def binary_search(arr, value, length):
    """HDRI::binarySearch (HDRI.cpp:85-98), quirks included."""
    frm, to = 0, length - 1
    while to - frm > 0:
        m = frm + (to - frm) // 2
        if value == arr[m]:
            return m
        if value < arr[m]:
            to = m - 1
        if value > arr[m]:
            frm = m + 1
    return to


def env_pdf_corner(env, x, y):
    """HDRI::pdf (HDRI.cpp:101-107): corner theta, 2*pi normalization."""
    img = env["img"]
    h, w, _ = img.shape
    val = img[min(max(y, 0), h - 1), min(max(x, 0), w - 1)]
    theta = F(F(y) / F(h)) * PIF
    lum = F(val[0] + val[1] + val[2])
    with np.errstate(divide="ignore"):
        return F(lum / env["rsum"] * F(w) * F(h)
                 / (F(2.0) * PIF * F(np.sin(theta))))


# --- textures, scalar (Texture.cpp:172-236) ----------------------------------

def _trunc_mod_abs(x, m):
    """C++ ``x %= m; if (x < 0) x = -x`` (Texture.cpp:176-180)."""
    return int(abs(x)) % int(m)


def fetch_texel(atlas, tid, x, y):
    """getValueFromCoordinates (Texture.cpp:172-200)."""
    w = int(atlas["w"][tid])
    h = int(atlas["h"][tid])
    ch = int(atlas["ch"][tid])
    x = _trunc_mod_abs(x, w)
    y = _trunc_mod_abs(y, h)
    row = atlas["data"][int(atlas["off"][tid]) + y * w + x]
    c0 = F(row[0])
    g = F(row[1]) if ch >= 2 else c0
    b = F(row[2]) if ch >= 3 else (c0 if ch == 1 else F(0.0))
    return v3(c0, g, b)


def sample_nearest(atlas, tid, u, v):
    """getValueFromUV (Texture.cpp:202-204): trunc toward zero."""
    w = F(atlas["w"][tid])
    h = F(atlas["h"][tid])
    return fetch_texel(atlas, tid, int(np.trunc(u * w)), int(np.trunc(v * h)))


def sample_bilinear(atlas, tid, u, v):
    """getValueBilinear (Texture.cpp:206-227)."""
    w = F(atlas["w"][tid])
    h = F(atlas["h"][tid])
    x = F(u * w)
    y = F(v * h)
    t1x = F(np.floor(x))
    t1y = F(np.floor(y))
    a = F(x - t1x)
    b = F(y - t1y)
    v1 = fetch_texel(atlas, tid, int(t1x), int(t1y))
    v2 = fetch_texel(atlas, tid, int(t1x + 1), int(t1y))
    v3_ = fetch_texel(atlas, tid, int(t1x), int(t1y + 1))
    v4 = fetch_texel(atlas, tid, int(t1x + 1), int(t1y + 1))
    return lerp(lerp(v1, v2, a), lerp(v3_, v4, a), b)


def sample_filtered(atlas, tid, u, v):
    """getValueFromUVFiltered (Texture.cpp:229-236)."""
    if int(atlas["filter"][tid]) == 1:  # FILTER_BILINEAR
        return sample_bilinear(atlas, tid, u, v)
    return sample_nearest(atlas, tid, u, v)


# --- the megakernel, scalar (kernel.cpp:477-646) -----------------------------

def _hitdata(mats, mi, hit, atlas=None):
    """generateHitData (kernel.cpp:76-172): texture-or-constant per
    channel, tangent-space normal map (nearest fetch, y flipped), ^2.2."""
    tex = mats["tex"][mi] if atlas is not None else None
    tu, tv = (hit["tu"], hit["tv"]) if atlas is not None else (F(0), F(0))

    def rgb(slot, fallback):
        if tex is None or tex[slot] < 0:
            return fallback
        return sample_filtered(atlas, int(tex[slot]), tu, tv)

    def scalar(slot, fallback):
        if tex is None or tex[slot] < 0:
            return fallback
        return F(sample_filtered(atlas, int(tex[slot]), tu, tv)[0])

    # Slot order: MAP_SLOT_ORDER (scene/ir.py) = albedo, emission,
    # roughness, metallic, normal, opacity, transmission.
    hd = {"albedo": rgb(0, mats["albedo"][mi].astype(F)),
          "emission": rgb(1, mats["emission"][mi].astype(F))}
    hd["roughness"] = scalar(2, F(mats["roughness"][mi]))
    hd["metallic"] = scalar(3, F(mats["metallic"][mi]))
    hd["opacity"] = scalar(5, F(mats["opacity"][mi]))
    hd["transmission"] = scalar(6, F(mats["transmission"][mi]))
    for k in ("clearcoat", "anisotropic", "eta", "specular", "subsurface",
              "sheen"):
        hd[k] = F(mats[k][mi])
    hd["clearcoatGloss"] = F(mats["clearcoat_gloss"][mi])
    hd["specularTint"] = F(mats["specular_tint"][mi])
    hd["sheenTint"] = F(mats["sheen_tint"][mi])

    # Normal mapping (kernel.cpp:135-149): nearest fetch, y flipped.
    if tex is not None and tex[4] >= 0:
        nc = sample_nearest(atlas, int(tex[4]), tu, tv)
        ln = nc * F(2.0) - F(1.0)
        hd["normal"] = normalize(ln[0] * hit["tangent"]
                                 - ln[1] * hit["bitangent"]
                                 + ln[2] * hit["normal"])
    else:
        hd["normal"] = hit["normal"]

    # ^2.2 quirk (kernel.cpp:151-153).
    hd["roughness"] = F(hd["roughness"] ** F(2.2))
    hd["metallic"] = F(hd["metallic"] ** F(2.2))
    hd.update(tangent=hit["tangent"], bitangent=hit["bitangent"])
    return hd


def render_pixel(ir_np, config, px, py, n_samples):
    """Progressive compat beauty for one pixel; returns [n_samples, 3]
    (value after each sample) using compat accumulation (count starts 1)."""
    verts = ir_np["verts"]
    x_res, y_res = config.x_res, config.y_res
    idx = py * x_res + px
    rng = Rng(idx)
    acc = np.zeros(3, F)
    sample_count = 1  # setupKernel inits to 1 (kernel.cpp:202)
    out = []
    atlas = ir_np.get("atlas")
    bokeh = bool(getattr(config, "bokeh", False))
    for _ in range(n_samples):
        r1, r2 = rng.next(), rng.next()
        r3, r4, r5 = rng.next(), rng.next(), rng.next()
        o, d = camera_ray(ir_np["camera"], x_res, y_res, px, py, r1, r2,
                          r3, r4, r5, bokeh=bokeh)
        light = np.zeros(3, F)
        reduction = np.ones(3, F)
        for _b in range(config.max_bounces):
            hi, ht, _uv = nearest_hit(verts, o, d)
            if hi < 0:
                u, v = spherical_mapping(-d)
                light = light + reduction * env_fetch_uv(ir_np["env"]["img"],
                                                         u, v)
                break
            tri = {k: ir_np[k][hi] for k in
                   ("verts", "normals", "uvs", "tangents")}
            tri["sign"] = F(ir_np["sign"][hi])
            hit = full_hit(o, d, tri)
            hd = _hitdata(ir_np["materials"], int(ir_np["mat"][hi]), hit,
                          atlas)

            r_op = rng.next()
            if r_op > hd["opacity"]:  # stochastic pass-through
                o = hit["position"] + d * F(1e-3)
                continue

            r_hdri = rng.next()
            rs1, rs2, rs3 = rng.next(), rng.next(), rng.next()
            wo = -d
            n = hd["normal"]  # normal-mapped (kernel.cpp:528)

            # NEE (kernel.cpp:543-567), compat pdf quirks.
            env = ir_np["env"]
            H, W, _ = env["img"].shape
            count = binary_search(env["cdf"], r_hdri, H * W)
            sx, sy = count % W, count // W
            nu = F(F(sx) / F(W))
            nv = F(F(sy) / F(H))
            wihdri = -reverse_spherical_mapping(nu, nv)
            wihdri = normalize(wihdri)
            s_idx, _st, _suv = nearest_hit(
                verts, hit["position"] + n * F(1e-3), wihdri)
            occluded = s_idx >= 0 and s_idx != hi
            hdri_val = (np.zeros(3, F) if occluded
                        else env_fetch_uv(env["img"], nu, nv))
            f_nee = disney_eval(hd, wo, n, wihdri)
            pdf = env_pdf_corner(env, sx, sy)
            hdri_int = hdri_val * f_nee * abs(dot(wihdri, n)) / pdf

            wibrdf = disney_sample(hd, wo, n, rs1, rs2, rs3)
            brdf_pdf = disney_pdf(hd, wo, n, wibrdf)
            f_brdf = disney_eval(hd, wo, n, wibrdf)

            light = light + reduction * (hd["emission"] + hdri_int)
            reduction = reduction * (f_brdf * abs(dot(wibrdf, n)) / brdf_pdf)
            o = hit["position"] + wibrdf * F(1e-3)
            d = normalize(wibrdf)

        light = np.clip(light, F(0.0), F(config.clamp_radiance))
        if not np.any(np.isnan(light)):
            sa = F(sample_count)
            acc = acc * (sa / (sa + F(1.0))) + light / (sa + F(1.0))
            sample_count += 1
        out.append(acc.copy())
    return np.stack(out)


def ir_to_numpy(ir) -> dict:
    """Pull the device IR back to host numpy for the scalar program."""
    t = ir["tris"]
    return {
        "verts": np.asarray(t["verts"], F),
        "normals": np.asarray(t["normals"], F),
        "uvs": np.asarray(t["uvs"], F),
        "tangents": np.asarray(t["tangents"], F),
        "sign": np.asarray(t["sign"], F),
        "mat": np.asarray(t["mat"]),
        "materials": {k: np.asarray(v) for k, v in ir["materials"].items()},
        "env": {"img": np.asarray(ir["env"]["img"], F),
                "cdf": np.asarray(ir["env"]["cdf"], F),
                "rsum": F(np.asarray(ir["env"]["rsum"]))},
        "camera": {k: np.asarray(v, F) for k, v in ir["camera"].items()},
        "atlas": {k: np.asarray(v) for k, v in ir["atlas"].items()},
    }
