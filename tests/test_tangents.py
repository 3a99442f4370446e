"""MikkTSpace tangent-generation tests (VERDICT r1 item 6).

Validates the distinguishing MikkTSpace rules against analytic
expectations (the library itself is not in this image; expectations are
derived from the published algorithm — angle weighting, orientation
groups, signed-division +u tangents — which mikktspaceCallback.cpp:12-97
feeds from the same position/normal/uv accessors used here)."""

import numpy as np

from elevenrender_tpu.scene.tangents import compute_tangents


def quad(p0, p1, p2, p3, uv0, uv1, uv2, uv3, normal):
    """Two tris (p0,p1,p2) (p0,p2,p3) with per-corner uv + shared normal."""
    verts = np.array([[p0, p1, p2], [p0, p2, p3]], np.float64)
    uvs = np.array([[uv0, uv1, uv2], [uv0, uv2, uv3]], np.float64)
    normals = np.tile(np.asarray(normal, np.float64), (2, 3, 1))
    return verts, uvs, normals


def test_axis_aligned_quad():
    """u increases along +x, v along +y, normal +z: tangent = +x, sign +1
    and bitangent reconstruction sign*cross(n,t) = +y (Tri.h:136)."""
    v, uv, n = quad([0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                    [0, 0], [1, 0], [1, 1], [0, 1], [0, 0, 1])
    t, s = compute_tangents(v, uv, n)
    np.testing.assert_allclose(t, np.broadcast_to([1.0, 0, 0], t.shape),
                               atol=1e-6)
    np.testing.assert_allclose(s, [1.0, 1.0])
    bit = s[0] * np.cross([0, 0, 1.0], t[0, 0])
    np.testing.assert_allclose(bit, [0, 1.0, 0], atol=1e-6)


def test_mirrored_quad_sign_flips_tangent_stays():
    """Mirrored UVs (u decreases along +x): the signed-division tangent
    still points along increasing u (-x here) and the handedness flips."""
    v, uv, n = quad([0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                    [1, 0], [0, 0], [0, 1], [1, 1], [0, 0, 1])
    t, s = compute_tangents(v, uv, n)
    np.testing.assert_allclose(t, np.broadcast_to([-1.0, 0, 0], t.shape),
                               atol=1e-6)
    np.testing.assert_allclose(s, [-1.0, -1.0])
    bit = s[0] * np.cross([0, 0, 1.0], t[0, 0])
    np.testing.assert_allclose(bit, [0, 1.0, 0], atol=1e-6)  # +v is still +y


def test_mirror_seam_does_not_average():
    """Two quads sharing an edge, the right one UV-mirrored: corners ON
    the seam keep their own face's tangent (orientation groups split),
    instead of averaging to a degenerate blend — the core MikkTSpace rule
    a naive weld-average violates."""
    # Left quad: u in [0,1] over x in [-1,0]; right quad mirrored:
    # u in [1,0] over x in [0,1].
    vL, uvL, nL = quad([-1, 0, 0], [0, 0, 0], [0, 1, 0], [-1, 1, 0],
                       [0, 0], [1, 0], [1, 1], [0, 1], [0, 0, 1])
    vR, uvR, nR = quad([0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                       [1, 0], [0, 0], [0, 1], [1, 1], [0, 0, 1])
    v = np.concatenate([vL, vR])
    uv = np.concatenate([uvL, uvR])
    n = np.concatenate([nL, nR])
    t, s = compute_tangents(v, uv, n)
    # Left faces: +x tangent, sign +1.  Right faces: -x tangent, sign -1.
    np.testing.assert_allclose(t[:2], np.broadcast_to([1.0, 0, 0],
                                                      (2, 3, 3)), atol=1e-6)
    np.testing.assert_allclose(t[2:], np.broadcast_to([-1.0, 0, 0],
                                                      (2, 3, 3)), atol=1e-6)
    np.testing.assert_allclose(s, [1, 1, -1, -1])


def test_angle_weighting():
    """A corner shared by two faces with different interior angles: the
    accumulated tangent must be the ANGLE-weighted mean of the per-face
    (projected, normalized) tangents — not the unweighted mean."""
    # Two triangles sharing corner A=(0,0,0) with the same normal/uv at A.
    # Face 1: edges along +x and +y -> angle pi/2, tangent +x.
    # Face 2: edges along +y and a 30-degree ray -> angle pi/6, and a
    #   rotated UV mapping giving tangent +y.
    A = [0.0, 0.0, 0.0]
    f1 = np.array([[A, [1, 0, 0], [0, 1, 0]]], np.float64)
    uv1 = np.array([[[0, 0], [1, 0], [0, 1]]], np.float64)  # tangent +x
    c30, s30 = np.cos(np.pi / 3), np.sin(np.pi / 3)
    f2 = np.array([[A, [0, 1, 0], [c30 * 0.0 + s30 * 0.0, 0, 0]]])
    # Build face 2 with edges A->(0,1,0) and A->(sin60? ...) use explicit:
    f2 = np.array([[A, [0, 1, 0], [np.cos(np.pi / 2 - np.pi / 6),
                                   np.sin(np.pi / 2 - np.pi / 6), 0]]],
                  np.float64)  # edges at 90 and 60 deg from +x: angle 30
    # UVs chosen so face 2's +u direction is +y: u increases along +y.
    uv2 = np.array([[[0, 0],
                     [1, 0],
                     [np.nan, np.nan]]], np.float64)
    # Solve uv for third corner so that d(u)/d(pos) = +y exactly:
    # want grad_u = (0,1,0), grad_v = (-1,0,0) (orthogonal, det>0).
    P1 = np.array([0, 1, 0.0]) - np.array(A)
    P2 = f2[0, 2] - np.array(A)
    gu = np.array([0, 1, 0.0])
    gv = np.array([1, 0, 0.0])  # right-handed uv frame: det > 0
    uv2[0, 1] = [P1 @ gu, P1 @ gv]
    uv2[0, 2] = [P2 @ gu, P2 @ gv]
    uv2[0, 0] = [0, 0]
    n2 = np.tile([0, 0, 1.0], (1, 3, 1)).reshape(1, 3, 3)
    n1 = n2.copy()

    v = np.concatenate([f1, f2])
    uv = np.concatenate([uv1, uv2])
    n = np.concatenate([n1, n2])
    t, s = compute_tangents(v, uv, n)

    # Corner A of both faces welds (same pos+normal+uv, both orient +).
    a1 = np.pi / 2
    a2 = np.pi / 6
    expect = a1 * np.array([1, 0, 0.0]) + a2 * np.array([0, 1, 0.0])
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(t[0, 0], expect, atol=1e-6)
    np.testing.assert_allclose(t[1, 0], expect, atol=1e-6)
    # Non-shared corners keep their own face tangent.
    np.testing.assert_allclose(t[0, 1], [1, 0, 0], atol=1e-6)


def test_sphere_tangents_azimuthal():
    """Spherically-mapped sphere: tangents must follow +u = azimuthal
    direction, be unit length and normal-orthogonal away from the poles."""
    nt, npn = 17, 32
    th = np.linspace(0.15, np.pi - 0.15, nt)
    ph = np.linspace(0, 2 * np.pi, npn, endpoint=False)
    tg, pg = np.meshgrid(th, ph, indexing="ij")
    P = np.stack([np.sin(tg) * np.cos(pg), np.cos(tg),
                  np.sin(tg) * np.sin(pg)], -1)
    U = pg / (2 * np.pi)
    V = tg / np.pi
    quads = []
    uvq = []
    for i in range(nt - 1):
        for j in range(npn - 1):  # skip the wrap column (u seam)
            # Winding chosen so the UV determinant is positive
            # (corner0->1 along +u, corner0->2 along +u+v).
            quads.append([P[i, j], P[i, j + 1], P[i + 1, j + 1]])
            quads.append([P[i, j], P[i + 1, j + 1], P[i + 1, j]])
            uvq.append([[U[i, j], V[i, j]], [U[i, j + 1], V[i, j + 1]],
                        [U[i + 1, j + 1], V[i + 1, j + 1]]])
            uvq.append([[U[i, j], V[i, j]],
                        [U[i + 1, j + 1], V[i + 1, j + 1]],
                        [U[i + 1, j], V[i + 1, j]]])
    v = np.asarray(quads)
    uv = np.asarray(uvq)
    n = v.copy()  # unit sphere: normal == position
    t, s = compute_tangents(v, uv, n)

    # Analytic +u (azimuthal) direction at each corner.
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    az = np.stack([-z, np.zeros_like(y), x], -1)
    az /= np.linalg.norm(az, axis=-1, keepdims=True)
    cosang = np.sum(t * az, axis=-1)
    assert (cosang > 0.97).mean() > 0.995, float((cosang > 0.97).mean())
    # Orthogonal to normals, unit length.
    assert np.abs(np.sum(t * n, axis=-1)).max() < 1e-5
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-5)
    assert (s == 1.0).all()


def test_degenerate_face_copies_good_tangent():
    """A zero-UV-area face welded (pos+uv) to a good face must inherit its
    tangent (FixDegenerates) instead of a garbage frame."""
    good, uvg, ng = quad([0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                         [0, 0], [1, 0], [1, 1], [0, 1], [0, 0, 1])
    # Degenerate: all three uvs identical (zero UV area), shares corner
    # (0,0,0)/(0,0) with the good quad.
    bad = np.array([[[0, 0, 0], [0, 0, 1], [0, 1, 1]]], np.float64)
    uvb = np.array([[[0, 0], [0, 0], [0, 0]]], np.float64)
    nb = np.tile([0, 0, 1.0], (1, 3, 1)).reshape(1, 3, 3)
    v = np.concatenate([good, bad])
    uv = np.concatenate([uvg, uvb])
    n = np.concatenate([ng, nb])
    t, s = compute_tangents(v, uv, n)
    np.testing.assert_allclose(t[2, 0], [1, 0, 0], atol=1e-6)
