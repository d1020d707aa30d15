"""Marching-tetrahedra isosurface: analytic sphere golden test."""
import numpy as np

from niceslam_tpu.eval.mesher import marching_tetrahedra, write_ply


def make_sphere_field(R=0.6, n=32, extent=1.0):
    xs = np.linspace(-extent, extent, n)
    Z, Y, X = np.meshgrid(xs, xs, xs, indexing="ij")
    pts = np.stack([X, Y, Z], axis=-1)
    # occupancy-style: positive inside
    field = R - np.sqrt(X**2 + Y**2 + Z**2)
    return field, pts


def test_sphere_isosurface_radius():
    field, pts = make_sphere_field()
    verts, faces = marching_tetrahedra(field, pts, level=0.0)
    assert len(verts) > 200
    assert len(faces) > 200
    r = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(r.mean(), 0.6, atol=0.02)
    assert r.std() < 0.02
    # Faces index valid vertices.
    assert faces.max() < len(verts)


def test_empty_field_yields_empty_mesh():
    field, pts = make_sphere_field()
    verts, faces = marching_tetrahedra(field - 10.0, pts, level=0.0)
    assert len(verts) == 0 and len(faces) == 0


def test_ply_writer(tmp_path):
    field, pts = make_sphere_field(n=16)
    verts, faces = marching_tetrahedra(field, pts)
    colors = np.tile([[1.0, 0.0, 0.0]], (len(verts), 1))
    p = tmp_path / "m.ply"
    write_ply(str(p), verts, faces, colors)
    txt = p.read_text().splitlines()
    assert txt[0] == "ply"
    assert f"element vertex {len(verts)}" in txt[2]


def make_two_blob_field(n=32, extent=1.0):
    xs = np.linspace(-extent, extent, n)
    Z, Y, X = np.meshgrid(xs, xs, xs, indexing="ij")
    pts = np.stack([X, Y, Z], axis=-1)
    big = 0.35 - np.sqrt((X + 0.5) ** 2 + Y**2 + Z**2)
    small = 0.15 - np.sqrt((X - 0.6) ** 2 + Y**2 + Z**2)
    return np.maximum(big, small), pts


def test_largest_components_drops_blob():
    from niceslam_tpu.eval.mesher import largest_components

    field, pts = make_two_blob_field()
    verts, faces = marching_tetrahedra(field, pts)
    v2, f2, _ = largest_components(verts, faces, keep=1)
    assert 0 < len(f2) < len(faces)
    # everything kept belongs to the big (-0.5-centred) blob
    assert (v2[:, 0] < 0.0).all()
    assert f2.max() < len(v2)


def test_cull_unseen_keeps_viewed_blob():
    from niceslam_tpu.core.rays import Intrinsics
    from niceslam_tpu.eval.mesher import cull_unseen

    field, pts = make_two_blob_field()
    verts, faces = marching_tetrahedra(field, pts)
    # one camera at z=-2 looking +z straight at the big blob, narrow fov
    intr = Intrinsics(H=100, W=100, fx=200.0, fy=200.0, cx=50.0, cy=50.0)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [-0.5, 0.0, -2.0]
    v2, f2, _ = cull_unseen(verts, faces, None, c2w[None], intr)
    assert 0 < len(f2) < len(faces)
    assert (v2[:, 0] < 0.2).all()  # the x=+0.6 blob is outside the frustum


def test_depth_test_culls_behind_surface():
    from niceslam_tpu.core.rays import Intrinsics
    from niceslam_tpu.eval.mesher import cull_unseen

    field, pts = make_two_blob_field()
    verts, faces = marching_tetrahedra(field, pts)
    intr = Intrinsics(H=100, W=100, fx=60.0, fy=60.0, cx=50.0, cy=50.0)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.0, 0.0, -2.0]
    # observed depth says every surface is at 1.0m -> vertices beyond
    # ~1.02m from the camera get culled by the depth test
    depths = np.full((1, 100, 100), 1.0, np.float32)
    v2, f2, _ = cull_unseen(
        verts, faces, None, c2w[None], intr, depths=depths,
        bound_scale=1.02, depth_test=True,
    )
    if len(v2):
        assert (v2[:, 2] <= -2.0 + 1.03).all()
    assert len(f2) < len(faces)
