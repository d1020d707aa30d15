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
