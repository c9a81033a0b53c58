import numpy as np
import pytest

from fea_tpu.geometry import GeometrySampler, Polygon
from fea_tpu.mesh import (
    Mesh,
    read_medit_mesh,
    read_vtk,
    triangulate,
    triangulate_polygon,
    write_medit_mesh,
    write_vtk,
)

UNIT_SQUARE = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])


def tri_areas(coords, tris):
    a = coords[tris[:, 0]]
    b = coords[tris[:, 1]]
    c = coords[tris[:, 2]]
    return 0.5 * ((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]))


def test_unit_square_coarse():
    mesh = triangulate(UNIT_SQUARE, mesh_size=0.1)
    assert mesh.num_nodes > 50
    areas = tri_areas(mesh.coords, mesh.triangles)
    assert (areas > 0).all()  # CCW
    assert areas.sum() == pytest.approx(1.0, abs=1e-9)
    # corner contract: first 4 nodes are the polygon corners in order
    np.testing.assert_allclose(mesh.coords[:4], UNIT_SQUARE)
    assert [tuple(e) for e in mesh.ring_edges[0]] == [(0, 1), (1, 2), (2, 3), (3, 0)]


def test_unit_square_fine_target_size():
    mesh = triangulate(UNIT_SQUARE, mesh_size=0.02)
    areas = tri_areas(mesh.coords, mesh.triangles)
    assert areas.sum() == pytest.approx(1.0, abs=1e-9)
    # edge lengths concentrated near mesh_size
    e = np.concatenate(
        [
            mesh.coords[mesh.triangles[:, i]] - mesh.coords[mesh.triangles[:, (i + 1) % 3]]
            for i in range(3)
        ]
    )
    lengths = np.linalg.norm(e, axis=1)
    assert np.median(lengths) == pytest.approx(0.02, rel=0.35)
    assert lengths.max() < 0.08


def test_square_with_hole():
    hole = np.array([[0.4, 0.4], [0.4, 0.6], [0.6, 0.6], [0.6, 0.4]])  # CW
    mesh = triangulate(UNIT_SQUARE, [hole], mesh_size=0.05)
    areas = tri_areas(mesh.coords, mesh.triangles)
    assert areas.sum() == pytest.approx(1.0 - 0.04, abs=1e-9)
    # no node strictly inside the hole
    inside = (
        (mesh.coords[:, 0] > 0.41)
        & (mesh.coords[:, 0] < 0.59)
        & (mesh.coords[:, 1] > 0.41)
        & (mesh.coords[:, 1] < 0.59)
    )
    assert not inside.any()
    # hole corners follow the exterior corners in node numbering
    np.testing.assert_allclose(mesh.coords[4:8], hole)


def test_nodes_on_edge_predicate():
    mesh = triangulate(UNIT_SQUARE, mesh_size=0.1)
    bottom = mesh.nodes_on_edge((0, 1))
    ys = mesh.coords[bottom][:, 1]
    assert (np.abs(ys) < 1e-9).all()
    assert len(bottom) >= 11


def test_random_plates_mesh():
    sampler = GeometrySampler(random_seed=3)
    for _ in range(3):
        poly = sampler.generate()
        mesh = triangulate_polygon(poly, mesh_size=0.05)
        areas = tri_areas(mesh.coords, mesh.triangles)
        assert (areas > 0).all()
        assert mesh.num_triangles > 10


def test_medit_roundtrip(tmp_path):
    mesh = triangulate(UNIT_SQUARE, mesh_size=0.2)
    p = str(tmp_path / "part.mesh")
    write_medit_mesh(p, mesh.coords, mesh.triangles)
    coords, tris = read_medit_mesh(p)
    np.testing.assert_allclose(coords, mesh.coords, atol=1e-12)
    np.testing.assert_array_equal(tris, mesh.triangles)


def test_vtk_roundtrip(tmp_path):
    mesh = triangulate(UNIT_SQUARE, mesh_size=0.2)
    u = np.random.default_rng(0).normal(size=(mesh.num_nodes, 2))
    p = str(tmp_path / "domain.0.vtk")
    write_vtk(p, mesh.coords, mesh.triangles, point_data={"u": u})
    data = read_vtk(p)
    np.testing.assert_allclose(data["points"][:, :2], mesh.coords, atol=1e-12)
    np.testing.assert_array_equal(data["cells"], mesh.triangles)
    np.testing.assert_allclose(data["u"][:, :2], u, atol=1e-12)


def test_read_reference_cantilever_fixture():
    coords, tris = read_medit_mesh(
        "/root/reference/applications/cantilever/cantilever.mesh"
    )
    assert coords.shape == (2464, 2)
    assert tris.shape[0] > 4000
    data = read_vtk("/root/reference/applications/cantilever/cantilever.vtk")
    assert data["points"].shape == (2464, 3)
    assert "u" in data
    assert data["u"].shape == (2464, 3)
    # sanity: tip deflection is downward
    assert data["u"][:, 1].min() < -1e-4
