import numpy as np
import pytest

from fea_tpu.geometry import (
    GeometryError,
    GeometrySampler,
    Polygon,
    convex_hull,
    points_in_polygon,
    polygon_area,
    union_exterior,
)


def test_convex_hull_square():
    pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5]], dtype=float)
    hull = convex_hull(pts)
    assert len(hull) == 4
    assert polygon_area(hull) == pytest.approx(1.0)


def test_point_in_polygon():
    ring = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
    pts = np.array([[1, 1], [3, 1], [2, 1], [-0.1, 0.5]])
    inside = points_in_polygon(pts, ring)
    assert inside.tolist() == [True, False, True, False]  # boundary inclusive
    strict = points_in_polygon(pts, ring, strict=True)
    assert strict.tolist() == [True, False, False, False]


def test_union_two_overlapping_squares():
    a = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
    b = np.array([[1, 1], [3, 1], [3, 3], [1, 3]], dtype=float)
    ring = union_exterior([a, b])
    # Union of two unit-offset squares: L-shaped area 4 + 4 - 1 = 7.
    assert polygon_area(ring) == pytest.approx(7.0)
    assert len(ring) == 8


def test_union_disjoint_raises():
    a = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    b = np.array([[5, 5], [6, 5], [6, 6], [5, 6]], dtype=float)
    with pytest.raises(GeometryError):
        union_exterior([a, b])


def test_normalize_unit_box():
    poly = Polygon(exterior=np.array([[2, 3], [6, 3], [6, 5], [2, 5]], dtype=float))
    norm = poly.normalized()
    minx, miny, maxx, maxy = norm.bounds
    assert (minx, miny) == (0.0, 0.0)
    assert max(maxx, maxy) == pytest.approx(1.0)
    assert maxy == pytest.approx(0.5)


def test_sampler_deterministic_and_valid():
    s1 = GeometrySampler(random_seed=42)
    s2 = GeometrySampler(random_seed=42)
    p1 = s1.generate()
    p2 = s2.generate()
    np.testing.assert_allclose(p1.exterior, p2.exterior)
    assert len(p1.holes) == len(p2.holes)

    minx, miny, maxx, maxy = p1.bounds
    assert minx == pytest.approx(0.0)
    assert miny == pytest.approx(0.0)
    assert max(maxx, maxy) == pytest.approx(1.0)


def test_sampler_many_draws_valid():
    s = GeometrySampler(random_seed=7)
    for _ in range(20):
        poly = s.generate()
        assert polygon_area(poly.exterior) > 0
        for hole in poly.holes:
            assert polygon_area(hole) < 0  # holes stored CW
            # hole vertices strictly inside exterior
            assert points_in_polygon(hole, poly.exterior, strict=True).all()
