"""Native (C++/ctypes) ingestion core == numpy reference, bit-exactly.

native/ingest.cpp mirrors models/voxelize.py (same double-precision sample
positions, float32 density accumulation order, first-max argmax, float64
slab-fill compares), so these tests assert EQUALITY of the occupancy grids
and the greedy box covers — any drift is a bug in the mirror, not tolerance
noise. Skips (with the numpy fallback still exercised) if g++ is missing.
"""

import numpy as np
import pytest

from volumetricrenderer_tpu.io import native
from volumetricrenderer_tpu.models import voxelize
from volumetricrenderer_tpu.models.mesh import procedural_tree

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="no native toolchain")


def _random_soup(rng, n_tris=200, spread=4.0):
    verts = (rng.random((n_tris * 3, 3), dtype=np.float32) - 0.5) * spread
    tris = np.arange(n_tris * 3, dtype=np.int32).reshape(n_tris, 3)
    return verts, tris


@needs_native
def test_voxelize_matches_numpy_exactly():
    rng = np.random.default_rng(7)
    for trial in range(3):
        verts, tris = _random_soup(rng, n_tris=50 + 70 * trial)
        occ_n, org_n, vox_n = native.voxelize_triangles(verts, tris, res=18)
        occ_p, org_p, vox_p = voxelize.voxelize_triangles(verts, tris, res=18)
        assert occ_n.shape == occ_p.shape
        np.testing.assert_array_equal(occ_n, occ_p)
        np.testing.assert_array_equal(org_n, org_p)
        np.testing.assert_array_equal(vox_n, vox_p)


@needs_native
def test_greedy_boxes_match_numpy_exactly():
    rng = np.random.default_rng(3)
    for trial in range(3):
        verts, tris = _random_soup(rng, n_tris=80 + 60 * trial)
        occ, org, vox = voxelize.voxelize_triangles(verts, tris, res=16)
        bn = native.boxes_from_occupancy(occ, org, vox, max_boxes=6)
        bp = voxelize.boxes_from_occupancy(occ, org, vox, max_boxes=6)
        assert len(bn) == len(bp)
        for (n0, n1, no), (p0, p1, po) in zip(bn, bp):
            np.testing.assert_array_equal(n0, np.asarray(p0, np.float32))
            np.testing.assert_array_equal(n1, np.asarray(p1, np.float32))
            assert no == np.float32(po), (no, po)


@needs_native
def test_tree_mesh_end_to_end_matches():
    """The actual bake path (mesh_to_boxes) on a tree mesh."""
    tree = procedural_tree(height=6.0)
    verts = np.asarray(tree.verts, np.float32)
    tris = np.asarray(tree.tris, np.int32)
    bn = native.mesh_to_boxes(verts, tris, res=20, max_boxes=8)
    bp = voxelize.mesh_to_boxes(verts, tris, res=20, max_boxes=8)
    assert len(bn) == len(bp) > 0
    for (n0, n1, no), (p0, p1, po) in zip(bn, bp):
        np.testing.assert_array_equal(n0, np.asarray(p0, np.float32))
        np.testing.assert_array_equal(n1, np.asarray(p1, np.float32))
        assert no == np.float32(po)


@needs_native
def test_float64_verts_match_numpy_exactly():
    """f64 verts keep full precision in the native path (no f32 pre-round):
    samples near voxel boundaries must land in the same cells as the numpy
    fallback, which computes from the caller's full-precision values."""
    rng = np.random.default_rng(11)
    verts = (rng.random((90, 3)) - 0.5) * 4.0       # float64, odd mantissas
    verts += rng.random((90, 3)) * 1e-9             # sub-f32-ulp detail
    tris = np.arange(90, dtype=np.int32).reshape(30, 3)
    occ_n, org_n, vox_n = native.voxelize_triangles(verts, tris, res=17)
    occ_p, org_p, vox_p = voxelize.voxelize_triangles(verts, tris, res=17)
    np.testing.assert_array_equal(occ_n, occ_p)
    np.testing.assert_array_equal(org_n, org_p)
    np.testing.assert_array_equal(vox_n, vox_p)


@needs_native
def test_degenerate_planar_pad0_matches_numpy():
    """pad=0 on an exactly-planar mesh: step -> 0, sample-count ratio -> inf.
    numpy's int64 cast of inf gives INT64_MIN -> clip to 1 sample; the native
    core must take the same branch instead of a UB int32 cast."""
    rng = np.random.default_rng(5)
    verts = (rng.random((45, 3)) - 0.5) * 3.0
    verts[:, 2] = 0.25                               # exactly planar in z
    tris = np.arange(45, dtype=np.int32).reshape(15, 3)
    with np.errstate(invalid="ignore", divide="ignore"):
        occ_p, org_p, vox_p = voxelize.voxelize_triangles(
            verts, tris, res=14, pad=0.0)
        occ_n, org_n, vox_n = native.voxelize_triangles(
            verts, tris, res=14, pad=0.0)
    np.testing.assert_array_equal(occ_n, occ_p)
    np.testing.assert_array_equal(org_n, org_p)
    np.testing.assert_array_equal(vox_n, vox_p)


def test_fallback_works_without_native(monkeypatch):
    """With the library unavailable the API transparently runs numpy."""
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_LIB_TRIED", True)
    verts, tris = _random_soup(np.random.default_rng(0), n_tris=30)
    occ, org, vox = native.voxelize_triangles(verts, tris, res=12)
    occ_p, org_p, vox_p = voxelize.voxelize_triangles(verts, tris, res=12)
    np.testing.assert_array_equal(occ, occ_p)
    boxes = native.mesh_to_boxes(verts, tris, res=12, max_boxes=4)
    assert len(boxes) > 0
