"""Marching-tetrahedra + mesh-export tests.

Mirrors the reference's meshing path (fields_visualizer.py:528-566):
voxelized distance field -> iso-surface at a threshold -> .dae export.
Here verified analytically on a sphere SDF.
"""
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from neddf_tpu.viz import (
    compute_vertex_normals,
    export_dae,
    export_obj,
    marching_tetrahedra,
)


@pytest.fixture()
def sphere_volume():
    res = 33
    line = np.linspace(-1.0, 1.0, res)
    x, y, z = np.meshgrid(line, line, line, indexing="ij")
    dist = np.sqrt(x**2 + y**2 + z**2)
    return dist, res


def test_sphere_isosurface_vertices_on_sphere(sphere_volume):
    dist, res = sphere_volume
    level = 0.6
    verts, tris = marching_tetrahedra(dist, level)
    assert verts.shape[0] > 100
    assert tris.shape[0] > 100
    assert tris.min() >= 0 and tris.max() < verts.shape[0]
    # map index space back to [-1, 1] coordinates
    world = verts / (res - 1) * 2.0 - 1.0
    radii = np.linalg.norm(world, axis=1)
    # linear interpolation error on a 33-grid sphere is well under a cell
    assert np.abs(radii - level).max() < 0.01


def test_sphere_mesh_area_matches_analytic(sphere_volume):
    dist, res = sphere_volume
    level = 0.6
    verts, tris = marching_tetrahedra(dist, level)
    world = verts / (res - 1) * 2.0 - 1.0
    a = world[tris[:, 1]] - world[tris[:, 0]]
    b = world[tris[:, 2]] - world[tris[:, 0]]
    area = 0.5 * np.linalg.norm(np.cross(a, b), axis=1).sum()
    analytic = 4.0 * np.pi * level**2
    assert abs(area - analytic) / analytic < 0.03


def test_empty_and_full_volumes():
    vol = np.zeros((8, 8, 8))
    verts, tris = marching_tetrahedra(vol, 0.5)
    assert verts.shape == (0, 3) and tris.shape == (0, 3)
    verts, tris = marching_tetrahedra(vol + 1.0, 0.5)
    assert verts.shape == (0, 3) and tris.shape == (0, 3)


def test_vertex_welding(sphere_volume):
    dist, _ = sphere_volume
    verts, tris = marching_tetrahedra(dist, 0.6)
    # each interpolated edge vertex appears exactly once
    assert np.unique(np.round(verts, 9), axis=0).shape[0] == verts.shape[0]


def test_normals_unit_and_outward(sphere_volume):
    dist, res = sphere_volume
    verts, tris = marching_tetrahedra(dist, 0.6)
    normals = compute_vertex_normals(verts, tris)
    used = np.unique(tris)
    norms = np.linalg.norm(normals[used], axis=1)
    assert np.allclose(norms, 1.0, atol=1e-6)
    # consistent orientation: normals align with a single radial sign
    world = verts[used] / (res - 1) * 2.0 - 1.0
    radial = world / np.linalg.norm(world, axis=1, keepdims=True)
    dots = np.sum(normals[used] * radial, axis=1)
    assert np.abs(dots.mean()) > 0.9


def test_export_obj_and_dae_roundtrip(tmp_path, sphere_volume):
    dist, _ = sphere_volume
    verts, tris = marching_tetrahedra(dist, 0.6)

    obj_path = tmp_path / "m.obj"
    export_obj(obj_path, verts, tris)
    lines = obj_path.read_text().splitlines()
    assert sum(1 for l in lines if l.startswith("v ")) == verts.shape[0]
    assert sum(1 for l in lines if l.startswith("f ")) == tris.shape[0]

    dae_path = tmp_path / "m.dae"
    export_dae(dae_path, verts, tris)
    root = ET.parse(dae_path).getroot()
    ns = {"c": "http://www.collada.org/2005/11/COLLADASchema"}
    arr = root.find(".//c:float_array", ns)
    assert arr is not None
    assert int(arr.get("count")) == verts.size
    p = root.find(".//c:triangles/c:p", ns)
    assert len(p.text.split()) == tris.size
