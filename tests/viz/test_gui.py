"""GUI parity surface, driven headlessly with a fake open3d backend.

open3d cannot be installed here, so these tests substitute a recording
stub for the full module surface the GUIs consume — every widget,
callback, and scene call runs for real; only the C++ rendering layer is
faked. Geometry math itself is pure numpy (viz/geoms.py) and asserted
directly."""
import numpy as np
import pytest

from neddf_tpu.viz.geoms import (
    bounding_box_lines,
    camera_pyramid,
    camera_transform,
    coordinate_grid,
    dataset_scene_geoms,
    image_panel,
    slice_panel,
    visible_range_frustum,
)
from neddf_tpu.viz.gui import DatasetVisualizerGUI, FieldsVisualizerGUI


# ------------------------------------------------------------ fake o3d
class _Obj:
    """Attribute sink standing in for any open3d object."""

    def __init__(self, *a, **k):
        self.args = a

    def __call__(self, *a, **k):
        return _Obj(*a)

    def __getattr__(self, name):
        def method(*a, **k):
            return _Obj(*a)

        return method

    def __setattr__(self, name, value):
        object.__setattr__(self, name, value)


class _Scene:
    def __init__(self, *a):
        self.geoms = {}

    def set_background(self, *_):
        pass

    def clear_geometry(self):
        self.geoms.clear()

    def add_geometry(self, name, geom, mat):
        self.geoms[name] = (geom, mat)


class _Widget(_Obj):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.children = []
        self.callbacks = {}

    def add_child(self, c):
        self.children.append(c)

    def add_fixed(self, *_):
        pass

    def add_stretch(self):
        pass

    def set_is_open(self, *_):
        pass

    def add_item(self, item):
        self.children.append(item)

    def set_limits(self, *_):
        pass

    def set_value(self, *_):
        pass

    def __getattr__(self, name):
        if name.startswith("set_on_"):
            def register(cb):
                self.callbacks[name[7:]] = cb

            return register
        return super().__getattr__(name)


class _Theme:
    font_size = 14


class _Window:
    def __init__(self, *a):
        self.theme = _Theme()
        self.renderer = _Obj()
        self.content_rect = _Obj()
        self.children = []

    def add_child(self, c):
        self.children.append(c)

    def set_on_layout(self, cb):
        self.on_layout = cb


class _App:
    def create_window(self, *a):
        return _Window()


class _SliderType:
    DOUBLE = 0


class _NEType:
    class Type:
        INT = 0
        DOUBLE = 1


def _make_fake_o3d():
    import types

    o3d = types.SimpleNamespace()
    o3d.geometry = types.SimpleNamespace(
        LineSet=_Obj, TriangleMesh=_Obj, Image=_Obj
    )
    o3d.utility = types.SimpleNamespace(
        Vector3dVector=_Obj, Vector2iVector=_Obj, Vector3iVector=_Obj,
        Vector2dVector=_Obj, IntVector=_Obj,
    )
    gui = types.SimpleNamespace(
        Application=types.SimpleNamespace(instance=_App()),
        SceneWidget=lambda: _Obj(),
        Vert=_Widget,
        Margins=_Obj,
        CollapsableVert=lambda *a, **k: _Widget(),
        Checkbox=lambda *a: _Widget(),
        Combobox=lambda: _Widget(),
        Slider=_make_slider(),
        NumberEdit=_make_numberedit(),
        Label=lambda *a: _Widget(),
        Button=lambda *a: _Widget(),
        Rect=_Obj,
    )
    rendering = types.SimpleNamespace(
        Open3DScene=_Scene, MaterialRecord=_Obj
    )
    o3d.visualization = types.SimpleNamespace(gui=gui, rendering=rendering)
    return o3d


def _make_slider():
    def factory(*a):
        w = _Widget()
        return w

    factory.DOUBLE = 0
    return factory


def _make_numberedit():
    def factory(*a):
        return _Widget()

    factory.Type = _NEType.Type
    return factory


# -------------------------------------------------------- fake trainer
class _FakeDataset:
    image_width = 16
    image_height = 12

    def __len__(self):
        return 3

    def __getitem__(self, i):
        return {
            "camera_calib_params": np.array([20.0, 20.0, 8.0, 6.0]),
            "camera_params": np.array([0.1 * i, 0, 0, 0, 0, 4.0]),
            "rgb_images": np.full((12, 16, 3), 100 + i, np.float32),
        }


class _FakeRender:
    def render_field_slice(self, params, slice_t, render_size,
                           render_resolution):
        img = np.full((render_resolution, render_resolution, 3),
                      int(127 + 100 * slice_t) % 255, np.uint8)
        return {"distance": img, "density": img.copy()}


class _FakeTrainer:
    dataset = _FakeDataset()
    params = {}
    neural_render = _FakeRender()


def _mesh_fn(resolution, threshold):
    v = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]]) * (resolution / 64.0)
    return v, np.array([[0, 1, 2]])


# --------------------------------------------------------------- tests
def test_geoms_shapes():
    vtx, edges, colors = coordinate_grid(3)
    assert vtx.shape == (28, 3) and edges.shape == (14, 2)
    v, e, c = bounding_box_lines(np.array([[-1, 1], [-1, 1], [-1, 1.0]]))
    assert v.shape == (8, 3) and e.shape == (12, 2) and c.shape == (12, 3)
    cam = np.array([0.0, 0, 0, 0, 0, 4.0])
    calib = np.array([20.0, 20.0, 8.0, 6.0])
    pv, pe, pc = camera_pyramid(calib, 16, 12, cam)
    assert pv.shape == (5, 3)
    # apex sits at the camera position
    np.testing.assert_allclose(pv[0], [0, 0, 4.0])
    rv, re_, rc = visible_range_frustum(calib, 16, 12, cam, 2.0, 6.0)
    assert rv.shape == (8, 3)
    # near plane at z = 4-2, far at 4-6 (camera looks along -z)
    np.testing.assert_allclose(rv[:4, 2], 2.0)
    np.testing.assert_allclose(rv[4:, 2], -2.0)


def test_image_panel_texture_orientation():
    cam = np.array([0.0, 0, 0, 0, 0, 4.0])
    calib = np.array([20.0, 20.0, 8.0, 6.0])
    bgr = np.zeros((12, 16, 3), np.float32)
    bgr[0, 0, 0] = 255  # top-left BLUE
    vtx, faces, uvs, rgb = image_panel(calib, 16, 12, cam, bgr)
    assert rgb.dtype == np.uint8
    # flipud + BGR->RGB: blue ends bottom-left in channel 2
    assert rgb[-1, 0, 2] == 255 and rgb[-1, 0, 0] == 0


def test_slice_panel_tracks_z():
    img = np.zeros((8, 8, 3), np.uint8)
    vtx, faces, uvs, rgb = slice_panel(0.35, img)
    np.testing.assert_allclose(vtx[:, 2], 0.35)


def test_camera_transform_roundtrip():
    p = np.array([0.1, -0.2, 0.3, 1.0, 2.0, 3.0])
    m = camera_transform(p)
    assert m.shape == (4, 4)
    np.testing.assert_allclose(m[:3, 3], [1, 2, 3])
    np.testing.assert_allclose(m[:3, :3] @ m[:3, :3].T, np.eye(3), atol=1e-12)


def test_dataset_scene_geoms_counts():
    ds = _FakeDataset()
    out = dataset_scene_geoms(ds, show_images=True, show_ranges=True)
    assert len(out["pyramids"]) == 3
    assert len(out["images"]) == 3
    assert len(out["ranges"]) == 3


def test_fields_gui_full_surface():
    o3d = _make_fake_o3d()
    gui = FieldsVisualizerGUI(_FakeTrainer(), _mesh_fn, backend=o3d)
    scene = gui.scene.scene
    # initial draw: grid + 3 pyramids + slice + mesh
    assert "coordinate_grid" in scene.geoms
    assert "slice_plane" in scene.geoms
    assert "meshed_field" in scene.geoms
    assert sum(1 for k in scene.geoms if k.endswith("_pyramid")) == 3
    assert not any(k.endswith("_rgb") for k in scene.geoms)

    # toggles re-render with extra geometry
    gui._on_show_rgb_image(True)
    assert sum(1 for k in scene.geoms if k.endswith("_rgb")) == 3
    gui._on_show_bounding_box(True)
    assert "bounding_box" in scene.geoms
    gui._on_show_visible_range(True)
    assert sum(1 for k in scene.geoms if k.endswith("_range")) == 3

    # the movable slice plane re-renders live at the new z
    gui._on_slice_parameter_slider(0.5)
    assert gui.slice_parameter == 0.5
    # field selection falls back over available outputs
    gui._on_slice_fieldname_selection("density", 1)
    assert gui.slice_field_name == "density"

    # visible-range sliders clamp near <= far
    gui._on_visible_range_far_slider(3.0)
    gui._on_visible_range_near_slider(5.0)
    assert gui.visible_range[0] <= gui.visible_range[1]

    # re-meshing applies new resolution
    gui._on_meshing_resolution(128)
    gui._on_meshing()
    assert gui.mesh_vertices.max() == pytest.approx(2.0)


def test_dataset_gui_surface():
    o3d = _make_fake_o3d()
    gui = DatasetVisualizerGUI(_FakeDataset(), backend=o3d)
    scene = gui.scene.scene
    assert sum(1 for k in scene.geoms if k.endswith("_pyramid")) == 3
    assert sum(1 for k in scene.geoms if k.endswith("_rgb")) == 3
    gui._on_show_rgb_image(False)
    assert not any(k.endswith("_rgb") for k in scene.geoms)
    gui._on_show_visible_range(True)
    assert sum(1 for k in scene.geoms if k.endswith("_range")) == 3
