"""Declarative scene format (io/scene_io.py) — the reference's serialized
scene surface (Assets/Scenes/VolumetricRenderer.unity:547-685) as JSON."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu.io.scene_io import (load_scene, save_scene,
                                                scene_from_dict,
                                                scene_to_dict)
from volumetricrenderer_tpu.models.mesh import TriMesh
from volumetricrenderer_tpu.models.scene import (Scene, benchmark_scene,
                                                 demo_scene)


def _assert_scene_equal(a: Scene, b: Scene, exact=True):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, f"pytree structure differs:\n{ta}\n{tb}"
    for xa, xb in zip(la, lb):
        xa, xb = np.asarray(xa), np.asarray(xb)
        assert xa.dtype == xb.dtype and xa.shape == xb.shape
        if exact:
            np.testing.assert_array_equal(xa, xb)
        else:
            np.testing.assert_allclose(xa, xb, atol=1e-6)


def test_demo_scene_roundtrip_exact(tmp_path):
    scene = demo_scene()
    path = tmp_path / "demo.json"
    save_scene(path, scene)
    loaded = load_scene(path)
    _assert_scene_equal(scene, loaded)


def test_benchmark_scene_roundtrip_exact(tmp_path):
    scene = benchmark_scene(num_local_lights=4, noise_mode="procedural")
    loaded = scene_from_dict(scene_to_dict(scene))
    _assert_scene_equal(scene, loaded)


def test_mesh_scene_roundtrip_exact():
    mesh = TriMesh.create(
        verts=[(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1)],
        tris=[(0, 1, 2), (0, 2, 3)], albedo=(0.5, 0.4, 0.3))
    scene = demo_scene()
    scene = Scene.create(camera=scene.camera, dir_lights=scene.dir_lights,
                         media=scene.media, geometry=scene.geometry,
                         ambient=(0.1, 0.1, 0.1), mesh=mesh)
    loaded = scene_from_dict(scene_to_dict(scene))
    _assert_scene_equal(scene, loaded)
    assert loaded.mesh.tris.dtype == jnp.int32


def test_roundtrip_through_json_text():
    # json.dumps/loads (not just dict identity): floats survive the decimal
    # round trip exactly (f32 values are exactly representable as doubles)
    scene = demo_scene()
    loaded = scene_from_dict(json.loads(json.dumps(scene_to_dict(scene))))
    _assert_scene_equal(scene, loaded)


def test_authored_dialect_minimal():
    d = {
        "camera": {"position": (0, 2, -10), "forward": (0, 0, 1),
                   "fov_y_deg": 60.0, "aspect": 16 / 9},
        "dir_lights": [{"direction": (0.3, -0.7, 0.5),
                        "color": (1.0, 0.9, 0.8), "intensity": 2.0}],
        "spot_lights": [{"position": (0, 5, 0), "direction": (0, -1, 0),
                         "color": (1, 0, 0), "intensity": 6.0,
                         "range": 30.0, "spot_angle_deg": 60.0}],
        "media": [{"absorption": 0.19, "phase_g": 0.3}],
        "geometry": {"planes": [((0, 1, 0), 0.0, (0.2, 0.25, 0.2))],
                     "spheres": [((0, 1, 5), 1.0, (0.5, 0.5, 0.5))]},
        "ambient": (0.05, 0.05, 0.06),
    }
    scene = scene_from_dict(d)
    assert scene.dir_lights.count == 1
    assert scene.spot_lights.count == 1
    assert scene.point_lights.count == 0
    # authored direction was normalized by create()
    np.testing.assert_allclose(
        float(jnp.linalg.norm(scene.dir_lights.direction[0])), 1.0,
        atol=1e-6)
    # authored dialect re-serializes to the exact dialect and round-trips
    _assert_scene_equal(scene, scene_from_dict(scene_to_dict(scene)))


def test_authored_scene_renders():
    import dataclasses as dc

    from volumetricrenderer_tpu import DEMO_CONFIG, VolumetricRenderer
    cfg = dc.replace(DEMO_CONFIG, volume_width=16, volume_height=12,
                     volume_depth=8, image_width=64, image_height=48,
                     shadow_map_size=32)
    scene = scene_from_dict({
        "camera": {"position": (0, 2, -10), "forward": (0, 0, 1),
                   "aspect": 64 / 48},
        "dir_lights": [{"direction": (0.3, -0.7, 0.5),
                        "color": (1.0, 0.9, 0.8), "intensity": 2.0}],
        "media": [{"absorption": 0.19, "phase_g": 0.3}],
        "geometry": {"planes": [((0, 1, 0), 0.0, (0.2, 0.25, 0.2))]},
    })
    r = VolumetricRenderer(cfg)
    state = r.init_state(scene.dir_lights.count)
    img, _, _ = jax.jit(lambda s, st: r.render_frame(st, s, 0.0))(scene,
                                                                  state)
    assert np.isfinite(np.asarray(img)).all()


def test_unknown_key_raises(tmp_path):
    import pytest
    with pytest.raises(ValueError, match="unknown scene keys"):
        scene_from_dict({"camera": {}, "tpyo": 1})


def test_post_config_roundtrip():
    from volumetricrenderer_tpu.io.scene_io import (load_scene,
                                                    post_from_dict,
                                                    post_to_dict, save_scene)
    from volumetricrenderer_tpu.post import PostConfig
    cfg = PostConfig(exposure=1.2, bloom_strength=0.3, fxaa=True,
                     dithering=True, lens_distortion=12.0,
                     grade_lift=(0.02, 0.0, -0.01), auto_exposure=True)
    back = post_from_dict(post_to_dict(cfg))
    assert back == cfg
    import tempfile, os
    scene = demo_scene()
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "s.json")
        save_scene(p, scene, post_cfg=cfg)
        s2, p2 = load_scene(p, with_post=True)
        assert p2 == cfg
        _assert_scene_equal(scene, s2)
        # plain load ignores the post section
        _assert_scene_equal(scene, load_scene(p))


def test_post_unknown_key_raises():
    import pytest
    from volumetricrenderer_tpu.io.scene_io import post_from_dict
    with pytest.raises(ValueError, match="unknown post keys"):
        post_from_dict({"explosure": 2.0})


def test_authored_heterogeneous_optional_keys():
    """Entries may set optional per-light keys (has_shadow, multipliers) on
    only SOME lights; missing entries get create()'s per-light default
    (round-5 advisor fix — this used to raise ValueError)."""
    import pytest
    scene = scene_from_dict({
        "camera": {"position": (0, 2, -10), "forward": (0, 0, 1),
                   "aspect": 16 / 9},
        "dir_lights": [
            {"direction": (0.3, -0.7, 0.5), "color": (1, 1, 1),
             "intensity": 2.0, "has_shadow": False},
            {"direction": (0, -1, 0), "color": (1, 1, 1),
             "intensity": 1.0},                     # -> dir default True
        ],
        "point_lights": [
            {"position": (0, 5, 0), "color": (1, 0, 0), "intensity": 7.0,
             "range": 50.0, "has_shadow": True, "shadow_strength": 0.5},
            {"position": (3, 5, 0), "color": (0, 1, 0), "intensity": 7.0,
             "range": 50.0},            # -> point defaults False / 1.0
        ],
        "media": [{"absorption": 0.19, "phase_g": 0.3}],
    })
    np.testing.assert_array_equal(np.asarray(scene.dir_lights.has_shadow),
                                  [False, True])
    np.testing.assert_array_equal(np.asarray(scene.point_lights.has_shadow),
                                  [True, False])
    np.testing.assert_allclose(
        np.asarray(scene.point_lights.shadow_strength), [0.5, 1.0])
    np.testing.assert_allclose(
        np.asarray(scene.point_lights.intensity_multiplier), [1.0, 1.0])
    # a REQUIRED key missing on some entries is still an authoring error
    with pytest.raises(ValueError, match="required key 'range'"):
        scene_from_dict({
            "camera": {"position": (0, 0, 0), "forward": (0, 0, 1),
                       "aspect": 1.0},
            "point_lights": [
                {"position": (0, 5, 0), "color": (1, 0, 0),
                 "intensity": 7.0, "range": 50.0},
                {"position": (3, 5, 0), "color": (0, 1, 0),
                 "intensity": 7.0},
            ],
        })
