"""SceneBuilder registration API tests."""

import jax
import numpy as np

from volumetricrenderer_tpu import Camera, Medium, RenderConfig, VolumetricRenderer
from volumetricrenderer_tpu.models.builder import SceneBuilder

CFG = RenderConfig(volume_width=16, volume_height=12, volume_depth=8,
                   image_width=32, image_height=24, shadow_map_size=32)


def _builder():
    b = SceneBuilder(Camera.create(position=(0, 2, -10), forward=(0, 0, 1),
                                   aspect=32 / 24))
    b.add_plane((0, 1, 0), 0.0)
    b.add_medium(Medium.create())
    return b


def test_register_unregister_lights():
    b = _builder()
    sun = b.add_directional_light((0.3, -0.7, 0.5), (1, 1, 1), 2.0)
    p1 = b.add_point_light((0, 3, 0), (1, 0, 0), 5.0, 20.0)
    p2 = b.add_point_light((2, 3, 0), (0, 1, 0), 5.0, 20.0)
    s1 = b.add_spot_light((0, 5, 0), (0, -1, 0), (1, 1, 0), 6.0, 30.0, 60.0)
    scene = b.build()
    assert scene.dir_lights.count == 1
    assert scene.point_lights.count == 2
    assert scene.spot_lights.count == 1

    b.remove_light(p1)
    scene = b.build()
    assert scene.point_lights.count == 1
    np.testing.assert_allclose(np.asarray(scene.point_lights.position[0]),
                               [2, 3, 0])
    b.remove_light(sun)
    b.remove_light(s1)
    scene = b.build()
    assert scene.dir_lights.count == 0 and scene.spot_lights.count == 0


def test_built_scene_renders():
    b = _builder()
    b.add_directional_light((0.3, -0.7, 0.5), (1, 1, 1), 2.0, has_shadow=False)
    b.add_sphere((0, 1, 5), 1.0)
    scene = b.build()
    r = VolumetricRenderer(CFG)
    img, _, _ = jax.jit(lambda s, sc: r.render_frame(s, sc, 0.0))(
        r.init_state(1), scene)
    assert np.isfinite(np.asarray(img)).all()


def test_media_and_geometry_removal():
    b = _builder()
    m2 = b.add_medium(Medium.create(phase_g=0.5))
    g = b.add_box((0, 0, 0), (1, 1, 1))
    assert len(b.build().media) == 2
    b.remove_medium(m2)
    b.remove_geometry(g)
    scene = b.build()
    assert len(scene.media) == 1
    assert scene.geometry.box_min.shape[0] == 0


def test_bfloat16_volume_storage():
    import dataclasses
    import jax.numpy as jnp
    cfg = dataclasses.replace(CFG, volume_dtype="bfloat16")
    b = _builder()
    b.add_directional_light((0.3, -0.7, 0.5), (1, 1, 1), 2.0, has_shadow=False)
    scene = b.build()
    r = VolumetricRenderer(cfg)
    state = r.init_state(1)
    assert state.prev_accumulation.dtype == jnp.bfloat16
    img, _, s2 = jax.jit(lambda s, sc: r.render_frame(s, sc, 0.0))(state, scene)
    img2, _, _ = jax.jit(lambda s, sc: r.render_frame(s, sc, 0.0))(s2, scene)
    assert np.isfinite(np.asarray(img2)).all()
    assert s2.prev_accumulation.dtype == jnp.bfloat16
