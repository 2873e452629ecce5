"""Multiple directional lights: per-light shadow channels (the SURVEY quirk
table's rebuild decision — the reference loops dir lights over one shared
shadow volume, VolumetricRenderer.cs:538-564 vs cs:346)."""

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import (Camera, DirectionalLights, Geometry, Medium,
                                    RenderConfig, Scene, VolumetricRenderer)

CFG = RenderConfig(volume_width=16, volume_height=12, volume_depth=8,
                   image_width=32, image_height=24, shadow_map_size=32,
                   shadow_mode="raycast")


def _scene(n_dir):
    dirs = [(0.3, -0.7, 0.5), (-0.5, -0.6, 0.2)][:n_dir]
    return Scene.create(
        camera=Camera.create(position=(0, 2, -10), forward=(0, 0, 1),
                             aspect=32 / 24),
        dir_lights=DirectionalLights.create(
            direction=dirs, color=[(1.0, 1.0, 1.0)] * n_dir,
            intensity=[2.0] * n_dir, has_shadow=[True] * n_dir),
        media=(Medium.create(),),
        geometry=Geometry.create(
            planes=[((0, 1, 0), 0.0, (0.2, 0.2, 0.2))],
            spheres=[((0, 3, 0), 1.0, (0.5, 0.5, 0.5))]))


def test_two_dir_lights_two_shadow_channels():
    r = VolumetricRenderer(CFG)
    scene = _scene(2)
    state = r.init_state(2)
    img, aux, new_state = jax.jit(lambda s, sc: r.render_frame(s, sc, 0.0))(
        state, scene)
    assert aux["shadow"].shape[0] == 2
    # different light directions -> different shadow channels
    a, b = np.asarray(aux["shadow"][0]), np.asarray(aux["shadow"][1])
    assert np.abs(a - b).max() > 0.1
    assert new_state.prev_shadow.shape[0] == 2
    assert np.isfinite(np.asarray(img)).all()


def test_two_dir_lights_add_scatter_and_extinction():
    r = VolumetricRenderer(CFG)
    s1 = _scene(1)
    s2 = _scene(2)
    _, aux1, _ = jax.jit(lambda s, sc: r.render_frame(s, sc, 0.0))(
        r.init_state(1), s1)
    _, aux2, _ = jax.jit(lambda s, sc: r.render_frame(s, sc, 0.0))(
        r.init_state(2), s2)
    # the additive per-light decomposition: in-scatter strictly grows, and the
    # reference's per-dir-light extinction quirk (compute:82) doubles sigma_t
    assert float(jnp.mean(aux2["scatter"][..., :3])) > \
        float(jnp.mean(aux1["scatter"][..., :3]))
    np.testing.assert_allclose(np.asarray(jnp.mean(aux2["scatter"][..., 3])),
                               2 * np.asarray(jnp.mean(aux1["scatter"][..., 3])),
                               rtol=1e-5)
