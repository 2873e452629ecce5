"""Multi-device tests on the 8-virtual-CPU-device mesh (conftest)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from volumetricrenderer_tpu import RenderConfig, VolumetricRenderer, demo_scene
from volumetricrenderer_tpu.inverse import FogParams, make_sharded_train_step, \
    render_loss, train_step
from volumetricrenderer_tpu.parallel.sharding import (make_mesh,
                                                      make_sharded_render,
                                                      shard_state)

CFG = RenderConfig(volume_width=16, volume_height=16, volume_depth=8,
                   image_width=48, image_height=32, shadow_map_size=32)


def _scene():
    return demo_scene(aspect=CFG.image_width / CFG.image_height)


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_render_matches_single():
    renderer = VolumetricRenderer(CFG)
    scene = _scene()

    state = renderer.init_state(1)
    img_ref, _, state_ref = jax.jit(
        lambda s, sc: renderer.render_frame(s, sc, 0.0))(state, scene)

    mesh = make_mesh(jax.devices()[:8], axis_name="y")
    sstate = shard_state(renderer.init_state(1), mesh)
    render = make_sharded_render(renderer, mesh)
    img_sh, state_sh = render(sstate, scene, jnp.float32(0.0))

    np.testing.assert_allclose(np.asarray(img_sh), np.asarray(img_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state_sh.prev_accumulation),
                               np.asarray(state_ref.prev_accumulation),
                               rtol=1e-4, atol=1e-5)


def test_sharded_train_step_runs_and_reduces_loss():
    renderer = VolumetricRenderer(CFG)
    scene = _scene()
    mesh = make_mesh(jax.devices()[:8], axis_name="batch")
    params = FogParams.from_medium(scene.media[0])
    optimizer = optax.adam(5e-2)
    opt_state = optimizer.init(params)
    step = make_sharded_train_step(renderer, mesh, optimizer)

    b = 8
    ih, iw = CFG.image_height, CFG.image_width
    cam_pos = jnp.tile(jnp.asarray([[-0.4, 1.9, -15.8]], jnp.float32), (b, 1))
    targets = jnp.full((b, ih, iw, 3), 0.25, jnp.float32)
    scene_colors = jnp.full((b, ih, iw, 3), 0.1, jnp.float32)
    view_depths = jnp.full((b, ih, iw), 60.0, jnp.float32)
    state = renderer.init_state(1)

    losses = []
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, scene, state,
                                       cam_pos, targets, scene_colors,
                                       view_depths)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_inverse_gradients_nonzero():
    renderer = VolumetricRenderer(CFG)
    scene = _scene()
    params = FogParams.from_medium(scene.media[0])
    state = renderer.init_state(1)
    ih, iw = CFG.image_height, CFG.image_width
    target = jnp.full((ih, iw, 3), 0.3, jnp.float32)
    sc = jnp.full((ih, iw, 3), 0.1, jnp.float32)
    vd = jnp.full((ih, iw), 60.0, jnp.float32)
    grads = jax.jit(jax.grad(
        lambda p: render_loss(renderer, p, scene, state, target, sc, vd)))(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_checkpoint_roundtrip(tmp_path):
    from volumetricrenderer_tpu.checkpoint import load_state, save_state
    renderer = VolumetricRenderer(CFG)
    scene = _scene()
    state = renderer.init_state(1)
    _, _, state = jax.jit(lambda s, sc: renderer.render_frame(s, sc, 0.0))(
        state, scene)
    path = str(tmp_path / "ckpt.npz")
    save_state(path, state)
    restored = load_state(path, renderer.init_state(1))
    np.testing.assert_allclose(np.asarray(restored.prev_accumulation),
                               np.asarray(state.prev_accumulation))
    assert int(restored.frame_count) == int(state.frame_count)


def test_zsharded_scan_matches_single_device():
    """Blockwise Z-sharded integration == the single-device scan."""
    import jax.numpy as jnp
    import numpy as np
    from volumetricrenderer_tpu.ops.scatter_scan import accumulate_scan
    from volumetricrenderer_tpu.parallel.sharding import (accumulate_zsharded,
                                                          make_mesh)

    d, h, w = 32, 8, 16
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    scat = jax.random.uniform(k1, (d, h, w, 3))
    ext = jax.random.uniform(k2, (d, h, w)) * 0.3
    steps = jax.random.uniform(k3, (d,)) * 2.0 + 0.1

    ref = accumulate_scan(scat, ext, steps)
    mesh = make_mesh(jax.devices()[:8], axis_name="z")
    out = jax.jit(lambda a, b, c: accumulate_zsharded(a, b, c, mesh))(
        scat, ext, steps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_light_sharded_scatter_matches_single_device():
    """Per-light psum decomposition == the monolithic scatter pass."""
    import dataclasses
    import jax.numpy as jnp
    import numpy as np
    from volumetricrenderer_tpu import (Camera, DirectionalLights, PointLights,
                                        RenderConfig, SpotLights)
    from volumetricrenderer_tpu import froxel as froxel_lib
    from volumetricrenderer_tpu import pipeline
    from volumetricrenderer_tpu.jitter import JITTER_SEQUENCE
    from volumetricrenderer_tpu.parallel.sharding import (
        light_sharded_scatter, make_mesh)

    cfg = RenderConfig(volume_width=16, volume_height=16, volume_depth=8,
                       image_width=32, image_height=32, shadow_mode="raycast")
    cam = Camera.create(position=(0.0, 2.0, -10.0), forward=(0.0, 0.0, 1.0),
                        aspect=1.0)
    n = 8
    angles = np.linspace(0, 2 * np.pi, n, endpoint=False)
    points = PointLights.create(
        position=np.stack([5 * np.cos(angles), np.full(n, 3.0),
                           5 * np.sin(angles) + 5.0], axis=-1),
        color=np.tile([[1.0, 0.6, 0.3]], (n, 1)),
        intensity=np.full(n, 5.0), range=np.full(n, 20.0),
        has_shadow=[False] * n)
    spots = SpotLights.create(
        position=np.stack([4 * np.sin(angles), np.full(n, 5.0),
                           4 * np.cos(angles) + 6.0], axis=-1),
        direction=np.tile([[0.2, -0.9, 0.3]], (n, 1)),
        color=np.tile([[0.3, 0.8, 1.0]], (n, 1)),
        intensity=np.full(n, 4.0), range=np.full(n, 25.0),
        spot_angle_deg=np.full(n, 60.0), has_shadow=[False] * n)
    dirs = DirectionalLights.create(direction=[(0.3, -0.7, 0.5)],
                                    color=[(1, 1, 1)], intensity=[2.0],
                                    has_shadow=[False])

    params = froxel_lib.make_froxel_params(
        cam.fov_y, cam.aspect, cam.near, cfg.volume_distance,
        cfg.depth_distribution, cfg.grid)
    v2w = cam.view_to_world()
    jitter = JITTER_SEQUENCE[0]
    dd, hh, ww = cfg.grid_dhw
    mat_a = jnp.full((dd, hh, ww, 4), 0.01, jnp.float32)
    mat_b = jnp.zeros((dd, hh, ww, 4), jnp.float32).at[..., 0].set(0.3)
    shadow = jnp.ones((1, dd, hh, ww), jnp.float32)

    ref = pipeline.write_scatter_volume(
        cfg, params, v2w, cam.position, jitter, mat_a, mat_b, shadow,
        dirs, points, spots, None, None, None)
    mesh = make_mesh(jax.devices()[:8], axis_name="lights")
    out = jax.jit(lambda: light_sharded_scatter(
        cfg, params, v2w, cam.position, jitter, mat_a, mat_b, shadow,
        dirs, points, spots, mesh))()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
