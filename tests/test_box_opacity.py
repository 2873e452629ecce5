"""Fractional box opacity (SPEC "Occluder opacity" — the alpha-tested
foliage stand-in): XLA / Pallas / oracle agreement and end-to-end use."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import (Camera, DirectionalLights, Geometry,
                                    Medium, PointLights, RenderConfig, Scene,
                                    SpotLights, VolumetricRenderer)
from volumetricrenderer_tpu.ops import raycast

from oracle.oracle import occluded_raycast


def _geom(frac: bool):
    op = 0.6 if frac else 1.0
    return Geometry.create(
        planes=[((0.1, 1.0, 0.05), -0.2, (0.2, 0.2, 0.2))],
        spheres=[((0.5, 2.0, 3.0), 1.1, (0.5, 0.5, 0.5))],
        boxes=[((-3.0, 0.0, 1.0), (-1.0, 2.5, 3.0), (0.4, 0.4, 0.4), op),
               ((-2.0, 1.0, 0.0), (0.5, 3.5, 2.0), (0.4, 0.4, 0.4), 0.9
                if frac else 1.0),
               ((1.0, 0.0, 4.0), (2.0, 1.0, 5.0), (0.4, 0.4, 0.4))])


def _rays(n=4096, seed=3):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return pts, d


def _oracle_geom(g: Geometry):
    return dict(plane_normal=np.asarray(g.plane_normal),
                plane_d=np.asarray(g.plane_d),
                sphere_center=np.asarray(g.sphere_center),
                sphere_radius=np.asarray(g.sphere_radius),
                box_min=np.asarray(g.box_min),
                box_max=np.asarray(g.box_max),
                box_opacity=np.asarray(g.box_opacity))


def test_fractional_occluded_matches_oracle():
    g = _geom(frac=True)
    assert g.box_fractional
    pts, d = _rays()
    got = np.asarray(jax.jit(
        lambda p, v: raycast.occluded(g, p, v, jnp.float32(8.0)))(pts, d))
    ref = occluded_raycast(_oracle_geom(g), pts.astype(np.float64),
                           d.astype(np.float64), 8.0)
    # knife-edge rays may differ between f32 and f64 intersection tests
    assert float(np.mean(np.abs(got - ref) > 1e-5)) < 2e-3
    assert got.min() >= 0.0 and got.max() <= 1.0
    # fractional values actually occur (not just 0/1)
    assert np.any((got > 0.05) & (got < 0.95))


def test_solid_opacity_reduces_to_any_hit():
    """All-opacity-1 boxes through the fractional evaluator == the boolean
    any-hit path exactly (0/1 factors)."""
    g_solid = _geom(frac=False)
    assert not g_solid.box_fractional
    g_forced = dataclasses.replace(g_solid, box_fractional=True)
    pts, d = _rays(seed=7)
    a = np.asarray(jax.jit(
        lambda p, v: raycast.occluded(g_solid, p, v, jnp.float32(8.0)))(pts, d))
    b = np.asarray(jax.jit(
        lambda p, v: raycast.occluded(g_forced, p, v, jnp.float32(8.0)))(pts, d))
    np.testing.assert_array_equal(a.astype(np.float32), b.astype(np.float32))


def _scene(frac: bool):
    return Scene.create(
        camera=Camera.create(position=(0.2, 1.5, -8.0),
                             forward=(0.05, -0.02, 1.0), aspect=1.5),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(1, 1, 1)], intensity=[2.0],
            has_shadow=[True], shadow_strength=[0.8]),
        point_lights=PointLights.create(
            position=[(1.0, 3.0, 2.0)], color=[(1, 0.8, 0.6)], range=[8.0],
            intensity=[3.0], has_shadow=[True]),
        spot_lights=SpotLights.create(
            position=[(0.0, 5.0, 0.0)], direction=[(0, -1, 0.2)],
            color=[(1, 1, 0.9)], range=[10.0], intensity=[4.0],
            spot_angle_deg=[40.0], has_shadow=[True]),
        media=(Medium.create(phase_g=0.3, noise_mode="procedural",
                             noise_tiling=(0.05, 0.05, 0.05)),),
        geometry=_geom(frac))


def test_renderer_fractional_megakernel_matches_xla():
    """Production megakernel frame with fractional-opacity boxes == the XLA
    impl set (both route through the fractional evaluators)."""
    cfg = RenderConfig(volume_width=16, volume_height=16, volume_depth=8,
                       image_width=32, image_height=32,
                       shadow_mode="raycast", scatter_impl="pallas",
                       accumulate_impl="pallas", reproj_impl="pallas",
                       dir_shadow_impl="pallas", material_impl="fused",
                       temporal_blend_alpha=0.6,
                       raycast_shadow_subsample=2)
    cfg_ref = dataclasses.replace(cfg, scatter_impl="xla",
                                  accumulate_impl="xla",
                                  dir_shadow_impl="xla",
                                  material_impl="xla",
                                  reproj_impl="windowed",
                                  raycast_shadow_subsample=1)
    scene = _scene(frac=True)

    def frames(c):
        r = VolumetricRenderer(c)
        st = r.init_state(1)
        f = jax.jit(lambda s, sc, t: r.render_frame(s, sc, t)[::2])
        img = None
        for i in range(3):
            img, st = f(st, scene, jnp.float32(0.1 * i))
        return np.asarray(img)

    a = frames(cfg_ref)
    b = frames(cfg)
    # ss=2 visibility is a tent interpolation of the same fractional bake;
    # equivalence-class bound like test_renderer_megakernel_matches_xla
    rel = np.abs(a - b) / (1.0 + np.abs(a))
    assert float((rel > 2e-2).mean()) < 2e-2, (rel > 2e-2).mean()

    # the fractional scene must differ from its all-solid twin (the opacity
    # actually lets light through)
    scene_solid = _scene(frac=False)
    r = VolumetricRenderer(cfg)
    st = r.init_state(1)
    f = jax.jit(lambda s, sc, t: r.render_frame(s, sc, t)[::2])
    img_s = None
    for i in range(3):
        img_s, st = f(st, scene_solid, jnp.float32(0.1 * i))
    assert float(np.mean(np.abs(np.asarray(img_s) - b))) > 1e-6


def test_opacity_gradients_and_recovery():
    """Opacity is differentiable (visibility is linear in it): gradients are
    finite/nonzero and a few descent steps recover a target canopy density —
    inverse rendering of foliage opacity."""
    cfg = RenderConfig(volume_width=16, volume_height=16, volume_depth=8,
                       image_width=32, image_height=32,
                       shadow_mode="raycast", temporal_blend_shadow=False,
                       temporal_blend_accumulation=False)
    scene = _scene(frac=True)
    r = VolumetricRenderer(cfg)
    state = r.init_state(1)
    sc = jnp.zeros((32, 32, 3), jnp.float32)
    vd = jnp.full((32, 32), 60.0, jnp.float32)

    def render(op):
        g = dataclasses.replace(scene.geometry, box_opacity=op)
        s = dataclasses.replace(scene, geometry=g)
        img, _, _ = r.render_frame(state, s, 0.0, sc, vd)
        return img

    target = jax.jit(render)(jnp.asarray([0.35, 0.8, 1.0], jnp.float32))

    @jax.jit
    def loss_and_grad(op):
        def loss(op):
            return jnp.mean((render(op) - target) ** 2) * 1e4
        return jax.value_and_grad(loss)(op)

    op = jnp.asarray([0.9, 0.5, 1.0], jnp.float32)
    l0, g = loss_and_grad(op)
    assert np.isfinite(np.asarray(g)).all() and (np.abs(np.asarray(g)) > 0).any()
    # normalized-gradient descent: the thin-fog image signal is tiny, so
    # step in the gradient DIRECTION at a fixed size
    for _ in range(60):
        l, g = loss_and_grad(op)
        op = jnp.clip(op - 0.03 * g / (jnp.max(jnp.abs(g)) + 1e-12),
                      0.05, 1.0)
    lN, _ = loss_and_grad(op)
    assert float(lN) < 0.5 * float(l0), (float(l0), float(lN))
    # the fractional boxes move toward the target densities
    got = np.asarray(op)
    assert abs(got[0] - 0.35) < 0.3 and abs(got[1] - 0.8) < 0.3, got


def test_opacity_params_roundtrip_and_grad():
    """inverse.OpacityParams: logit-space roundtrip preserves the image and
    carries gradients."""
    from volumetricrenderer_tpu.inverse import OpacityParams
    cfg = RenderConfig(volume_width=16, volume_height=16, volume_depth=8,
                       image_width=32, image_height=32,
                       shadow_mode="raycast", temporal_blend_shadow=False,
                       temporal_blend_accumulation=False)
    scene = _scene(frac=True)
    r = VolumetricRenderer(cfg)
    state = r.init_state(1)
    sc = jnp.zeros((32, 32, 3), jnp.float32)
    vd = jnp.full((32, 32), 60.0, jnp.float32)

    f = jax.jit(lambda s: r.render_frame(state, s, 0.0, sc, vd)[0])
    img_ref = f(scene)
    op = OpacityParams.from_scene(scene)
    img_rt = f(op.apply(scene))
    np.testing.assert_allclose(np.asarray(img_rt), np.asarray(img_ref),
                               rtol=1e-5, atol=1e-6)

    g = jax.jit(jax.grad(lambda p: jnp.sum(f(p.apply(scene)))))(op)
    go = np.asarray(g.logit_opacity)
    assert np.isfinite(go).all() and (np.abs(go) > 0).any()
