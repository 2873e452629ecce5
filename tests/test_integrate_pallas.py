"""Fused Pallas jittered-sample + scan == shift_sample_3d + accumulate_blocked."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import RenderConfig
from volumetricrenderer_tpu.froxel import make_froxel_params
from volumetricrenderer_tpu.jitter import JITTER_SEQUENCE
from volumetricrenderer_tpu.ops.pallas.integrate import accumulate_fused_pallas
from volumetricrenderer_tpu.ops.sampling import shift_sample_3d
from volumetricrenderer_tpu.ops.scatter_scan import accumulate_blocked
from volumetricrenderer_tpu.pipeline import step_lengths


def _ref(cfg, params, jitter, planes):
    scatter = jnp.concatenate(
        [jnp.stack(planes[:3], axis=-1), planes[3][..., None]], axis=-1)
    sampled = shift_sample_3d(scatter, jitter)
    return accumulate_blocked(sampled[..., :3], sampled[..., 3],
                              step_lengths(cfg, params))


def test_fused_integrate_matches_xla_all_jitters():
    cfg = RenderConfig(volume_width=24, volume_height=16, volume_depth=8)
    params = make_froxel_params(jnp.float32(1.0), 1.5, 0.3,
                                cfg.volume_distance, cfg.depth_distribution,
                                cfg.grid)
    d, h, w = cfg.grid_dhw
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    rgb = jax.random.uniform(k1, (3, d, h, w), jnp.float32)
    ext = jax.random.uniform(k2, (d, h, w), jnp.float32) * 0.5
    planes = (rgb[0], rgb[1], rgb[2], ext)

    for fi in range(7):
        jit_off = JITTER_SEQUENCE[fi]
        ref = _ref(cfg, params, jit_off, planes)
        out = jax.jit(lambda p, j: accumulate_fused_pallas(
            p, j, params, cfg.grid, interpret=True))(planes, jit_off)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-5, atol=3e-6,
                                   err_msg=f"jitter {fi}")


def test_fused_integrate_sigma_zero():
    """Zero extinction exercises the Taylor branch."""
    cfg = RenderConfig(volume_width=16, volume_height=16, volume_depth=8)
    params = make_froxel_params(jnp.float32(1.0), 1.0, 0.3,
                                cfg.volume_distance, cfg.depth_distribution,
                                cfg.grid)
    d, h, w = cfg.grid_dhw
    rgb = jnp.full((d, h, w), 0.25, jnp.float32)
    planes = (rgb, rgb * 0.5, rgb * 0.1, jnp.zeros((d, h, w), jnp.float32))
    jit_off = JITTER_SEQUENCE[2]
    ref = _ref(cfg, params, jit_off, planes)
    out = accumulate_fused_pallas(planes, jit_off, params, cfg.grid,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-6)
    # transmittance must stay exactly 1 with sigma = 0
    np.testing.assert_array_equal(np.asarray(out[..., 3]), 1.0)


def test_fused_integrate_in_full_frame():
    """End-to-end: FULL-style config with accumulate_impl=pallas matches xla."""
    from volumetricrenderer_tpu import VolumetricRenderer
    from tests.test_scatter_pallas import CFG, _scene

    scene = _scene()
    base = dataclasses.replace(CFG, scatter_impl="pallas")
    r_x = VolumetricRenderer(base)
    r_p = VolumetricRenderer(dataclasses.replace(base,
                                                 accumulate_impl="pallas"))
    img_x, aux_x, _ = jax.jit(lambda s, sc: r_x.render_frame(s, sc, 0.0))(
        r_x.init_state(1), scene)
    img_p, aux_p, _ = jax.jit(lambda s, sc: r_p.render_frame(s, sc, 0.0))(
        r_p.init_state(1), scene)
    np.testing.assert_allclose(np.asarray(aux_p["accumulation"]),
                               np.asarray(aux_x["accumulation"]),
                               rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x),
                               rtol=3e-5, atol=3e-6)


def test_fused_paths_multiframe_stable():
    """8 frames through the all-pallas config (scatter + dir shadow +
    accumulate + temporal blends fused): finite, converging history, and
    matching the all-XLA config at every frame."""
    from volumetricrenderer_tpu import VolumetricRenderer
    from tests.test_scatter_pallas import CFG, _scene

    scene = _scene()
    cfg_p = dataclasses.replace(CFG, scatter_impl="pallas",
                                dir_shadow_impl="pallas",
                                accumulate_impl="pallas",
                                reproj_impl="pallas",
                                temporal_blend_shadow=True,
                                temporal_blend_accumulation=True)
    cfg_x = dataclasses.replace(CFG, temporal_blend_shadow=True,
                                temporal_blend_accumulation=True,
                                reproj_impl="windowed")
    r_p = VolumetricRenderer(cfg_p)
    r_x = VolumetricRenderer(cfg_x)
    f_p = jax.jit(lambda s, sc, t: r_p.render_frame(s, sc, t))
    f_x = jax.jit(lambda s, sc, t: r_x.render_frame(s, sc, t))
    sp, sx = r_p.init_state(1), r_x.init_state(1)
    for i in range(8):
        img_p, _, sp = f_p(sp, scene, jnp.float32(0.05 * i))
        img_x, _, sx = f_x(sx, scene, jnp.float32(0.05 * i))
        a, b = np.asarray(img_p), np.asarray(img_x)
        assert np.isfinite(a).all(), f"frame {i} not finite"
        rel = np.abs(a - b) / (1.0 + np.abs(b))
        # any-hit shadow boundaries are step functions: allow isolated flips
        assert (rel > 1e-3).mean() < 2e-3, (i, rel.max())
