"""zgather composite (ops/pallas/zg_composite.py) == tentmm / gather paths."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import (Camera, DirectionalLights, Medium,
                                    PointLights, RenderConfig, Scene,
                                    VolumetricRenderer, demo_scene)
from volumetricrenderer_tpu import froxel
from volumetricrenderer_tpu.ops.pallas.zg_composite import composite_zgather
from volumetricrenderer_tpu.ops.tent_composite import composite_tentmm

# 8x8 px cells (the FULL config's ratio), h % 3 == 0
CFG = RenderConfig(volume_width=16, volume_height=9, volume_depth=8,
                   image_width=128, image_height=72, shadow_mode="raycast",
                   composite_impl="zgather")


def test_unit_matches_tentmm():
    rng = np.random.RandomState(3)
    w, h, d = CFG.grid
    acc = jnp.asarray(rng.rand(d, h, w, 4).astype(np.float32))
    sc = jnp.asarray(rng.rand(CFG.image_height, CFG.image_width, 3)
                     .astype(np.float32))
    fz = jnp.asarray((rng.rand(CFG.image_height, CFG.image_width)
                      * (d - 1.0)).astype(np.float32))
    ref = composite_tentmm(acc, sc, fz, CFG.grid, precision="highest")
    planes = tuple(acc[..., c] for c in range(4))
    got = composite_zgather(planes, sc, fz, CFG.grid, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_full_frame_matches_tentmm():
    scene = demo_scene(aspect=CFG.image_width / CFG.image_height)

    def run(impl):
        cfg = dataclasses.replace(CFG, composite_impl=impl)
        r = VolumetricRenderer(cfg)
        state = r.init_state(scene.dir_lights.count)
        img = None
        for i in range(2):
            img, _, state = jax.jit(
                lambda s, sc, t: r.render_frame(s, sc, t))(
                    state, scene, jnp.float32(0.1 * i))
        return np.asarray(img)

    a = run("tentmm")
    b = run("zgather")
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)


def test_ineligible_ratio_falls_back():
    # 4x4 px cells (cp=16): the zgather gate must fall back to tentmm
    cfg = dataclasses.replace(CFG, image_width=64, image_height=36)
    scene = demo_scene(aspect=64 / 36)
    r = VolumetricRenderer(cfg)
    state = r.init_state(scene.dir_lights.count)
    img, _, _ = jax.jit(lambda s, sc: r.render_frame(s, sc, 0.0))(state, scene)
    r2 = VolumetricRenderer(dataclasses.replace(cfg, composite_impl="tentmm"))
    img2, _, _ = jax.jit(lambda s, sc: r2.render_frame(s, sc, 0.0))(
        r2.init_state(scene.dir_lights.count), scene)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img2),
                               rtol=1e-6, atol=1e-6)


def test_prepadded_blend_path_matches_tentmm():
    """reproj=pallas + temporal blends: the blend emits pre-padded planes
    straight into the zgather composite; must equal the tentmm frame."""
    cfg = dataclasses.replace(CFG, reproj_impl="pallas",
                              temporal_blend_alpha=0.7)
    scene = demo_scene(aspect=CFG.image_width / CFG.image_height)

    def run(impl):
        c = dataclasses.replace(cfg, composite_impl=impl)
        r = VolumetricRenderer(c)
        state = r.init_state(scene.dir_lights.count)
        img = None
        for i in range(3):      # frame >= 1 exercises the padded blend
            img, _, state = jax.jit(
                lambda s, sc, t: r.render_frame(s, sc, t))(
                    state, scene, jnp.float32(0.1 * i))
        return np.asarray(img), np.asarray(state.prev_accumulation)

    a, sa = run("tentmm")
    b, sb = run("zgather")
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(sb, sa, rtol=1e-5, atol=1e-6)


def test_unit_16x16_cells_matches_tentmm():
    """4K-class cell size (16x16 px) via the sub-image decomposition."""
    rng = np.random.RandomState(5)
    w, h, d = 16, 9, 8
    ih, iw = 16 * h, 16 * w
    acc = jnp.asarray(rng.rand(d, h, w, 4).astype(np.float32))
    sc = jnp.asarray(rng.rand(ih, iw, 3).astype(np.float32))
    fz = jnp.asarray((rng.rand(ih, iw) * (d - 1.0)).astype(np.float32))
    ref = composite_tentmm(acc, sc, fz, (w, h, d), precision="highest")
    planes = tuple(acc[..., c] for c in range(4))
    got = composite_zgather(planes, sc, fz, (w, h, d), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_unit_row_off_extended_plane_matches_halo_rows():
    """row_off window read of a halo-EXTENDED padded plane (the slab path's
    persistent padded history) == the halo_rows slice+prep path on the same
    data: out rows [p, p+h_out) of the extended rows, with REAL neighbor
    rows as the y-tent edge taps."""
    from volumetricrenderer_tpu.ops.pallas.zg_composite import (
        DLANES, WSTRIDE, composite_zgather_planes, padded_dims)
    rng = np.random.RandomState(7)
    w, d = 16, 8
    p, h_out = 4, 12                      # halo 4 (sub-block), 8x8 px cells
    h_ext = h_out + 2 * p
    ih, iw = 8 * h_out, 8 * w
    ext = rng.rand(d, h_ext, w).astype(np.float32)    # one channel suffices x4
    fz = jnp.asarray((rng.rand(ih, iw) * (d - 1.0)).astype(np.float32))

    # build the padded-extended plane the megakernel emits: padded row r =
    # ext row clamp(r-1), padded col c = clamp(c-1), depth padded to DLANES
    hp_e, _ = padded_dims(h_ext)
    padded = np.zeros((DLANES, hp_e, WSTRIDE), np.float32)
    rr = np.clip(np.arange(hp_e) - 1, 0, h_ext - 1)
    cc = np.clip(np.arange(WSTRIDE) - 1, 0, w - 1)
    padded[:d] = ext[:, rr][:, :, cc]
    planes4 = tuple(jnp.asarray(padded) for _ in range(4))

    got = composite_zgather_planes(planes4, fz, (w, h_out, d),
                                   interpret=True, prepadded=True, row_off=p)

    # reference: the existing slab branch — slice rows [p-1, p+h_out+1)
    # and prep with halo_rows=True
    sl = jnp.asarray(ext[:, p - 1:p + h_out + 1])
    ref = composite_zgather_planes(tuple(sl for _ in range(4)), fz,
                                   (w, h_out, d), interpret=True,
                                   halo_rows=True)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-6, atol=1e-6)


def test_multisub_matches_per_sub_passes(monkeypatch):
    """The (nblk, n_sub)-grid decomposition kernel (MULTISUB) is bitwise-
    equal to the round-3 one-kernel-per-sub-image form."""
    import volumetricrenderer_tpu.ops.pallas.zg_composite as zg
    cfg = dataclasses.replace(CFG, image_width=CFG.volume_width * 16,
                              image_height=CFG.volume_height * 16)
    renderer = VolumetricRenderer(cfg)
    scene = demo_scene(aspect=cfg.image_width / cfg.image_height)
    sc, vd = jax.jit(renderer.render_scene_inputs)(scene)
    state = renderer.init_state(scene.dir_lights.count)

    def render():
        img, _, _ = jax.jit(lambda st: renderer.render_frame(
            st, scene, 0.0, scene_color=sc, view_depth=vd))(state)
        return np.asarray(img)

    monkeypatch.setattr(zg, "MULTISUB", True)
    a = render()
    monkeypatch.setattr(zg, "MULTISUB", False)
    b = render()
    np.testing.assert_array_equal(a, b)


def test_composite_upsample_cosited_exact_and_smooth():
    """composite_upsample=2: every 2nd pixel equals the full-res exact
    composite bit-for-bit (co-sited samples: the low-res pass reads fz at
    full pixels us*i AND uses XY tent weights at those full-pixel positions
    — the round-5 co-siting fix); the in-between pixels stay within the
    smooth-volume envelope.

    The image dims are chosen so the HALF-res config is itself
    zgather-eligible (256x144 over 16x9 -> low 128x72 with 8x8-px cells);
    the previous 128x72 version's half-res shape failed the eligibility
    gate and trivially took the exact path (round-5 advisor finding)."""
    cfg = dataclasses.replace(CFG, image_width=256, image_height=144)
    cfg2 = dataclasses.replace(cfg, composite_upsample=2)
    from volumetricrenderer_tpu.pipeline import zgather_eligible
    assert zgather_eligible(dataclasses.replace(
        cfg2, image_width=128, image_height=72, composite_upsample=1)), \
        "test misconfigured: half-res shape must be kernel-eligible"
    renderer = VolumetricRenderer(cfg)
    scene = demo_scene(aspect=cfg.image_width / cfg.image_height)
    sc, vd = jax.jit(renderer.render_scene_inputs)(scene)
    state = renderer.init_state(scene.dir_lights.count)

    def run(c):
        r = VolumetricRenderer(c)
        img, _, _ = jax.jit(lambda st: r.render_frame(
            st, scene, 0.0, scene_color=sc, view_depth=vd))(state)
        return np.asarray(img)

    full = run(cfg)
    half = run(cfg2)
    assert np.isfinite(half).all()
    # co-sited pixels are exact up to the final scene-blend's FMA
    # contraction (the two jits fuse scene*T + L differently; the trilinear
    # sample itself is identical arithmetic): ~1 ulp, measured 2.4e-7 rel
    np.testing.assert_allclose(half[::2, ::2], full[::2, ::2],
                               rtol=1e-6, atol=1e-6)
    # off-phase pixels: bounded by the volumetric layer's froxel-scale
    # smoothness EXCEPT at depth-silhouette pixels whose enclosing co-sited
    # 2x2 quad spans a depth edge (those interpolate between the two
    # surfaces' fz — the documented quality envelope, SPEC.md). Build the
    # quad-depth-spread mask and assert the contract piecewise.
    vdn = np.asarray(vd)
    ihh, iww = vdn.shape
    y0 = (np.arange(ihh) // 2) * 2
    x0 = (np.arange(iww) // 2) * 2
    y1 = np.minimum(y0 + 2, ihh - 2)
    x1 = np.minimum(x0 + 2, iww - 2)
    corners = np.stack([vdn[np.ix_(a, b)] for a in (y0, y1)
                        for b in (x0, x1)])
    spread = corners.max(0) - corners.min(0)
    edge = spread > 0.02 * (vdn.max() - vdn.min())
    err_img = np.abs(half - full).max(axis=-1)
    assert err_img[~edge].max() < 0.06, err_img[~edge].max()
    # edge pixels are sparse (isolated silhouettes, not area artifacts)
    assert edge.mean() < 0.15, edge.mean()


def test_upsample_cosited_matches_numpy():
    from volumetricrenderer_tpu.pipeline import _upsample_cosited
    rng = np.random.RandomState(0)
    p = rng.rand(5, 7).astype(np.float32)
    up = np.asarray(_upsample_cosited(jnp.asarray(p), 2))
    assert up.shape == (10, 14)
    pe = np.concatenate([p, p[-1:]], 0)
    pe = np.concatenate([pe, pe[:, -1:]], 1)
    for y in range(10):
        for x in range(14):
            iy, fy = divmod(y, 2)
            ix, fx = divmod(x, 2)
            ref = (pe[iy, ix] * (1 - fy / 2) * (1 - fx / 2)
                   + pe[iy + 1, ix] * (fy / 2) * (1 - fx / 2)
                   + pe[iy, ix + 1] * (1 - fy / 2) * (fx / 2)
                   + pe[iy + 1, ix + 1] * (fy / 2) * (fx / 2))
            np.testing.assert_allclose(up[y, x], ref, atol=1e-6)
