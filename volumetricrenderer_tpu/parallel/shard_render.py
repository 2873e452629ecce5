"""H-sharded rendering with the PRODUCTION (Pallas) kernels: explicit shard_map.

`parallel.sharding.make_sharded_render` relies on the GSPMD partitioner, which
cannot partition a `pallas_call` — with FULL_CONFIG's fused kernels the
volumes would be gathered and every device would run the whole grid. This
module shards the frame the TPU-native way instead: `jax.shard_map` over
screen-space H slabs, each device running the complete per-shard pipeline
(Pallas kernels included) on its rows.

Design (SURVEY §2.8/§5 — froxel rays are independent in XY):

- Every froxel pass is (at most) a small-stencil operation in H: the jittered
  integrate taps ±1 row, the windowed reprojection warp taps ±reproj_window
  rows, the composite's y-tent taps ±1 cell row. Instead of per-pass halo
  exchanges, each shard renders an OVERLAPPED slab of h/n + 2·halo rows:
  one ppermute-based halo exchange of the history volumes per frame and pure
  recompute for everything else. Cross-device traffic per frame: 2·halo rows
  of the history volumes over ICI — independent of the grid size.
- PERSISTENT HALOS: the state volumes stay halo-extended across frames; each
  frame only overwrites the 2·halo stale rows with the neighbors' freshly-
  computed interior edges (the locally-overcomputed halo rows lack their own
  stencil support and are discarded by the overwrite), so the naive
  formulation's full-volume crop + re-concat round trip (~330 MB/frame at
  FULL size) never touches HBM. `crop_sharded_state` recovers the plain
  global layout for checkpointing/inspection.
- Froxel y coordinates stay GLOBAL (FroxelParams.y0 carries the slab offset
  into every pass and kernel); rows past the grid edges clamp to the edge
  row, reproducing the single-device clamp-sampler semantics exactly, so a
  shard count change never changes the image (equivalence-tested).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from volumetricrenderer_tpu.renderer import VolumetricRenderer
from volumetricrenderer_tpu.state import FrameState


class Slab(NamedTuple):
    """Per-shard slab description handed to render_frame."""
    y0: jax.Array                       # global froxel row of local row 0
    halo: int                           # overcompute rows per side (static)
    grid_global: Tuple[int, int, int]   # (W, H, D) of the whole grid (static)
    image_height_global: int            # IH of the whole image (static)


def _halo_rows(x: jax.Array, p: int, axis_name: str, n: int,
               axis: int) -> jax.Array:
    """Extend `axis` with p rows from each neighbor shard (edge shards
    replicate their edge row — clamp-sampler semantics)."""
    axis = axis % x.ndim
    size = x.shape[axis]
    idx = jax.lax.axis_index(axis_name)
    last = jax.lax.slice_in_dim(x, size - p, size, axis=axis)
    first = jax.lax.slice_in_dim(x, 0, p, axis=axis)
    # top halo: shard s receives shard s-1's last p rows
    top = jax.lax.ppermute(last, axis_name,
                           [(s, s + 1) for s in range(n - 1)])
    edge0 = jnp.repeat(jax.lax.slice_in_dim(x, 0, 1, axis=axis), p, axis=axis)
    top = jnp.where(idx == 0, edge0, top)
    # bottom halo: shard s receives shard s+1's first p rows
    bot = jax.lax.ppermute(first, axis_name,
                           [(s, s - 1) for s in range(1, n)])
    edge1 = jnp.repeat(jax.lax.slice_in_dim(x, size - 1, size, axis=axis),
                       p, axis=axis)
    bot = jnp.where(idx == n - 1, edge1, bot)
    return jnp.concatenate([top, x, bot], axis=axis)


def _crop_rows(x: jax.Array, p: int, axis: int) -> jax.Array:
    axis = axis % x.ndim
    return jax.lax.slice_in_dim(x, p, x.shape[axis] - p, axis=axis)


def _refresh_halo(x: jax.Array, p: int, axis_name: str, n: int,
                  axis: int, h_ext: int) -> jax.Array:
    """Overwrite the halo rows of an ALREADY-EXTENDED slab (persistent-halo
    state) with the neighbors' freshly-computed interior edge rows — the
    same values _halo_rows would concat, but as two p-row dynamic updates
    into the (donated) extended buffer instead of a full-volume concat+crop
    round trip per frame. Rows [0, p) and [size-p, size) are the halos;
    interior is [p, size-p). A 3D leaf on axis 1 whose row count differs
    from h_ext is in the zgather PADDED layout (interior at rows
    [1, 1+h_ext); the pad rows clamp onto the refreshed halo rows and are
    rewritten too — _edge_slices/_write_halo carry the index arithmetic).

    Composed from _edge_slices (what each shard sends) + ppermute +
    _write_halo (where it lands): the multislab emulation replaces ONLY the
    ppermute with explicitly passed packets, so both paths share the slice/
    write indices by construction (bitwise-equal, test-pinned)."""
    first, last, cfirst, clast = _edge_slices(x, p, axis, h_ext)
    idx = jax.lax.axis_index(axis_name)
    top = jax.lax.ppermute(last, axis_name,
                           [(s, s + 1) for s in range(n - 1)])
    top = jnp.where(idx == 0, cfirst, top)
    bot = jax.lax.ppermute(first, axis_name,
                           [(s, s - 1) for s in range(1, n)])
    bot = jnp.where(idx == n - 1, clast, bot)
    return _write_halo(x, top, bot, p, axis, h_ext)


def crop_sharded_state(state: FrameState, n: int, halo: int,
                       h_global: Optional[int] = None,
                       grid_dhw=None) -> FrameState:
    """Global-layout view of a persistent-halo sharded state: each shard's
    rows in the stacked [.., n*(h_loc+2*halo), ..] arrays are cropped to the
    interior and re-concatenated to the plain [.., H, ..] layout (for
    checkpointing, inspection, or switching back to unsharded rendering).
    Pass `h_global` (the unextended grid height, e.g. `fn.h_global`) to make
    the already-plain pass-through exact — without it a plain state whose
    row count happens to divide `n` with room for the halos would be
    mis-cropped, so only call the 3-arg form on states returned by the
    sharded render fn (always extended). Acc planes in the zgather PADDED
    layout additionally need `grid_dhw` (the global (D, H, W)) and come back
    as plain [D, H, W] planes."""
    from volumetricrenderer_tpu.ops.pallas.zg_composite import (DLANES,
                                                                WSTRIDE,
                                                                padded_dims)

    def crop(x, axis):
        axis = axis % x.ndim
        if x.ndim == 3 and x.shape[0] == DLANES and x.shape[2] == WSTRIDE:
            # zgather padded layout, detected by its signature alone (NOT
            # gated on h_global): without this, a 3-arg call would fall
            # into the generic row crop below and silently treat the pad
            # rows as halo rows — fail loudly instead.
            if grid_dhw is None:
                raise ValueError(
                    "acc plane is in the zgather padded layout "
                    f"{x.shape}: crop_sharded_state needs grid_dhw "
                    "(and h_global) to crop it")
            # padded-extended plane [DLANES, n*hp_ext, WSTRIDE]: strip the
            # depth/col pads and the per-shard row pads + halos
            d, h, w = grid_dhw
            h_loc = h // n
            hp_ext = padded_dims(h_loc + 2 * halo)[0]
            assert x.shape[1] == n * hp_ext, \
                (x.shape, n, halo, grid_dhw)
            xs = x.reshape(DLANES, n, hp_ext, WSTRIDE)
            xs = xs[:d, :, 1 + halo:1 + halo + h_loc, 1:w + 1]
            return xs.reshape(d, h, w)
        rows = x.shape[axis]
        if h_global is not None and rows == h_global:
            return x
        if rows % n != 0:
            return x
        h_ext = rows // n
        h_loc = h_ext - 2 * halo
        if h_loc <= 0 or rows == n * h_loc:
            return x
        shape = list(x.shape)
        shape[axis:axis + 1] = [n, h_ext]
        xs = x.reshape(shape)
        xs = jax.lax.slice_in_dim(xs, halo, h_ext - halo, axis=axis + 1)
        shape2 = list(x.shape)
        shape2[axis] = n * h_loc
        return xs.reshape(shape2)

    acc = state.prev_accumulation
    if isinstance(acc, (tuple, list)):
        acc = tuple(crop(a, 1) for a in acc)
    else:
        acc = crop(acc, 1)
    return dataclasses.replace(
        state,
        prev_shadow=crop(state.prev_shadow, 2),
        prev_material_a=None if state.prev_material_a is None
        else crop(state.prev_material_a, 1),
        prev_scatter=None if state.prev_scatter is None
        else crop(state.prev_scatter, 1),
        prev_accumulation=acc)


def _edge_slices(x, p: int, axis: int, h_ext: int):
    """(first, last, clamp_first, clamp_last) p-row edge packets of a
    halo-extended leaf — the exact rows _refresh_halo ppermutes, extracted
    for the single-device multislab emulation. `first`/`last` are the first/
    last p INTERIOR (non-halo) rows; the clamp packets replicate the edge
    interior row (the ppermute version's edge0/edge1)."""
    axis = axis % x.ndim
    if x.ndim == 3 and x.shape[1] != h_ext and axis == 1:
        # zgather padded plane: interior rows [1, 1+h_ext)
        first = jax.lax.slice_in_dim(x, 1 + p, 1 + 2 * p, axis=1)
        last = jax.lax.slice_in_dim(x, 1 + h_ext - 2 * p, 1 + h_ext - p,
                                    axis=1)
        cfirst = jnp.repeat(jax.lax.slice_in_dim(x, 1 + p, 2 + p, axis=1),
                            p, axis=1)
        clast = jnp.repeat(jax.lax.slice_in_dim(x, h_ext - p, h_ext - p + 1,
                                                axis=1), p, axis=1)
    else:
        size = x.shape[axis]
        first = jax.lax.slice_in_dim(x, p, 2 * p, axis=axis)
        last = jax.lax.slice_in_dim(x, size - 2 * p, size - p, axis=axis)
        cfirst = jnp.repeat(jax.lax.slice_in_dim(x, p, p + 1, axis=axis),
                            p, axis=axis)
        clast = jnp.repeat(
            jax.lax.slice_in_dim(x, size - p - 1, size - p, axis=axis),
            p, axis=axis)
    return first, last, cfirst, clast


def _write_halo(x, top, bot, p: int, axis: int, h_ext: int):
    """Overwrite a halo-extended leaf's halo rows with neighbor packets —
    the write half of _refresh_halo with the ppermute
    replaced by the passed rows (identical indices, so the multislab
    emulation is bitwise-equal to the shard_map path)."""
    axis = axis % x.ndim
    if x.ndim == 3 and x.shape[1] != h_ext and axis == 1:
        hp_ext = x.shape[1]
        top_w = jnp.concatenate(
            [jax.lax.slice_in_dim(top, 0, 1, axis=1), top], axis=1)
        x = jax.lax.dynamic_update_slice_in_dim(x, top_w, 0, axis=1)
        bot_pad = jnp.repeat(jax.lax.slice_in_dim(bot, p - 1, p, axis=1),
                             hp_ext - 1 - h_ext, axis=1)
        bot_w = jnp.concatenate([bot, bot_pad], axis=1)
        return jax.lax.dynamic_update_slice_in_dim(x, bot_w, 1 + h_ext - p,
                                                   axis=1)
    size = x.shape[axis]
    x = jax.lax.dynamic_update_slice_in_dim(x, top, 0, axis=axis)
    return jax.lax.dynamic_update_slice_in_dim(x, bot, size - p, axis=axis)


def _steady_slab_state(renderer_loc: VolumetricRenderer, n_dir: int,
                       halo: int) -> FrameState:
    """Fresh per-shard state in the slab pipeline's STEADY layout: the local
    config's (halo-extended) shapes with accumulation history as the planar
    tuple the per-shard render emits — zgather-PADDED planes when
    pipeline.zgather_slab_eligible holds, raw [D, h_ext, W] planes
    otherwise. Zeros throughout (identical to extending the packed zero
    init: every halo/pad row is an edge-clamp or neighbor copy of zeros)."""
    from volumetricrenderer_tpu import pipeline
    from volumetricrenderer_tpu.ops.pallas.zg_composite import (DLANES,
                                                                WSTRIDE,
                                                                padded_dims)
    cfg_loc = renderer_loc.config
    state = renderer_loc.init_state(n_dir, layout="packed")
    d, h_ext, w = cfg_loc.grid_dhw
    if pipeline.zgather_slab_eligible(cfg_loc, halo):
        hp_ext = padded_dims(h_ext)[0]
        planes = tuple(jnp.zeros((DLANES, hp_ext, WSTRIDE), cfg_loc.dtype)
                       for _ in range(4))
    else:
        planes = tuple(jnp.zeros((d, h_ext, w), cfg_loc.dtype)
                       for _ in range(4))
    return dataclasses.replace(state, prev_accumulation=planes)


def make_multislab_render(renderer: VolumetricRenderer, n: int,
                          halo: Optional[int] = None, fixed_inputs=None):
    """Single-device EMULATION of the n-shard slab pipeline: the same
    per-shard renderer, halo data flow, and persistent-halo state as
    make_shardmap_render, with the ppermute replaced by explicitly passed
    neighbor edge rows and the n shards run SEQUENTIALLY on one chip.

    Two uses:
    - measure real multi-chip per-shard cost on the one available chip
      (bench slab3_ms: per-frame total / n ~= each chip's work at n-way
      sharding, the ICI exchange being 2*halo rows of history per frame);
    - pin the n>1 slab math on real hardware (the CPU-mesh shard tests run
      every Mosaic kernel in interpret mode only).

    Returns fn with fn(carry, scene, time_x, sc_bands, vd_bands) ->
    (image_bands, new_carry) and fn.init_carry(n_dir) building the initial
    carry; sc_bands/vd_bands are the IH-split G-buffer bands (lists of
    [IH/n, IW(,3)]). One shared step jit serves all shards (the slab row
    offset y0 is a traced argument).

    fixed_inputs=(sc_bands, vd_bands): close each shard's G-buffer band
    over its step jit as a compile-time CONSTANT (fn then takes (carry,
    scene, time_x)) — the same convention as
    make_shardmap_render(fixed_inputs=...) and the unsharded bench frame
    jit (which closes over scene_color/view_depth), so the emulation
    measures the same constant-folded program (composite fz re-layout,
    ~0.4 ms/frame at FULL size) the paths it is compared against run.
    Costs n distinct step executables (one per band constant)."""
    cfg = renderer.config
    w_g, h_g, d_g = cfg.grid
    ih_g = cfg.image_height
    assert h_g % n == 0 and ih_g % n == 0, (h_g, ih_g, n)
    h_loc, ih_loc = h_g // n, ih_g // n
    # Seam exactness needs max downward reprojection offset <= halo - 2:
    # the composed per-frame row stencil is the temporal warp's
    # window-clipped offset (+-reproj_window), then the jittered
    # integrate's +-1 rows, then the composite y-tent's +-1 (it reads acc
    # row halo-1, pipeline's slab-zgather slice). Since offsets are clipped
    # to +-reproj_window, halo = reproj_window + 2 is exact for EVERY
    # motion the warp window itself supports. Measured (2-shard CPU mesh,
    # hard shadow edges, ~3-4 rows/frame vertical motion): halo=2 diverges
    # at the seam by ~1e-3-2.5e-3; the provable bound costs ~2 overcompute
    # rows per side over the old max(reproj_window, 2) default. An explicit
    # smaller halo trades seam exactness under fast motion for less
    # overcompute (tests/test_shard_render.py fast-vertical-motion test).
    # Default clamps to the slab height for very short slabs (tiny dryrun
    # grids): the exactness envelope then shrinks to offsets <= h_loc - 2.
    p = halo if halo is not None \
        else min(cfg.reproj_window + 2, h_loc)
    assert 1 <= p <= h_loc, \
        f"halo {p} must be in [1, {h_loc}] (composite tents read row -1)"
    assert cfg.reproj_impl in ("windowed", "pallas")
    h_ext = h_loc + 2 * p
    cfg_loc = dataclasses.replace(cfg, volume_height=h_ext,
                                  image_height=ih_loc)
    renderer_loc = VolumetricRenderer(cfg_loc)

    def _map_state(state, leaf_fn):
        """Apply leaf_fn(leaf, halo_axis) over the halo-carrying fields."""
        acc = state.prev_accumulation
        acc = jax.tree.map(lambda a: leaf_fn(a, 1), acc) \
            if isinstance(acc, (tuple, list)) else leaf_fn(acc, 1)
        m1 = lambda x: None if x is None else jax.tree.map(
            lambda a: leaf_fn(a, 1), x)
        return dataclasses.replace(
            state, prev_shadow=leaf_fn(state.prev_shadow, 2),
            prev_material_a=m1(state.prev_material_a),
            prev_scatter=m1(state.prev_scatter),
            prev_accumulation=acc)

    def _edges(state):
        packs = [None] * 4
        for k in range(4):
            packs[k] = _map_state(
                state, lambda a, ax, k=k: _edge_slices(a, p, ax, h_ext)[k])
        return tuple(packs)           # (first, last, cfirst, clast)

    def _halo_fields(s):
        return (s.prev_shadow, s.prev_material_a, s.prev_scatter,
                s.prev_accumulation)

    def _axes_of(s):
        """Per-leaf halo axis, in jax.tree.flatten order of _halo_fields."""
        return jax.tree.leaves((
            jax.tree.map(lambda _: 2, s.prev_shadow),
            None if s.prev_material_a is None
            else jax.tree.map(lambda _: 1, s.prev_material_a),
            None if s.prev_scatter is None
            else jax.tree.map(lambda _: 1, s.prev_scatter),
            jax.tree.map(lambda _: 1, s.prev_accumulation)))

    def step(state, top, bot, y0, scene, time_x, sc_band, vd_band):
        # refresh halos from the neighbor packets (prev-frame interiors —
        # the same dataflow, slice indices, and writes as _refresh_halo's
        # ppermute form, so the emulation is bitwise-equal to shard_map)
        flat_s, td = jax.tree.flatten(_halo_fields(state))
        out = [_write_halo(x, tt, bb, p, ax, h_ext)
               for x, tt, bb, ax in zip(flat_s,
                                        jax.tree.leaves(_halo_fields(top)),
                                        jax.tree.leaves(_halo_fields(bot)),
                                        _axes_of(state))]
        sh, ma, sc_, ac = jax.tree.unflatten(td, out)
        st = dataclasses.replace(state, prev_shadow=sh, prev_material_a=ma,
                                 prev_scatter=sc_, prev_accumulation=ac)
        slab = Slab(y0=y0, halo=p, grid_global=cfg.grid,
                    image_height_global=ih_g)
        image, _, new_state = renderer_loc.render_frame(
            st, scene, time_x, scene_color=sc_band, view_depth=vd_band,
            slab=slab)
        acc = new_state.prev_accumulation
        if not isinstance(acc, (tuple, list)):
            acc = tuple(acc[..., c] for c in range(4))
        new_state = dataclasses.replace(new_state,
                                        prev_accumulation=tuple(acc))
        return image, new_state, _edges(new_state)

    if fixed_inputs is not None:
        sc_fix, vd_fix = fixed_inputs
        steps = [jax.jit(functools.partial(step, sc_band=sc_fix[i],
                                           vd_band=vd_fix[i]),
                         donate_argnums=0) for i in range(n)]
    else:
        shared = jax.jit(step, donate_argnums=0)
        steps = [shared] * n

    def init_carry(n_dir: int):
        # steady-layout init: the per-shard states start in the layout the
        # slab pipeline PRODUCES (halo-extended planar acc history — padded
        # when the zgather slab composite is active), so frame 0 runs the
        # same step executable as every later frame (no packed->planar
        # structure flip = no second full compile per shard, no frame-0
        # donation miss). Zero planes equal the packed zero init extended.
        states = [_steady_slab_state(renderer_loc, n_dir, p)
                  for _ in range(n)]
        edges_of = jax.jit(_edges)      # one trace/compile for all shards
        edges = [edges_of(s) for s in states]
        return states, edges

    def fn(carry, scene, time_x, sc_bands=None, vd_bands=None):
        states, edges = carry
        new_states, new_edges, bands = [], [], []
        for i in range(n):
            # top halo <- shard i-1's last interior rows; bottom halo <-
            # shard i+1's first; global edges clamp-replicate own rows
            top = edges[i - 1][1] if i > 0 else edges[i][2]
            bot = edges[i + 1][0] if i < n - 1 else edges[i][3]
            y0 = jnp.float32(i * h_loc - p)
            args = (states[i], top, bot, y0, scene, time_x)
            if fixed_inputs is None:
                args += (sc_bands[i], vd_bands[i])
            img, st, ed = steps[i](*args)
            bands.append(img)
            new_states.append(st)
            new_edges.append(ed)
        return bands, (new_states, new_edges)

    fn.halo = p
    fn.n_shards = n
    fn.h_global = h_g
    fn.init_carry = init_carry
    return fn


def make_shardmap_render(renderer: VolumetricRenderer, mesh: Mesh,
                         axis_name: str = "y", halo: Optional[int] = None,
                         fixed_inputs=None):
    """Returns fn(state, scene, time_x, scene_color, view_depth) ->
    (image, new_state) running the full per-shard pipeline under shard_map.

    state volumes are H-sharded (see sharding.shard_state); scene_color
    [IH, IW, 3] and view_depth [IH, IW] are IH-sharded (the reference treats
    the G-buffer as engine-provided input, Internal-DeferredShading.shader);
    scene is replicated. Works with every impl selection including the
    production FULL_CONFIG Pallas kernel set.

    fixed_inputs=(scene_color, view_depth): close over the engine inputs as
    jit-time CONSTANTS (fn then takes (state, scene, time_x)). A static
    G-buffer lets XLA constant-fold the composite's per-frame fz cell
    re-layout (~0.4 ms at FULL size) exactly as the unsharded benching
    convention does (its frame jit closes over scene_color/view_depth) —
    use when the depth buffer is static across the timed frames.
    """
    cfg = renderer.config
    n = int(mesh.devices.size)
    w_g, h_g, d_g = cfg.grid
    ih_g, iw_g = cfg.image_height, cfg.image_width
    assert h_g % n == 0 and ih_g % n == 0, \
        f"H={h_g} and IH={ih_g} must divide the mesh size {n}"
    h_loc, ih_loc = h_g // n, ih_g // n
    # Seam exactness needs max downward reprojection offset <= halo - 2:
    # the composed per-frame row stencil is the temporal warp's
    # window-clipped offset (+-reproj_window), then the jittered
    # integrate's +-1 rows, then the composite y-tent's +-1 (it reads acc
    # row halo-1, pipeline's slab-zgather slice). Since offsets are clipped
    # to +-reproj_window, halo = reproj_window + 2 is exact for EVERY
    # motion the warp window itself supports. Measured (2-shard CPU mesh,
    # hard shadow edges, ~3-4 rows/frame vertical motion): halo=2 diverges
    # at the seam by ~1e-3-2.5e-3; the provable bound costs ~2 overcompute
    # rows per side over the old max(reproj_window, 2) default. An explicit
    # smaller halo trades seam exactness under fast motion for less
    # overcompute (tests/test_shard_render.py fast-vertical-motion test).
    # Default clamps to the slab height for very short slabs (tiny dryrun
    # grids): the exactness envelope then shrinks to offsets <= h_loc - 2.
    p = halo if halo is not None \
        else min(cfg.reproj_window + 2, h_loc)
    assert 1 <= p <= h_loc, \
        f"halo {p} must be in [1, {h_loc}] (composite tents read row -1)"
    # The gather reprojection samples the true (unbounded) global position;
    # only the windowed impls' bounded support fits the halo overcompute.
    assert cfg.reproj_impl in ("windowed", "pallas"), \
        "shard_render needs a windowed reproj impl (bounded row support)"
    cfg_loc = dataclasses.replace(cfg, volume_height=h_loc + 2 * p,
                                  image_height=ih_loc)
    renderer_loc = VolumetricRenderer(cfg_loc)

    def per_shard(state: FrameState, scene, time_x, scene_color, view_depth):
        idx = jax.lax.axis_index(axis_name)
        slab = Slab(y0=(idx * h_loc - p).astype(jnp.float32), halo=p,
                    grid_global=cfg.grid, image_height_global=ih_g)
        # PERSISTENT HALOS: state volumes stay halo-EXTENDED across frames.
        # Frame 0 arrives in the plain global layout (h_loc rows/shard) and
        # is extended once via the concat path; every later frame only
        # REFRESHES the 2·p halo rows from the neighbors' interior (the
        # locally-overcomputed halo rows lack their own stencil support and
        # are discarded by the overwrite) — the full-volume crop + re-concat
        # round trip (~330 MB/frame at FULL size) never happens.
        extended = state.prev_shadow.shape[2] == h_loc + 2 * p
        # H axis: 2 for prev_shadow [Nd, D, H, W]; 1 for the [D, H, W, C]
        # channel-last volumes AND the planar-history [D, H, W] plane tuples
        # (the fused frame keeps accumulation history as 4 channel planes).
        h_ext = h_loc + 2 * p

        def ext1(a):
            # acc-plane leaves may arrive in the zgather PADDED layout
            # ([DLANES, hp_ext, WSTRIDE], renderer emits + consumes it when
            # pipeline.zgather_slab_eligible) — _refresh_halo handles both
            # layouts in place (padded detected by the row count)
            if extended:
                return _refresh_halo(a, p, axis_name, n, 1, h_ext)
            return _halo_rows(a, p, axis_name, n, 1)

        halo1 = lambda x: None if x is None else jax.tree.map(ext1, x)
        sh_ext = _refresh_halo(state.prev_shadow, p, axis_name, n, 2,
                               h_ext) if extended \
            else _halo_rows(state.prev_shadow, p, axis_name, n, 2)
        state_ext = dataclasses.replace(
            state,
            prev_shadow=sh_ext,
            prev_material_a=halo1(state.prev_material_a),
            prev_scatter=halo1(state.prev_scatter),
            prev_accumulation=halo1(state.prev_accumulation))
        image, _, new_state = renderer_loc.render_frame(
            state_ext, scene, time_x, scene_color=scene_color,
            view_depth=view_depth, slab=slab)
        # normalize accumulation history to PLANAR (4 channel planes): the
        # fused frame already emits planes, and render_frame repacks planar
        # input on the unfused paths — one fixed structure keeps the
        # out_specs static across paths. Outputs stay EXTENDED (see above);
        # crop_sharded_state recovers the global layout when needed.
        acc = new_state.prev_accumulation
        if not isinstance(acc, (tuple, list)):
            acc = tuple(acc[..., c] for c in range(4))
        new_state = dataclasses.replace(new_state,
                                        prev_accumulation=tuple(acc))
        return image, new_state

    vol_spec = P(None, axis_name, None, None)
    plane_spec = P(None, axis_name, None)

    def state_specs(acc_tree):
        # spec RANKS must match the leaves: packed [D, H, W, 4] history
        # (frame 0 / init) vs the planar tuple of [D, H, W] planes
        acc_spec = jax.tree.map(lambda _: plane_spec, acc_tree) \
            if isinstance(acc_tree, (tuple, list)) else vol_spec
        return FrameState(
            prev_shadow=P(None, None, axis_name, None),
            prev_material_a=vol_spec if cfg.temporal_blend_material else None,
            prev_scatter=vol_spec if cfg.temporal_blend_scatter else None,
            prev_accumulation=acc_spec,
            prev_world_to_view=P(), frame_count=P())

    out_state_specs = state_specs((plane_spec,) * 4)   # always planar out

    def dispatch(state, scene, time_x, scene_color, view_depth):
        # jit retraces per state STRUCTURE, so each structure binds the
        # matching in_specs (frame 0 arrives packed; thereafter planar)
        fn = jax.shard_map(
            per_shard, mesh=mesh,
            in_specs=(state_specs(state.prev_accumulation), P(), P(),
                      P(axis_name, None, None), P(axis_name, None)),
            out_specs=(P(axis_name, None, None), out_state_specs),
            # pallas_call out_shapes carry no vma annotation; the varying-
            # axis checker cannot see through them
            check_vma=False)
        return fn(state, scene, time_x, scene_color, view_depth)

    def normalize(state):
        # a fresh unsharded-production state (init_state layout="auto")
        # carries accumulation history as GLOBAL zgather-padded planes; the
        # frame-0 halo extension shards plain global rows, so repack once
        # (structure-level, frame 0 only — steady-state sharded planes have
        # the local-extended padded shape and pass through)
        from volumetricrenderer_tpu.ops.pallas.zg_composite import (
            DLANES, WSTRIDE, padded_dims)
        from volumetricrenderer_tpu.state import packed_accumulation
        acc = state.prev_accumulation
        if (isinstance(acc, (tuple, list)) and acc[0].ndim == 3
                and acc[0].shape == (DLANES, padded_dims(h_g)[0], WSTRIDE)):
            state = dataclasses.replace(
                state, prev_accumulation=packed_accumulation(
                    acc, (d_g, h_g, w_g)))
        return state

    # donate the history volumes (production steady-state: ~86 MB of f32
    # state per frame would otherwise copy on every call)
    if fixed_inputs is not None:
        sc_fix, vd_fix = fixed_inputs
        jitted = jax.jit(
            lambda state, scene, time_x: dispatch(state, scene, time_x,
                                                  sc_fix, vd_fix),
            donate_argnums=0)

        def fn(state, scene, time_x):
            return jitted(normalize(state), scene, time_x)
    else:
        jitted = jax.jit(dispatch, donate_argnums=0)

        def fn(state, scene, time_x, scene_color, view_depth):
            return jitted(normalize(state), scene, time_x, scene_color,
                          view_depth)

    def init_state(n_dir: int) -> FrameState:
        """Fresh state directly in the sharded STEADY layout (stacked
        per-shard halo-extended planar leaves): frame 0 then runs the same
        executable as every later frame — the plain global init remains
        accepted (frame-0 extension path) but costs a second full compile
        of the slab graph and a frame-0 donation miss."""
        local = _steady_slab_state(renderer_loc, n_dir, p)

        def stack(x, axis):
            reps = [1] * x.ndim
            reps[axis] = n
            return jnp.tile(x, reps)     # zeros — tile == concat of copies

        return dataclasses.replace(
            local,
            prev_shadow=stack(local.prev_shadow, 2),
            prev_material_a=None if local.prev_material_a is None
            else stack(local.prev_material_a, 1),
            prev_scatter=None if local.prev_scatter is None
            else stack(local.prev_scatter, 1),
            prev_accumulation=tuple(stack(a, 1)
                                    for a in local.prev_accumulation))

    fn.halo = p          # for crop_sharded_state on the returned state
    fn.n_shards = n
    fn.h_global = h_g
    fn.init_state = init_state
    return fn
