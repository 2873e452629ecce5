"""Scene container + demo/benchmark scene presets.

Replaces the reference's scene/authoring layer (Assets/Scenes/VolumetricRenderer.unity
+ serialized component parameters, SURVEY §2.6). A Scene is a pytree: every numeric
field is traced, so cameras/lights/media can animate without recompilation; counts
and medium types are static.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from volumetricrenderer_tpu.models.camera import Camera
from volumetricrenderer_tpu.models.geometry import Geometry
from volumetricrenderer_tpu.models.lights import DirectionalLights, PointLights, SpotLights
from volumetricrenderer_tpu.models.media import Medium
from volumetricrenderer_tpu.models.mesh import TriMesh


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scene:
    camera: Camera
    dir_lights: DirectionalLights
    point_lights: PointLights
    spot_lights: SpotLights
    media: Tuple[Medium, ...]
    geometry: Geometry
    ambient: jax.Array            # [3] flat ambient term for the demo shading
    # optional triangle-soup environment: rasterized into the G-buffer at
    # bake time (ops/raster.py) and depth-composited over the analytic pass
    # (the reference's FBX meshes via Unity's rasterizer, SURVEY §2.1 #15)
    mesh: Optional[TriMesh] = None

    @staticmethod
    def create(camera, dir_lights=None, point_lights=None, spot_lights=None,
               media=(), geometry=None, ambient=(0.0, 0.0, 0.0),
               mesh=None) -> "Scene":
        return Scene(
            camera=camera,
            dir_lights=dir_lights if dir_lights is not None else DirectionalLights.empty(),
            point_lights=point_lights if point_lights is not None else PointLights.empty(),
            spot_lights=spot_lights if spot_lights is not None else SpotLights.empty(),
            media=tuple(media),
            geometry=geometry if geometry is not None else Geometry.empty(),
            ambient=jnp.asarray(ambient, jnp.float32),
            mesh=mesh,
        )


def _euler_forward(pitch_deg: float, yaw_deg: float) -> Tuple[float, float, float]:
    """Unity transform.forward for euler (pitch, yaw, 0)."""
    p = math.radians(pitch_deg)
    y = math.radians(yaw_deg)
    return (math.cos(p) * math.sin(y), -math.sin(p), math.cos(p) * math.cos(y))


def demo_scene(aspect: float = 16.0 / 9.0, with_noise: bool = False,
               noise_tex=None, mesh_env: bool = False) -> Scene:
    """The reference demo scene (SURVEY §2.6 / VolumetricRenderer.unity).

    Camera at (-0.4, 1.9, -15.8) looking +z (scene:597-599); Sun euler (50, -30)
    color (0.99, 0.96, 0.80) intensity 2.5 with volumetric shadow (scene:194-284);
    red spot at (-16.08, 5, 17.61) intensity 6 range 34.42 angle 66 inner 50%
    (scene:441-517); constant white fog absorption 0.19 phaseG 0.3 (scene:142-161).
    The environment prefab (ground + cubes + sphere + trees) is approximated with
    analytic primitives.
    """
    camera = Camera.create(
        position=(-0.4, 1.9, -15.8), forward=(0.0, 0.0, 1.0),
        fov_y_deg=60.0, aspect=aspect, near=0.3, far=100.0)

    sun = DirectionalLights.create(
        direction=[_euler_forward(50.0, -30.0)],
        color=[(0.99, 0.96, 0.80)], intensity=[2.5],
        has_shadow=[True], shadow_strength=[1.0])

    spot = SpotLights.create(
        position=[(-16.08, 5.0, 17.61)],
        direction=[_euler_forward(29.709, -251.452)],
        color=[(1.0, 0.0, 0.0)], intensity=[6.0], range=[34.42],
        spot_angle_deg=[66.0], inner_angle_percent=[0.5],
        intensity_multiplier=[1.0], has_shadow=[True], shadow_strength=[1.0])

    fog = Medium.create(
        scattering_color=(1.0, 1.0, 1.0), absorption=0.19, phase_g=0.3,
        noise_tex=noise_tex if with_noise else None,
        noise_scroll=(10.0, 0.0, 0.0), noise_tiling=(0.01, 0.01, 0.01))

    # Environment prefab stand-ins (Assets/Prefabs/Enviornment.prefab): ground
    # cubes + sphere as analytic primitives, trees at the prefab's three
    # placements, and rolling terrain as a procedural heightfield. Two tree
    # representations:
    #   mesh_env=False: hand-placed canopy sphere + trunk box (cheap, the
    #     round-2 stand-in; keeps small-test configs light);
    #   mesh_env=True: the ACTUAL reference FBX meshes, ingested via
    #     io/fbx.py -> models/voxelize.py into baked occluder boxes
    #     (models/tree_assets.py) — real mesh content driving the G-buffer
    #     and every shadow path through the analytic box tables.
    trees = [(-9.0, 18.0), (7.0, 9.0), (-14.0, 25.0)]
    mesh = None
    if mesh_env:
        from volumetricrenderer_tpu.models.mesh import (concat_meshes,
                                                        demo_tree,
                                                        transform_mesh)
        from volumetricrenderer_tpu.models.tree_assets import TREE_0, TREE_1
        from volumetricrenderer_tpu.models.voxelize import transform_boxes
        leaf = (0.18, 0.32, 0.12)
        tree_spheres = []
        tree_trunks = []
        insts = []
        for i, (x, z) in enumerate(trees):
            src = TREE_0 if i % 2 == 0 else TREE_1
            inst = transform_boxes(src, scale=0.55 if i % 2 else 0.5,
                                   translate=(x, 0.0, z),
                                   yaw=i * math.pi / 2)
            # voxelizer opacity < 1 = porous canopy: shadow rays keep
            # (1 - opacity) of their light (alpha-tested foliage
            # stand-in, SPEC "Occluder opacity")
            tree_trunks += [(tuple(bm), tuple(bx), leaf, op)
                            for bm, bx, op in inst]
            # the SAME instancing transform for the rasterized triangles, so
            # the visible mesh and its shadow-proxy boxes stay aligned
            insts.append(transform_mesh(demo_tree(i % 2),
                                        scale=0.55 if i % 2 else 0.5,
                                        translate=(x, 0.0, z),
                                        yaw=i * math.pi / 2))
        mesh = concat_meshes(insts)
    else:
        tree_spheres = [((x, 3.2, z), 1.6, (0.18, 0.32, 0.12))
                        for x, z in trees]
        tree_trunks = [((x - 0.25, 0.0, z - 0.25), (x + 0.25, 2.4, z + 0.25),
                        (0.3, 0.2, 0.12)) for x, z in trees]
    geometry = Geometry.create(
        planes=[((0.0, 1.0, 0.0), 0.0, (0.22, 0.26, 0.18))],
        spheres=[((4.0, 1.5, 6.0), 1.5, (0.6, 0.55, 0.5))] + tree_spheres,
        boxes=[
            ((-6.0, 0.0, 2.0), (-4.0, 2.0, 4.0), (0.5, 0.45, 0.4)),
            ((2.0, 0.0, 14.0), (5.0, 4.0, 17.0), (0.45, 0.5, 0.45)),
            ((-12.0, 0.0, 10.0), (-10.0, 6.0, 12.0), (0.35, 0.4, 0.3)),
        ] + tree_trunks,
        # mesh_env: the trunk/canopy boxes are shadow-only proxies for the
        # rasterized tree mesh (primary rays skip them; the mesh covers them)
        n_proxy_boxes=len(tree_trunks) if mesh_env else 0,
        heightfield=dict(amp=2.0, base=-0.3, tiling=(0.03, 0.03),
                         offset=(0.0, 0.0), albedo=(0.24, 0.28, 0.18)))

    return Scene.create(camera=camera, dir_lights=sun, spot_lights=spot,
                        media=(fog,), geometry=geometry,
                        ambient=(0.08, 0.09, 0.11), mesh=mesh)


def benchmark_scene(aspect: float = 16.0 / 9.0, num_local_lights: int = 16,
                    noise_tex=None, noise_mode: str = "texture") -> Scene:
    """BASELINE config 5: cascaded dir light + 16 local lights + fog volumes."""
    camera = Camera.create(
        position=(-0.4, 1.9, -15.8), forward=(0.0, 0.0, 1.0),
        fov_y_deg=60.0, aspect=aspect, near=0.3, far=100.0)

    sun = DirectionalLights.create(
        direction=[_euler_forward(50.0, -30.0)],
        color=[(0.99, 0.96, 0.80)], intensity=[2.5],
        has_shadow=[True], shadow_strength=[1.0])

    n_point = num_local_lights // 2
    n_spot = num_local_lights - n_point
    rng = jnp.linspace(0.0, 2.0 * jnp.pi, n_point, endpoint=False)
    point = PointLights.create(
        position=jnp.stack([20.0 * jnp.cos(rng), jnp.full_like(rng, 3.0),
                            20.0 * jnp.sin(rng) + 10.0], axis=-1),
        color=jnp.stack([0.5 + 0.5 * jnp.cos(rng), jnp.full_like(rng, 0.4),
                         0.5 + 0.5 * jnp.sin(rng)], axis=-1),
        intensity=jnp.full((n_point,), 7.0),
        range=jnp.full((n_point,), 30.0),
        has_shadow=[True] * n_point)

    rng2 = jnp.linspace(0.0, 2.0 * jnp.pi, n_spot, endpoint=False)
    spot = SpotLights.create(
        position=jnp.stack([15.0 * jnp.sin(rng2), jnp.full_like(rng2, 6.0),
                            15.0 * jnp.cos(rng2) + 15.0], axis=-1),
        direction=jnp.tile(jnp.asarray([(0.3, -0.9, 0.3)]), (n_spot, 1)),
        color=jnp.stack([jnp.full_like(rng2, 1.0), 0.5 + 0.5 * jnp.cos(rng2),
                         jnp.full_like(rng2, 0.2)], axis=-1),
        intensity=jnp.full((n_spot,), 6.0),
        range=jnp.full((n_spot,), 34.42),
        spot_angle_deg=jnp.full((n_spot,), 66.0),
        has_shadow=[True] * n_spot)

    fog = Medium.create(
        scattering_color=(1.0, 1.0, 1.0), absorption=0.19, phase_g=0.3,
        noise_tex=noise_tex, noise_mode=noise_mode,
        noise_scroll=(10.0, 0.0, 0.0), noise_tiling=(0.01, 0.01, 0.01),
        height_falloff=0.05, height_base=0.0)

    ground_fog = Medium.create(
        scattering_color=(0.8, 0.9, 1.0), absorption=0.3, phase_g=0.5,
        volume_type="box", blend_type="additive",
        box_min=(-30.0, 0.0, -20.0), box_max=(30.0, 4.0, 40.0), box_softness=1.0)

    geometry = Geometry.create(
        planes=[((0.0, 1.0, 0.0), 0.0, (0.22, 0.26, 0.18))],
        spheres=[((4.0, 1.5, 6.0), 1.5, (0.6, 0.55, 0.5)),
                 ((-8.0, 2.0, 20.0), 2.0, (0.5, 0.5, 0.6))],
        boxes=[
            ((-6.0, 0.0, 2.0), (-4.0, 2.0, 4.0), (0.5, 0.45, 0.4)),
            ((2.0, 0.0, 14.0), (5.0, 4.0, 17.0), (0.45, 0.5, 0.45)),
            ((-12.0, 0.0, 10.0), (-10.0, 6.0, 12.0), (0.35, 0.4, 0.3)),
            ((8.0, 0.0, 25.0), (12.0, 8.0, 28.0), (0.4, 0.4, 0.45)),
        ])

    return Scene.create(camera=camera, dir_lights=sun, point_lights=point,
                        spot_lights=spot, media=(fog, ground_fog),
                        geometry=geometry, ambient=(0.08, 0.09, 0.11))
