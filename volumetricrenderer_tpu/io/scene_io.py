"""Declarative scene serialization (JSON).

The reference's L5 authoring layer is a serialized Unity scene: every tunable
the demo uses — camera transform, sun/spot parameters, fog medium, temporal
settings — lives as YAML fields in Assets/Scenes/VolumetricRenderer.unity:547-685
and is loaded, not constructed in code. This module gives the TPU framework the
same surface: a JSON schema that loads to `models.scene.Scene` and round-trips
it exactly.

Two dialects are accepted by `scene_from_dict` (and mix freely per section):

- SERIALIZED (what `scene_to_dict` emits): each section carries the exact
  dataclass fields (SoA light arrays, fov in radians, normalized directions).
  Round-trips bit-exactly — directions are NOT re-normalized, angles NOT
  re-converted, so save -> load is the identity on the pytree.
- AUTHORED (hand-written): the human-facing constructor forms — camera with
  `fov_y_deg`, lights as a LIST of per-light dicts, geometry as
  `planes/spheres/boxes` tuples, media as `Medium.create` kwargs. These route
  through the models' create() constructors (same normalization the code
  presets use).

`demo.py --scene file.json` renders a loaded scene; tests/test_scene_io.py
pins the exact round trip of demo_scene() and benchmark_scene().
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu.models.camera import Camera
from volumetricrenderer_tpu.models.geometry import Geometry
from volumetricrenderer_tpu.models.lights import (DirectionalLights,
                                                  PointLights, SpotLights)
from volumetricrenderer_tpu.models.media import Medium
from volumetricrenderer_tpu.models.mesh import TriMesh
from volumetricrenderer_tpu.models.scene import Scene

SCHEMA_VERSION = 1

# per-field dtypes that are not float32 (everything else numeric is f32)
_DTYPES = {"has_shadow": bool, "tris": jnp.int32}


def _dc_to_dict(obj) -> dict:
    out = {}
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if v is None or isinstance(v, (str, int, float, bool)):
            out[f.name] = v
        else:
            arr = np.asarray(v)
            if arr.size == 0:
                # nested tolist() of a (0, 3) is just [] — keep the shape
                out[f.name] = {"empty": list(arr.shape)}
            else:
                out[f.name] = arr.tolist()
    return out


def _dc_from_dict(cls, d: dict):
    kw = {}
    for f in dataclasses.fields(cls):
        v = d.get(f.name)
        if v is None:
            # optional array fields (e.g. Medium.noise_tex) serialize as
            # None; absent static fields fall back to their default
            kw[f.name] = None if f.default is dataclasses.MISSING \
                else f.default
        elif (f.metadata or {}).get("static") or isinstance(v, str):
            kw[f.name] = v
        elif isinstance(v, dict) and "empty" in v:
            kw[f.name] = jnp.zeros(tuple(v["empty"]),
                                   _DTYPES.get(f.name, jnp.float32))
        else:
            kw[f.name] = jnp.asarray(v, _DTYPES.get(f.name, jnp.float32))
    return cls(**kw)


def _is_serialized(cls, d: dict) -> bool:
    """A section is in the exact serialized dialect when every dataclass
    field is present (authored forms use the create() kwarg names, which
    differ for at least one field of every section)."""
    return all(f.name in d for f in dataclasses.fields(cls)
               if f.default is dataclasses.MISSING)


# per-entry defaults for the OPTIONAL create() kwargs, matching what each
# class's create() fills when the whole column is omitted — so authored
# light lists may set e.g. has_shadow on only some entries
_LIGHT_KEY_DEFAULTS = {
    "shadow_strength": 1.0,
    "intensity_multiplier": 1.0,
    "inner_angle_percent": 0.5,
}


def _light_key_default(cls, key):
    if key == "has_shadow":
        return cls is DirectionalLights     # create() default: dir True,
    return _LIGHT_KEY_DEFAULTS.get(key)     # point/spot False


def _lights_from(cls, d):
    if isinstance(d, dict):                       # serialized SoA
        return _dc_from_dict(cls, d)
    if not d:                                     # authored empty list
        return cls.empty()
    # authored: list of per-light dicts -> SoA create() kwargs
    keys = set().union(*[set(e) for e in d])
    cols = {k: [e.get(k) for e in d] for k in keys}
    # entries missing an OPTIONAL key get that key's create() default
    # (per entry — other entries keep their authored values); a REQUIRED
    # key missing on some entries is still an authoring error
    for k, col in cols.items():
        if any(v is None for v in col):
            default = _light_key_default(cls, k)
            if default is None:
                raise ValueError(
                    f"light list entries disagree on required key '{k}'")
            cols[k] = [default if v is None else v for v in col]
    return cls.create(**cols)


def _camera_from(d: dict) -> Camera:
    if _is_serialized(Camera, d):
        return _dc_from_dict(Camera, d)
    return Camera.create(**d)


def _medium_from(d: dict) -> Medium:
    if _is_serialized(Medium, d):
        return _dc_from_dict(Medium, d)
    return Medium.create(**d)


def _geometry_from(d: dict) -> Geometry:
    if d is None:
        return Geometry.empty()
    if _is_serialized(Geometry, d):
        return _dc_from_dict(Geometry, d)
    return Geometry.create(**d)


def scene_to_dict(scene: Scene) -> dict:
    """Exact (serialized-dialect) dict of a Scene; JSON-safe."""
    return {
        "schema": SCHEMA_VERSION,
        "camera": _dc_to_dict(scene.camera),
        "dir_lights": _dc_to_dict(scene.dir_lights),
        "point_lights": _dc_to_dict(scene.point_lights),
        "spot_lights": _dc_to_dict(scene.spot_lights),
        "media": [_dc_to_dict(m) for m in scene.media],
        "geometry": _dc_to_dict(scene.geometry),
        "ambient": np.asarray(scene.ambient).tolist(),
        "mesh": None if scene.mesh is None else _dc_to_dict(scene.mesh),
    }


def scene_from_dict(d: dict) -> Scene:
    """Load a Scene from the serialized or authored dialect (see module
    docstring). Unknown top-level keys raise (typo protection)."""
    known = {"schema", "camera", "dir_lights", "point_lights", "spot_lights",
             "media", "geometry", "ambient", "mesh"}
    extra = set(d) - known
    if extra:
        raise ValueError(f"unknown scene keys: {sorted(extra)}")
    mesh = d.get("mesh")
    return Scene(
        camera=_camera_from(d["camera"]),
        dir_lights=_lights_from(DirectionalLights, d.get("dir_lights", [])),
        point_lights=_lights_from(PointLights, d.get("point_lights", [])),
        spot_lights=_lights_from(SpotLights, d.get("spot_lights", [])),
        media=tuple(_medium_from(m) for m in d.get("media", [])),
        geometry=_geometry_from(d.get("geometry")),
        ambient=jnp.asarray(d.get("ambient", (0.0, 0.0, 0.0)), jnp.float32),
        mesh=None if mesh is None else _dc_from_dict(TriMesh, mesh),
    )


def post_to_dict(post_cfg) -> dict:
    """PostConfig -> JSON-safe dict (the Unity scene serializes its
    PostProcessing profile the same way, as part of the scene asset set)."""
    out = {}
    for f in dataclasses.fields(post_cfg):
        v = getattr(post_cfg, f.name)
        out[f.name] = list(v) if isinstance(v, tuple) else v
    return out


def post_from_dict(d: dict):
    """dict -> PostConfig; accepts any subset of fields (defaults fill the
    rest); lists become tuples; unknown keys raise."""
    from volumetricrenderer_tpu.post import PostConfig
    names = {f.name for f in dataclasses.fields(PostConfig)}
    extra = set(d) - names
    if extra:
        raise ValueError(f"unknown post keys: {sorted(extra)}")
    kw = {}
    for f in dataclasses.fields(PostConfig):
        if f.name not in d:
            continue
        v = d[f.name]
        if isinstance(v, list):
            v = tuple(tuple(e) if isinstance(e, list) else e for e in v)
        kw[f.name] = v
    return PostConfig(**kw)


def save_scene(path: str, scene: Scene, post_cfg=None) -> None:
    doc = scene_to_dict(scene)
    if post_cfg is not None:
        doc["post"] = post_to_dict(post_cfg)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)


def load_scene(path: str, with_post: bool = False):
    """Load a Scene (and, with_post=True, the optional PostConfig section —
    (scene, post_or_None))."""
    with open(path) as f:
        doc = json.load(f)
    post = doc.pop("post", None)
    scene = scene_from_dict(doc)
    if with_post:
        return scene, (None if post is None else post_from_dict(post))
    return scene
