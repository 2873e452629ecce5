from volumetricrenderer_tpu.models.camera import Camera
from volumetricrenderer_tpu.models.lights import DirectionalLights, PointLights, SpotLights
from volumetricrenderer_tpu.models.media import Medium
from volumetricrenderer_tpu.models.geometry import Geometry
from volumetricrenderer_tpu.models.scene import Scene, demo_scene, benchmark_scene

__all__ = [
    "Camera",
    "DirectionalLights",
    "PointLights",
    "SpotLights",
    "Medium",
    "Geometry",
    "Scene",
    "demo_scene",
    "benchmark_scene",
]
