"""volumetricrenderer_tpu — TPU-native froxel volumetric rendering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
PhilipZeratul/VolumetricRenderer (Unity froxel volumetric fog in the Frostbite
"Physically Based Unified Volumetric Rendering" style). See SURVEY.md for the
reference analysis and SPEC.md for the numerical contract.
"""

from volumetricrenderer_tpu.config import (RenderConfig, DEMO_CONFIG,
                                           FULL_CONFIG, UHD_CONFIG)
from volumetricrenderer_tpu.renderer import VolumetricRenderer
from volumetricrenderer_tpu.state import FrameState
from volumetricrenderer_tpu.models import (Camera, DirectionalLights, Geometry,
                                           Medium, PointLights, Scene,
                                           SpotLights, benchmark_scene,
                                           demo_scene)

__version__ = "0.1.0"

__all__ = [
    "RenderConfig", "DEMO_CONFIG", "FULL_CONFIG", "UHD_CONFIG",
    "VolumetricRenderer", "FrameState",
    "Camera", "DirectionalLights", "PointLights", "SpotLights",
    "Medium", "Geometry", "Scene", "demo_scene", "benchmark_scene",
]
