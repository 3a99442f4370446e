"""ElevenRender-TPU: a TPU-native differentiable path-tracing framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
ElevenRender SYCL renderer (reference: 101001000/ElevenRender): headless
TCP render server speaking the same wire protocol, OBJ/texture/HDRI/Disney
-BRDF scene ingestion, BVH-accelerated progressive path tracing with
beauty/normal/tangent/bitangent passes, denoising, programmable shaders —
plus what the reference lacks: a direct Python API, reverse-mode pixel
gradients, multi-device sharding, and tests.
"""

__version__ = "0.1.0"

from .render.renderer import Renderer  # noqa: F401
from .scene.ir import RenderConfig  # noqa: F401
from .scene.scene import PointLight, Scene  # noqa: F401
