"""nyxus_tpu: a TPU-native (JAX/XLA/Pallas) scalable image feature-extraction
framework with the capabilities of PolusAI/nyxus.

Computes engineered intensity / texture / morphology / image-quality features
per segmented ROI or whole slide, batched over padded ROI tensors on TPU,
sharded over device meshes for scale-out.
"""

from .api import ImageQuality, Nyxus
from .config import EngineConfig

__version__ = "0.1.0"

__all__ = ["Nyxus", "ImageQuality", "EngineConfig", "__version__"]
