"""nyxus_tpu: a TPU-native (JAX/XLA/Pallas) scalable image feature-extraction
framework with the capabilities of PolusAI/nyxus.

Computes engineered intensity / texture / morphology / image-quality features
per segmented ROI or whole slide, batched over padded ROI tensors on TPU,
sharded over device meshes for scale-out.
"""

import os as _os


def _setup_compile_cache():
    """Persistent XLA compilation cache: bucket-shape kernels compile once per
    machine, not once per process.  Opt out with NYXUS_TPU_NO_CACHE=1."""
    if _os.environ.get("NYXUS_TPU_NO_CACHE"):
        return
    import jax
    if jax.config.jax_compilation_cache_dir:
        return
    cache = _os.environ.get(
        "NYXUS_TPU_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "nyxus_tpu", "jax"))
    try:
        _os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    except Exception:
        pass


_setup_compile_cache()

from .api import ImageQuality, Nyxus, Nyxus3D
from .config import EngineConfig
from .functions import get_gpu_properties, gpu_is_available
from .nested import Nested

__version__ = "0.1.0"

__all__ = ["Nyxus", "Nyxus3D", "ImageQuality", "Nested", "EngineConfig",
           "gpu_is_available", "get_gpu_properties", "__version__"]
