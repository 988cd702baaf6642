"""rdst_tpu — a TPU-native medical-image super-resolution framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference PyTorch framework GinZhu/RDST (see /root/reference): the RDST
(Residual Dense Swin Transformer) model family, medical-volume data
pipelines (OASIS / BraTS / ACDC / COVID-CT), composable multi-stage
losses (reconstruction / perceptual / segmentation-UNet / GAN), a full
evaluation stack (PSNR/SSIM + sewar metric set + FID + Dice), and
trainer/tester orchestration with checkpoint/resume — all built
TPU-first: NHWC layouts, jitted train/eval steps, device-mesh sharding
via jax.sharding, and Pallas kernels on the hot ops.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache (opt-in: RDST_TPU_CACHE=1): caching the
# 30-90s Swin-graph compiles across processes makes reruns start in seconds
# on standard TPU runtimes. NOT enabled by default: the experimental 'axon'
# PJRT tunnel deadlocks when executable serialization is on (observed:
# train step dispatch never completes, host blocks in Array._value).
if _os.environ.get("RDST_TPU_CACHE"):
    import jax as _jax

    _cache_dir = _os.environ.get(
        "RDST_TPU_CACHE_DIR", _os.path.expanduser("~/.cache/rdst_tpu_xla"))
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rdst_tpu.config import ParametersLoader  # noqa: F401
