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

from rdst_tpu.config import ParametersLoader  # noqa: F401
