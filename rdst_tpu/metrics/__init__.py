"""Evaluation stack: image quality metrics, Dice, FID, report harness."""

from rdst_tpu.metrics.image_metrics import METRIC_FUNCS, psnr, ssim  # noqa: F401
from rdst_tpu.metrics.evaluation import (  # noqa: F401
    MetaSREvaluation,
    MultiModalityMetaSREvaluation,
    SRMetrics,
)
