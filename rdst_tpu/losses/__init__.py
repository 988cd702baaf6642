"""Composable multi-stage loss subsystem."""

from rdst_tpu.losses.sr_loss import SRLoss  # noqa: F401
