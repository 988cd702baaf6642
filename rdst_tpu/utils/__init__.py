"""Utilities: optimizers, logging, timers, plotting."""
