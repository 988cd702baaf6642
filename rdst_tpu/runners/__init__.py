"""Trainer / tester orchestration."""
