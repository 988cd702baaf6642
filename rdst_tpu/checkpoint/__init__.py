"""Checkpointing: orbax train-state IO + torch weight import bridge."""
