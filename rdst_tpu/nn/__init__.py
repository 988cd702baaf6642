"""Neural network building blocks (flax.linen, NHWC, TPU-first)."""
