"""SR model zoo (flax). Factories dispatch on config names via registry."""

from rdst_tpu.models.registry import build_generator, MODEL_REGISTRY  # noqa: F401
