"""Production serving: AOT-exported StableHLO bundles + batching server.

Framework extension beyond the reference surface (the reference ships
research eval scripts only). Two deployable forms:

* :mod:`rdst_tpu.serving.export` — compile a trained generator to a
  self-contained on-disk bundle (serialized ``jax.export`` StableHLO
  per SR scale with a symbolic batch dimension, params msgpack,
  manifest). Bundles load without the training config or data tree.
* :mod:`rdst_tpu.serving.server` — a dependency-free HTTP inference
  server with cross-request micro-batching and power-of-two batch
  bucketing (one compile per bucket, padded dispatch).
"""

from rdst_tpu.serving.export import (LiveModel, ServingBundle,
                                     export_bundle)

__all__ = ["export_bundle", "ServingBundle", "LiveModel", "SRClient",
           "sr_volume"]


def __getattr__(name):  # lazy: client/volume pull optional deps
    if name == "SRClient":
        from rdst_tpu.serving.client import SRClient

        return SRClient
    if name == "sr_volume":
        from rdst_tpu.serving.volume import sr_volume

        return sr_volume
    raise AttributeError(name)
