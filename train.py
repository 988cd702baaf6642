#!/usr/bin/env python
"""Training entry point.

Same public surface as the reference (/root/reference/train.py:20-79):

    python train.py --config-file config_files/rdst_e1_oasis_x4.ini \
        [--gpu-id N] [--seg-loss]

Dataset family is selected by substring of ``data_folder``
(OASIS / BraTS / ACDC / COVID). ``--gpu-id`` is accepted for CLI parity
(device selection is owned by JAX on TPU; -1 forces CPU).
Implementation: rdst_tpu/cli.py (also the ``rdst-train`` console
script when installed).
"""

from rdst_tpu.cli import train_main as main

if __name__ == "__main__":
    main()
