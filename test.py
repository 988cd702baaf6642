#!/usr/bin/env python
"""Testing/inference entry point.

Same public surface as the reference (/root/reference/test.py:11-31):

    python test.py --config-file config_files/rdst_e1_oasis_x4_testing.ini

Implementation: rdst_tpu/cli.py (also the ``rdst-test`` console script
when installed).
"""

from rdst_tpu.cli import test_main as main

if __name__ == "__main__":
    main()
