#!/usr/bin/env python
"""Testing/inference entry point.

Same public surface as the reference (/root/reference/test.py:11-31):

    python test.py --config-file config_files/rdst_e1_oasis_x4_testing.ini
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description="Testing Parameters")
    parser.add_argument("--config-file", type=str, required=True, metavar="CONFIG",
                        help="Path to config file.")
    parser.add_argument("--gpu-id", type=int, metavar="GPU")
    parser.add_argument("overrides", nargs="*", metavar="KEY=VALUE",
                        help="Config overrides, e.g. mesh_shape=[2,2,2].")
    args = parser.parse_args()

    if args.gpu_id is not None and args.gpu_id == -1:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from rdst_tpu.config import ParametersLoader
    from rdst_tpu.runners.tester import TransSRTester

    paras = ParametersLoader(args.config_file)
    if args.gpu_id is not None:
        paras.set("gpu_id", args.gpu_id)
        paras.set("eva_gpu_id", args.gpu_id)
    paras.apply_overrides(args.overrides)

    tester = TransSRTester(paras)
    tester.setup()
    tester.test()


if __name__ == "__main__":
    main()
