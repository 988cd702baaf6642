"""Installable CLI entry points (``[project.scripts]`` in pyproject).

The repo-root ``train.py``/``test.py`` wrappers keep the reference's
exact invocation surface (/root/reference/{train,test}.py); these
functions are the shared implementations, also exposed as
``rdst-train`` / ``rdst-test`` / ``rdst-serve`` / ``rdst-export`` /
``rdst-sr-volume`` console scripts when the package is installed.
"""

from __future__ import annotations

import argparse


def train_main(argv=None):
    parser = argparse.ArgumentParser(description="Training Parameters")
    parser.add_argument("--config-file", type=str, required=True, metavar="CONFIG",
                        help="Path to config file.")
    parser.add_argument("--gpu-id", type=int, metavar="GPU",
                        help="Device id; -1 forces CPU (parity flag).")
    parser.add_argument("--seg-loss", action="store_true",
                        help="Use the segmentation-label training dataset.")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("overrides", nargs="*", metavar="KEY=VALUE",
                        help="Config overrides, e.g. mesh_shape=[2,2,2] "
                             "batch_size=16 (values eval'd like .ini values).")
    args = parser.parse_args(argv)

    if args.gpu_id is not None and args.gpu_id == -1:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from rdst_tpu.config import ParametersLoader
    from rdst_tpu.data.readers import make_train_valid_datasets
    from rdst_tpu.runners.trainer import TransSRTrainer

    paras = ParametersLoader(args.config_file)
    if args.gpu_id is not None:
        paras.set("gpu_id", args.gpu_id)
        paras.set("eva_gpu_id", args.gpu_id)
    paras.apply_overrides(args.overrides)

    ds_train, ds_valid = make_train_valid_datasets(paras, seg_loss=args.seg_loss)
    print(f"DS info: {len(ds_train)} training samples, and "
          f"{ds_valid.test_len()} testing cases.")

    trainer = TransSRTrainer(paras, ds_train, ds_valid, seed=args.seed)
    trainer.setup()
    trainer.train()


def test_main(argv=None):
    parser = argparse.ArgumentParser(description="Testing Parameters")
    parser.add_argument("--config-file", type=str, required=True, metavar="CONFIG",
                        help="Path to config file.")
    parser.add_argument("--gpu-id", type=int, metavar="GPU")
    parser.add_argument("overrides", nargs="*", metavar="KEY=VALUE",
                        help="Config overrides, e.g. mesh_shape=[2,2,2].")
    args = parser.parse_args(argv)

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
