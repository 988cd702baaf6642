"""Qualitative figure generation + offline result plotting.

Replaces the reference's seven hard-coded ``utils/save_rdst_results*.py``
scripts (hard-coded cluster paths, per-dataset copies) with one
parameterized CLI:

    python -m rdst_tpu.utils.figures --config-file cfg.ini \
        --patient OAS1_0004_MR1 --slices 20 30 --zoom 40 40 32 32 \
        [--unet weights/unet_oasis_native.pkl] --out figures/

Per slice it renders LR / bicubic / SR / GT rows with per-image PSNR
(and Dice per tissue class when a segmentation UNet is provided),
reading the tester's saved ``{pid}_inference_results.npz``.
Also exposes ``plot_training_records`` (the result_plotter equivalent)
for loss/metric curves from a training output directory.
"""

from __future__ import annotations

import argparse
import os
from os.path import exists, join

import numpy as np


def _load_sr_volume(paras, pid: str, scale: float):
    gan_type = paras.get("gan_type", "None")
    root = join(paras.output_dir,
                f"{paras.model_name}_{gan_type}_Final_Predictions",
                "inference_results", f"{pid}_inference_results.npz")
    if not exists(root):
        raise FileNotFoundError(
            f"no saved inference results at {root} — run test.py first")
    with np.load(root) as z:
        return z[f"x{scale}"]


def render_patient_figures(paras, pid: str, slice_ids, scale: float = None,
                           zoom=None, unet_ckpt: str = None, out_dir: str = "figures"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from rdst_tpu.data import ops
    from rdst_tpu.data.readers import make_test_dataset
    from rdst_tpu.metrics.image_metrics import dice_coefficient, psnr

    scale = scale or max(paras.test_sr_scales)
    ds = make_test_dataset(paras, [pid])
    sr_vol = _load_sr_volume(paras, pid, scale)
    os.makedirs(out_dir, exist_ok=True)

    seg = None
    if unet_ckpt and exists(unet_ckpt):
        import pickle

        import jax
        import jax.numpy as jnp

        from rdst_tpu.models.seg_unet import SegUNet

        with open(unet_ckpt, "rb") as f:
            variables = pickle.load(f)
        n_classes = variables["params"]["segmentation_head"]["bias"].shape[-1]
        unet = SegUNet(in_channels=ds.input_channels, classes=n_classes)

        @jax.jit
        def segment(x):
            _, _, logits = unet.apply(variables, x, train=False)
            return jnp.argmax(logits, -1)

        seg = segment

    paths = []
    for i in slice_ids:
        pair = ds.get_test_pair(i)[scale]
        lr = pair["in"][0]
        gt = pair["gt"]
        sr = sr_vol[i]
        bic = ops.resize(lr, gt.shape[:2])

        cols = [("LR", lr), ("Bicubic", bic), ("SR", sr), ("GT", gt)]
        rows = 2 if zoom else 1
        fig, axes = plt.subplots(rows, len(cols), figsize=(3 * len(cols), 3 * rows),
                                 squeeze=False)
        for j, (name, img) in enumerate(cols):
            axes[0][j].imshow(np.clip(img[..., 0], 0, 1), cmap="gray")
            title = name
            if name in ("Bicubic", "SR"):
                title += f" ({psnr(gt, img):.2f} dB)"
            if name == "SR" and seg is not None:
                import jax.numpy as jnp

                pred_lab = np.asarray(seg(sr[None]))[0]
                gt_lab = np.asarray(seg(gt[None]))[0]
                dice = dice_coefficient(gt_lab, pred_lab)
                title += f"\nDice {np.mean(dice[1:]):.3f}"
            axes[0][j].set_title(title, fontsize=9)
            axes[0][j].axis("off")
            if zoom:
                y0, x0, hh, ww = zoom
                ref_h = gt.shape[0]
                sy = img.shape[0] / ref_h
                yy, xx = int(y0 * sy), int(x0 * sy)
                zh, zw = max(int(hh * sy), 1), max(int(ww * sy), 1)
                axes[1][j].imshow(
                    np.clip(img[yy : yy + zh, xx : xx + zw, 0], 0, 1), cmap="gray")
                axes[1][j].axis("off")
        path = join(out_dir, f"{pid}_slice{i}_x{scale}.png")
        fig.tight_layout()
        fig.savefig(path, dpi=150)
        plt.close(fig)
        paths.append(path)
    return paths


def plot_training_records(output_root: str, out_dir: str = None):
    """Loss/metric curves from a training output dir (result_plotter)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out_dir = out_dir or join(output_root, "plots")
    os.makedirs(out_dir, exist_ok=True)
    rec_path = join(output_root, "final_results", "training_records.npy")
    written = []
    if exists(rec_path):
        records = np.load(rec_path, allow_pickle=True).item()
        for ts, losses in records.get("training_loss_records", {}).items():
            plt.plot(losses)
            plt.xlabel("epoch")
            plt.ylabel("loss")
            plt.title(ts)
            plt.grid(True)
            p = join(out_dir, f"replot_{ts}_loss.png")
            plt.savefig(p)
            plt.close()
            written.append(p)
    # per-component curves (the checkpoint keeps the full per-step
    # component records — for GAN states this is the D/G stability
    # evidence: 'Adv_D Real' vs 'Adv_D Fake' diverging = D collapse,
    # which the total-loss curve above hides)
    host_path = join(output_root, "checkpoint", "host_state.json")
    if exists(host_path):
        import json as _json

        with open(host_path) as f:
            comp = _json.load(f).get("loss_records", {})
        comp = comp.get("records", comp)  # SRLoss.state_dict wrapper
        for ts, by_name in comp.items():
            if not isinstance(by_name, dict):
                continue
            if not by_name:
                continue
            for name, vals in sorted(by_name.items()):
                plt.plot(np.asarray(vals, np.float64), label=name, lw=0.8)
            plt.xlabel("recorded step")
            plt.ylabel("loss component")
            plt.yscale("log")
            plt.title(f"{ts} components")
            plt.legend()
            plt.grid(True, which="both", alpha=0.3)
            p = join(out_dir, f"replot_{ts}_components.png")
            plt.savefig(p)
            plt.close()
            written.append(p)
    return written


def main():
    ap = argparse.ArgumentParser(description="Render qualitative SR figures")
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--patient", required=True)
    ap.add_argument("--slices", type=int, nargs="+", default=[0])
    ap.add_argument("--scale", type=float, default=None)
    ap.add_argument("--zoom", type=int, nargs=4, default=None,
                    metavar=("Y", "X", "H", "W"))
    ap.add_argument("--unet", default=None)
    ap.add_argument("--out", default="figures")
    args = ap.parse_args()

    from rdst_tpu.config import ParametersLoader

    paras = ParametersLoader(args.config_file)
    paths = render_patient_figures(paras, args.patient, args.slices, args.scale,
                                   args.zoom, args.unet, args.out)
    for p in paths:
        print(f"wrote {p}")


if __name__ == "__main__":
    main()
