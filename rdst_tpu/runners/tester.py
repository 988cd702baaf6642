"""Testing/inference orchestration (TransSRTester equivalent).

Re-design of /root/reference/models/{basic_tester.py:22-415,
trans_sr_tester.py:28-238}:

* per-patient loop building a fresh per-patient test dataset;
* result-caching resume: cases with a saved report are skipped
  (basic_tester.py:148-155);
* inference batches ALL slices of a patient per scale through one
  jitted forward and fetches results once (tunnel-readback aware);
* 'bicubic' model mode is a pass-through that scores the interpolated
  LR (trans_sr_tester.py:85-98);
* artifacts: Final_Predictions dir tree, per-case
  ``{pid}_inference_results.npz`` / ``{pid}_eva_reports.npy``,
  stacked tabulate summary, testing_log.txt.

Checkpoint loading: native ``.msgpack`` snapshots from the trainer, or
reference ``.pt`` torch checkpoints through the import bridge.
"""

from __future__ import annotations

import os
import time
from os.path import exists, join
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from rdst_tpu.data import ops
from rdst_tpu.data.readers import make_test_dataset, testing_patient_ids
from rdst_tpu.models import build_generator
from rdst_tpu.parallel import (make_mesh_from_paras, replicate_tree,
                               shard_batch_padded, shard_params_tp)


def _fancy(msg: str) -> str:
    bar = "#" * max(32, len(msg) + 8)
    return f"\n{bar}\n#   {msg}\n{bar}\n"


class SRTester:
    def __init__(self, paras):
        self.paras = paras
        self.verbose = paras.verbose
        self.mesh = make_mesh_from_paras(paras)
        self.bicubic = paras.get("feature_generator") == "bicubic"

        # inference_dtype = 'bfloat16' engages the production fast path
        # (fused Pallas kernels, ~64 dB output agreement vs f32 on
        # RDST-E1); params and reported metrics stay f32. Framework
        # extension — the reference is implicitly f32 (torch default).
        idt = str(paras.get("inference_dtype", "float32")).lower()
        self.infer_dtype = (jnp.bfloat16 if idt in ("bfloat16", "bf16")
                            else jnp.float32)
        # pallas_kernels / pallas_quant config keys -> trace-time env
        # gates (e.g. swinir_std ships pallas_quant='qkv': int8 qkv is
        # a measured +3.7% at C=180, quality-neutral — PERF.md)
        from rdst_tpu.kernels.window_attention import export_kernel_flags

        export_kernel_flags(paras)
        # pallas_softmax='auto': pick clamp vs stable from the audited
        # attn_logit_max stamp in the checkpoint's stats sidecar —
        # BEFORE the first trace (the variant is a trace-time gate)
        from rdst_tpu.checkpoint.loading import resolve_pallas_softmax

        resolve_pallas_softmax(None if self.bicubic else self._model_path())
        # normalized-input configs bake training-set mean/std into the
        # model's mean_shift (module attrs, not params) — the tester must
        # rebuild them from the SAME training volumes or every output is
        # offset by the dataset mean (the reference carries them inside
        # the torch checkpoint instead, networks/common.py:151-167)
        mean = std = None
        norm = paras.normal_inputs or ""
        if not self.bicubic and ("zero_mean" in norm or "unit_std" in norm):
            mean, std = self._resolve_norm_stats()
        self.model = (None if self.bicubic
                      else build_generator(paras, mean, std,
                                           dtype=self.infer_dtype))
        self.params = None
        self._eval_fns = {}

        # MetaSR model embedding blend at eval (meta_sr_trainer.py:171-172)
        self.residual_scale = float(paras.get("residual_scale", 0.0) or 0.0)
        self.patient_ids = testing_patient_ids(paras)
        self.sr_scales = list(paras.get("sr_scales_for_final_testing",
                                        paras.test_sr_scales))
        # test datasets build pairs from test_sr_scales; the tester scores
        # sr_scales_for_final_testing — align them (the reference relies on
        # the config keeping both in sync, trans_sr_tester.py:115-122)
        paras.set("test_sr_scales", self.sr_scales)

        # the tester's eval uses the testing metric set (trans_sr_tester.py:115-122)
        if "BraTS" in paras.data_folder:
            from rdst_tpu.metrics.evaluation import MultiModalityMetaSREvaluation

            self.eva_func = MultiModalityMetaSREvaluation(
                paras.modalities_brats, paras.eva_metrics_for_testing,
                self.sr_scales, paras.gpu_id, "full")
        else:
            from rdst_tpu.metrics.evaluation import MetaSREvaluation

            self.eva_func = MetaSREvaluation(
                paras.eva_metrics_for_testing, self.sr_scales, paras.gpu_id, "full")
        gan_type = paras.get("gan_type", "None")
        self.output_root = join(paras.output_dir,
                                f"{paras.model_name}_{gan_type}_Final_Predictions")
        self.dirs = {
            name: join(self.output_root, name)
            for name in ("inference_results", "eva_reports", "images")
        }
        self.log_file = join(self.output_root, "testing_log.txt")

    def _model_path(self):
        from rdst_tpu.checkpoint.loading import resolve_model_path

        return resolve_model_path(self.paras)

    def _resolve_norm_stats(self):
        from rdst_tpu.checkpoint.loading import resolve_norm_stats

        return resolve_norm_stats(self.paras, self._model_path())

    # -- setup ---------------------------------------------------------------

    def setup(self):
        os.makedirs(self.output_root, exist_ok=True)
        for d in self.dirs.values():
            os.makedirs(d, exist_ok=True)
        if self.bicubic:
            self.write_log(_fancy("Bicubic pass-through mode"))
            return
        path = self._model_path()
        if not path:
            raise ValueError("no well-trained model path configured")
        self.params = self.load_params(path)
        if self.mesh.shape.get("model", 1) > 1:  # TP inference
            self.params = shard_params_tp(self.mesh, self.params)
        else:
            self.params = replicate_tree(self.mesh, self.params)
        self.write_log(_fancy(f"Loaded well-trained model: {path}"))

    def load_params(self, path: str):
        from rdst_tpu.checkpoint.loading import load_well_trained_params

        return load_well_trained_params(self.model, self.paras, path,
                                        self.sr_scales)

    # -- inference -------------------------------------------------------------

    def _eval_fn(self, key):
        if key not in self._eval_fns:
            import functools

            model = self.model
            dtype = self.infer_dtype

            @functools.partial(jax.jit, static_argnums=(2, 3))
            def eval_step(params, x, sr_factor, sr_scale=None):
                out = model.apply(params, x.astype(dtype),
                                  sr_scale if sr_scale is not None
                                  else sr_factor)
                return out.astype(jnp.float32)

            self._eval_fns[key] = eval_step
        return self._eval_fns[key]

    def inference_patient(self, ds) -> List[Dict[float, np.ndarray]]:
        """SR all slices of a patient; returns per-slice {scale: HWC}.

        Two modes: whole-slice (default — the reference example configs run
        the full LR slice through the net, trans_sr_tester.py:141-146) or
        tiled patch inference via the overlap-normalized un/folders when
        ``tiled_inference = True`` (the §5.7 machinery,
        basic_dataset.py:347-449 / OASIS_dataset.py:246-271).
        """
        pairs = [ds.get_test_pair(i) for i in range(ds.test_len())]
        recs = [dict() for _ in pairs]
        tiled = self.paras.get("tiled_inference", False) and not self.bicubic
        for s in self.sr_scales:
            lr = np.concatenate([p[s]["in"] for p in pairs], axis=0)
            if self.bicubic:
                out = np.stack([
                    ops.resize(x, p[s]["gt"].shape[:2])
                    for x, p in zip(lr, pairs)
                ])
            elif tiled:
                out = self._tiled_inference(lr, s, pairs)
            else:
                # batch-parallel over the 'data' mesh axis (SURVEY §7.1.8)
                xb, nb = shard_batch_padded(self.mesh, lr)
                fn = self._eval_fn((xb.shape, s))
                sr_scale = None
                if self.paras.scale_free:  # static real scale
                    sr_scale = float(pairs[0][s]["real_sr_scale"])
                out = np.asarray(fn(self.params, xb, float(s), sr_scale))[:nb]
            if self.residual_scale > 0 and not self.bicubic:
                res = np.stack([
                    np.asarray(ops.resize(x, p[s]["gt"].shape[:2])).reshape(
                        out.shape[1:])
                    for x, p in zip(lr, pairs)
                ])
                out = out * (1.0 - self.residual_scale) + res * self.residual_scale
            for i in range(len(pairs)):
                recs[i][s] = out[i]
        return recs, pairs

    def _tiled_inference(self, lr: np.ndarray, s: float, pairs) -> np.ndarray:
        """Patch-unfold -> SR each patch -> overlap-normalized fold."""
        from rdst_tpu.data.folding import ImageFolder

        n, h, w, c = lr.shape
        patch = int(self.paras.patch_size)
        stride = int(self.paras.get("test_lr_patch_stride", patch))
        lr_folder = ImageFolder((n, h, w, c), patch, stride)
        hr_shape = pairs[0][s]["gt"].shape
        # derive the HR grid from the TRUE LR->HR ratio, not int(s):
        # fractional / scale_free scales produce non-integer nominal s
        r = hr_shape[0] / h
        hr_folder = ImageFolder((n, hr_shape[0], hr_shape[1], c),
                                int(round(patch * r)), int(round(stride * r)))
        patches = np.asarray(lr_folder.unfold(jnp.asarray(lr)))
        ndev = self.mesh.shape["data"]
        chunk = -(-max(self.paras.batch_size * 4, 8) // ndev) * ndev
        sr_scale = None
        if self.paras.scale_free:  # static REAL scale, like the
            sr_scale = float(pairs[0][s]["real_sr_scale"])  # non-tiled path
        fn = self._eval_fn(((chunk,) + patches.shape[1:], s, "tiled"))
        outs, pads = [], []
        for i in range(0, patches.shape[0], chunk):
            block = patches[i : i + chunk]
            pad = chunk - block.shape[0]
            if pad:
                block = np.concatenate([block, block[-1:].repeat(pad, 0)])
            xb, _ = shard_batch_padded(self.mesh, block)
            # keep results on-device; ONE fetch after the loop (per-chunk
            # readback through the tunnel would serialize dispatches)
            outs.append(fn(self.params, xb, float(s), sr_scale))
            pads.append(pad)
        host = jax.device_get(outs)
        sr_patches = np.concatenate(
            [o[: o.shape[0] - p] if p else o for o, p in zip(host, pads)])
        return np.asarray(hr_folder.fold(jnp.asarray(sr_patches)))

    # -- evaluation with resume (basic_tester.py:147-189) -----------------------

    def evaluation(self, case_name: str, ds) -> Dict:
        report_path = join(self.dirs["eva_reports"], f"{case_name}_eva_reports.npy")
        if exists(report_path):
            self.write_log(f"{case_name}: cached report found, skipping inference")
            return np.load(report_path, allow_pickle=True).item()

        t0 = time.time()
        recs, pairs = self.inference_patient(ds)
        infer_cost = time.time() - t0

        report = self.eva_func(recs, pairs)
        if isinstance(report, dict):
            meta = {"inference_time_cost": infer_cost, "num_slices": len(recs)}
            np.save(report_path, {"report": report, **meta})
        # persist SR volumes for the saving scales
        save_scales = self.paras.get("sr_scales_for_saving", [])
        to_save = {
            f"x{s}": np.stack([r[s] for r in recs])
            for s in save_scales if s in (self.sr_scales or [])
        }
        if to_save:
            np.savez_compressed(
                join(self.dirs["inference_results"],
                     f"{case_name}_inference_results.npz"), **to_save)
        self.write_log(
            f"{case_name}: {len(recs)} slices, inference {infer_cost:.2f}s "
            f"({len(recs) * len(self.sr_scales) / max(infer_cost, 1e-9):.1f} slices/s)")
        return {"report": report, "inference_time_cost": infer_cost,
                "num_slices": len(recs)}

    # -- main loop ---------------------------------------------------------------

    def test(self):
        all_reports = []
        for pid in self.patient_ids:
            self.write_log(_fancy(f"Testing patient {pid}"))
            ds = make_test_dataset(self.paras, [pid])
            result = self.evaluation(pid, ds)
            all_reports.append(result["report"])

        stacked = self.eva_func.stack_eva_reports(all_reports)
        summary = self.eva_func.print(stacked)
        self.write_log(_fancy("All patients complete") + summary)
        np.save(join(self.output_root, "stacked_eva_reports.npy"), stacked)
        return stacked

    def write_log(self, plog: str):
        with open(self.log_file, "a") as f:
            f.write(plog + "\n")
        if self.verbose:
            print(plog, flush=True)


TransSRTester = SRTester
