"""Training orchestration (the TransSRTrainer equivalent).

TPU-first re-design of /root/reference/models/{basic_trainer.py:21-507,
trans_sr_trainer.py:22-283}:

* ONE jitted, batch-sharded ``train_step`` (value_and_grad + optax
  update + in-graph loss_threshold divergence guard via lax.cond)
  instead of the eager loop — "epoch" remains one optimizer step;
* host-side sampler thread keeps a double-buffered device queue
  (replaces DataLoader's 8 worker processes);
* multi-stage training states drive per-state loss scalars; each state
  gets its own compiled step (scalars are compile-time constants);
* quick_eva batches all sampled validation slices through a jitted
  eval step and fetches results once (the axon-tunnel readback is
  ~600ms, so per-slice fetches are forbidden on the hot path);
* checkpoint/resume via orbax (train-state pytree) + JSON host state,
  same artifact semantics: auto-resume from ``checkpoint/``, per-stage
  snapshots ``models/{state}_model_g.msgpack``, text log, loss/metric
  plots, qualitative image grids.
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time
from functools import partial
from os.path import exists, join
from typing import Dict, Optional

from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np

from rdst_tpu.losses.sr_loss import SRLoss
from rdst_tpu.models import build_generator
from rdst_tpu.parallel import (make_mesh_from_paras, replicate_tree,
                               shard_batch, shard_batch_padded,
                               shard_params_tp)
from rdst_tpu.utils.optim import Timer, make_optimizer, tree_finite


def fancy_print(msg: str) -> str:
    bar = "#" * max(32, len(msg) + 8)
    return f"\n{bar}\n#   {msg}\n{bar}\n"


class TrainState:
    """Minimal explicit train state (params + opt_state + step)."""

    def __init__(self, params, opt_state, step: int = 0):
        self.params = params
        self.opt_state = opt_state
        self.step = step

    def tree(self):
        return {"params": self.params, "opt_state": self.opt_state}


class SRTrainer:
    """Generator-only SR trainer (covers TransSR/SOTA-SR/IPT loops)."""

    def __init__(self, paras, ds_train, ds_valid, seed: int = 0):
        self.paras = paras
        self.ds_train = ds_train
        self.ds_valid = ds_valid
        self.verbose = paras.verbose

        # config-driven mesh: mesh_shape/mesh_axes keys select dp/tp/sp
        # (default: 1-D data-parallel mesh over all local devices)
        self.mesh = make_mesh_from_paras(paras)
        self.spatial_axis = "seq" if self.mesh.shape.get("seq", 1) > 1 else None
        self.rng = np.random.default_rng(seed)
        self.jax_rng = jax.random.PRNGKey(seed)

        mean = getattr(ds_train, "mean", [0.0])
        std = getattr(ds_train, "std", [1.0])
        # bf16 mixed-precision training (training_dtype = 'bfloat16'):
        # bf16 activations via the flax computation dtype, params and
        # optimizer state stay f32 (param_dtype default), and the loss
        # is computed in f32 (pred upcast in g_loss_and_report)
        tdt = str(paras.get("training_dtype", "") or "").lower()
        self.training_dtype = (jnp.bfloat16 if tdt in ("bfloat16", "bf16")
                               else jnp.float32)
        # pallas_train = 'pair': fused fwd+bwd DSTL-pair kernels inside
        # the jitted train step (kernels/pair_train.py; needs bf16).
        # Exported as the env flag the trace-time gate reads. Same
        # semantics as export_kernel_flags: an ABSENT key leaves the
        # env untouched (RDST_TPU_PALLAS_TRAIN stays a valid opt-in per
        # the pallas_train_mode docstring); a present-but-off key
        # clears it, so one config can switch kernels off for a later
        # trainer in the same process (tools/bench_all.py also pops the
        # env between records).
        import os as _os

        ptk = paras.get("pallas_train")
        if (ptk is None and self.training_dtype == jnp.bfloat16
                and "RDST_TPU_PALLAS_TRAIN" not in _os.environ):
            # default ON for bf16 training since the r4 hardware win
            # (26.6 vs 15.5 steps/s chip-paced with the stable softmax,
            # BENCH_EXTRA record 9; clamp-era measured 33.9;
            # HBM/step 92 GB -> 11 GB). The kernel self-gates: it only
            # engages where the geometry fits VMEM and dropout rates
            # are 0 (nn/swin.py), falling back to XLA autodiff
            # otherwise, so the default is safe for any config. An
            # explicit pallas_train config key or env var (even 'off')
            # still wins.
            ptk = "pair"
        if ptk is not None:
            ptk = str(ptk).strip().lower()
            if ptk and ptk not in ("none", "0", "false", "off"):
                _os.environ["RDST_TPU_PALLAS_TRAIN"] = ptk
            else:
                _os.environ.pop("RDST_TPU_PALLAS_TRAIN", None)
        # pallas_kernels / pallas_quant keys drive the EVAL-path kernels
        # (quick_eva / final eval run deterministic=True inference)
        from rdst_tpu.kernels.window_attention import export_kernel_flags

        export_kernel_flags(paras)
        # pallas_softmax='auto' during TRAINING: start from the audited
        # bound (fresh inits have near-zero logits -> clamp; warm starts
        # read the pre_trained_g sidecar stamp), re-audit at every
        # quick-eva, and escalate to the stable softmax mid-run via
        # re-jit once the bound nears the margin (_maybe_escalate_softmax)
        self._logit_bound = None      # running max audited attn logit
        self._logit_probe = None      # lazily built (needs eval inputs)
        self._remake_step_fn = False  # softmax flip -> re-jit train step
        self._softmax_auto = (
            _os.environ.get("RDST_TPU_PALLAS_SOFTMAX") == "auto")
        self._softmax_mode = _os.environ.get("RDST_TPU_PALLAS_SOFTMAX", "")
        if self._softmax_auto:
            from rdst_tpu.checkpoint.loading import read_stats_sidecar
            from rdst_tpu.kernels.swin_block import resolve_softmax_auto

            tl = paras.get("pre_trained_g")
            bound = ((read_stats_sidecar(str(tl)) or {}).get(
                "attn_logit_max") if tl else 0.0)
            self._softmax_mode = resolve_softmax_auto(bound)
            _os.environ["RDST_TPU_PALLAS_SOFTMAX"] = self._softmax_mode
        self.model = build_generator(paras, mean, std,
                                     dtype=self.training_dtype)
        self.tx = make_optimizer(paras)
        self.loss = SRLoss(paras)

        self.training_states = list(paras.training_states)
        self.epochs_in_total: Dict[str, int] = dict(paras.epochs_in_total)
        self.check_every = paras.check_every
        self.loss_threshold = paras.loss_threshold
        # MetaSR model embedding: blend the reconstruction with the
        # interpolated-LR residual image (meta_sr_trainer.py:111-112)
        self.residual_scale = float(paras.get("residual_scale", 0.0) or 0.0)
        self.batch_size = paras.batch_size
        # Flush device-side loss scalars to host every N steps in ONE
        # device_get instead of syncing every step: lets the host enqueue
        # the next steps while the device computes (per-fetch RPC through
        # the dev tunnel is the pacing cost). Bounded so at most N steps'
        # input batches are in flight on the device queue.
        self.scalar_flush_steps = int(paras.get("scalar_flush_steps", 64) or 64)

        # Stall watchdog (failure detection, SURVEY §5.3): a lost device
        # RPC leaves the host blocked inside a fetch with 0 CPU and no
        # error — observed in production on the axon tunnel. The watchdog
        # logs after ``stall_warn_s`` without a completed step (default
        # 600 s: first-compile of a big train step can take minutes) and,
        # when ``stall_abort_s`` > 0, hard-exits the process so an outer
        # supervisor loop can restart it — training auto-resumes from the
        # last checkpoint.
        self.stall_warn_s = float(paras.get("stall_warn_s", 600) or 0)
        self.stall_abort_s = float(paras.get("stall_abort_s", 0) or 0)
        # RSS self-watch (failure detection, SURVEY §5.3): a 100k-step
        # production run was OOM-killed at 130 GB host RSS (the axon
        # client accumulates per-dispatch state across very long
        # fast-dispatch runs) — and a SIGKILL can land mid-checkpoint.
        # When ``rss_restart_gb`` > 0 the watchdog thread flags RSS
        # above the threshold; the step loop then saves a checkpoint at
        # the next step boundary and exits 17 so the supervisor
        # restarts it cleanly (auto-resume, zero interval lost).
        self.rss_restart_gb = float(paras.get("rss_restart_gb", 0) or 0)
        self._rss_exceeded = False
        self._wd_step = -1  # heartbeat: last completed loop iteration
        # metrics.jsonl per-component cursor: loss.records length already
        # consumed per (state, component) — see log_metrics
        self._metrics_consumed: Dict[tuple, int] = {}

        self.quick_eva_func = ds_valid.get_quick_eva_func()
        self.final_eva_func = ds_valid.get_final_eva_func()
        self.quick_eva_num_samples = paras.quick_eva_num_samples
        self.num_images_to_save = paras.quick_eva_num_images_to_save

        # host-side bookkeeping (mirrors checkpoint.tar contents)
        self.current_state_id = 0
        self.current_epoch = 0  # within the current training state
        self.training_loss_records: Dict[str, list] = {}
        self.quick_validation_reports: list = []
        self.training_epoch_costs: list = []

        self.state: Optional[TrainState] = None
        self.d_state = None  # adversarial discriminator state (params/stats/opt)
        self._eval_fns = {}
        self._last_total_f = float("nan")  # latest fetched loss, raw
        # best-quick-eva snapshot retention (per training state): small
        # corpora overfit long runs, so the rolling latest checkpoint can
        # be strictly worse than an earlier one — keep the best too.
        # (Framework extension; the reference keeps only the final
        # weights, basic_trainer.py save_models.)
        self._best_quick: Dict[str, float] = {}

        # output tree (basic_trainer.py:82-108)
        gan_type = paras.get("gan_type", "None")
        self.output_root = join(paras.output_dir, f"{paras.model_name}_{gan_type}")
        self.dirs = {
            name: join(self.output_root, name)
            for name in ("models", "records", "plots", "final_results", "inferences")
        }
        self.checkpoint_dir = join(self.output_root, "checkpoint")
        self.log_file = join(self.output_root, "training_log.txt")
        # structured twin of the text log (SURVEY §5.5's JSONL addition):
        # one record per check interval, machine-readable for dashboards
        self.metrics_file = join(self.output_root, "metrics.jsonl")

    # -- setup / checkpointing ----------------------------------------------

    def setup(self):
        os.makedirs(self.output_root, exist_ok=True)
        for d in self.dirs.values():
            os.makedirs(d, exist_ok=True)
        self.write_log(str(self.paras))

        # setup dispatches device work too (jitted init, checkpoint
        # restore) and a lost RPC can wedge it exactly like a train step
        # — observed in production. NB: stall_abort_s must exceed the
        # worst-case first-compile + first-execution of a fresh program.
        with self._stall_watchdog():
            self._setup_inner()

    def _setup_inner(self):
        x0 = jnp.zeros((1, self.paras.patch_size, self.paras.patch_size,
                        self.paras.input_channel), jnp.float32)
        if self.paras.scale_free:
            # static scale: MetaUpSampler's index plan resolves at trace time
            smax = float(max(self.ds_train.sr_scales))
            params = jax.jit(
                lambda r, x: self.model.init(r, x, smax)
            )(jax.random.PRNGKey(0), x0)
        else:
            # touch every training scale at init: the multi-scale conv
            # families (MDSR/IPT) create per-scale heads/tails lazily;
            # single-scale models ignore the argument
            scales = sorted({float(s) for s in self.ds_train.sr_scales})

            def init_method(mdl, x):
                out = None
                for s in scales:
                    out = mdl(x, s)
                return out

            params = jax.jit(
                lambda r, x: self.model.init(r, x, method=init_method)
            )(jax.random.PRNGKey(0), x0)
        params, tl_log = self.weights_init(params)
        opt_state = self.tx.init(params)
        self.state = TrainState(params, opt_state)

        if self.loss.adversarial is not None:
            hr = int(self.paras.patch_size * max(self.ds_train.sr_scales))
            hr0 = jnp.zeros((1, hr, hr, self.paras.input_channel), jnp.float32)
            self.d_state = self.loss.adversarial.init(jax.random.PRNGKey(1), hr0)
            tl_log += self._weights_init_d()
        self.write_log(tl_log.rstrip("\n"))

        if exists(join(self.checkpoint_dir, "host_state.json")):
            self.load_checkpoint()
            self.write_log(fancy_print(
                f"Resumed from checkpoint: state_id={self.current_state_id} "
                f"epoch={self.current_epoch}"))
        else:
            self.write_log(fancy_print("Model initialized from scratch"))

        if self.mesh.shape.get("model", 1) > 1:
            # TP: parameter output-features split over the 'model' axis.
            # opt_state moments mirror the params tree (paths included),
            # so the same spec rule places them consistently.
            self.state.params = shard_params_tp(self.mesh, self.state.params)
            self.state.opt_state = shard_params_tp(self.mesh, self.state.opt_state)
        else:
            self.state.params = replicate_tree(self.mesh, self.state.params)
            self.state.opt_state = replicate_tree(self.mesh, self.state.opt_state)

    # -- transfer learning (reference weights_init) ---------------------------

    def _tl_arch(self) -> str:
        """Generator arch key for the torch-import mapper registry."""
        raw = self.paras.get("feature_generator") or self.paras.get("sr_generator")
        name = str(raw).strip().lower()
        return {"swin": "swinir", "convnet-large": "convnext",
                "convnet-lite": "convnext"}.get(name, name)

    def _load_pretrained_tree(self, path: str, template):
        """Weights-only load of a generator variables tree.

        Accepts this framework's flax msgpack snapshots
        (``models/{state}_model_g[_best].msgpack`` / the weights assets)
        and torch ``.pt``/``.pth`` state_dicts routed through
        checkpoint/torch_import (shape-verified against the fresh init).
        """
        template = jax.device_get(template)
        if path.endswith((".pt", ".pth")):
            from rdst_tpu.checkpoint.torch_import import (
                load_torch_checkpoint, verify_params_match)

            converted = load_torch_checkpoint(path, self._tl_arch())
            verify_params_match(converted, template)
            new = dict(template)
            new["params"] = jax.tree.map(
                lambda t, v: np.asarray(v, dtype=np.asarray(t).dtype),
                template["params"], converted["params"])
            return new
        from flax import serialization

        with open(path, "rb") as f:
            return serialization.from_bytes(template, f.read())

    def weights_init(self, params):
        """Pre-trained warm-start for G — the reference's ``weights_init``
        (/root/reference/models/trans_sr_trainer.py:246-283): when
        ``pre_trained_g`` names an existing file, initialize the
        generator weights from it (no optimizer state); otherwise keep
        the default flax init. Returns (params, plog)."""
        plog = ""
        g_path = self.paras.get("pre_trained_g")
        if isinstance(g_path, str) and g_path not in ("", "None"):
            if exists(g_path):
                params = self._load_pretrained_tree(g_path, params)
                plog += f"Init G with pre-trained model: {g_path}\n"
            else:
                raise FileNotFoundError(
                    f"pre_trained_g points at a missing file: {g_path}")
        else:
            plog += "Initialize G by default (flax init)\n"
        return params, plog

    def _weights_init_d(self) -> str:
        """Discriminator half of weights_init: weights-only restore of
        the adversarial state from a ``{state}_loss_d.msgpack`` snapshot
        (opt_state in the snapshot is discarded and re-initialized)."""
        d_path = self.paras.get("pre_trained_d")
        if not (isinstance(d_path, str) and d_path not in ("", "None")):
            return "Initialize D by default (flax init)\n"
        if not exists(d_path):
            raise FileNotFoundError(
                f"pre_trained_d points at a missing file: {d_path}")
        if d_path.endswith((".pt", ".pth")):
            raise ValueError(
                "pre_trained_d torch import is not mapped — export the "
                "discriminator to msgpack (models/{state}_loss_d.msgpack) "
                "and point pre_trained_d at that instead")
        from flax import serialization

        # weights-only: restore the params sub-tree against its own
        # template and re-init the optimizer. Matching the WHOLE d_state
        # (from_bytes on the full tree) would require the snapshot's
        # opt_state to structurally match the current optimizer config —
        # but a D saved under a different gan_type/optimizer is still
        # perfectly usable as a weights-only warm start.
        with open(d_path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        host = jax.device_get(self.d_state)
        params = serialization.from_state_dict(host["params"], raw["params"])
        bstats = serialization.from_state_dict(
            host["batch_stats"], raw.get("batch_stats", {}))
        self.d_state = {
            "params": params, "batch_stats": bstats,
            "opt_state": self.loss.adversarial.tx.init(params),
        }
        return f"Init Adversarial Loss with pre-trained model: {d_path}\n"

    def save_checkpoint(self):
        import orbax.checkpoint as ocp

        path = os.path.abspath(join(self.checkpoint_dir, "state"))
        ckpt = ocp.PyTreeCheckpointer()
        tree = self.state.tree()
        if self.d_state is not None:
            tree = dict(tree, d_state=self.d_state)
        ckpt.save(path, tree, force=True)
        host = {
            "current_state_id": self.current_state_id,
            "current_epoch": self.current_epoch,
            "step": self.state.step,
            "training_loss_records": self.training_loss_records,
            "training_epoch_costs": self.training_epoch_costs,
            "loss_records": self.loss.state_dict(),
            "best_quick": self._best_quick,
            "logit_bound": self._logit_bound,
        }
        with open(join(self.checkpoint_dir, "host_state.json"), "w") as f:
            json.dump(host, f)
        np.save(join(self.dirs["records"], "quick_validation_reports.npy"),
                np.asarray(self.quick_validation_reports, dtype=object))

    def load_checkpoint(self):
        import orbax.checkpoint as ocp

        path = os.path.abspath(join(self.checkpoint_dir, "state"))
        ckpt = ocp.PyTreeCheckpointer()
        template = self.state.tree()
        if self.d_state is not None:
            template = dict(template, d_state=self.d_state)
        restored = ckpt.restore(path, item=jax.tree.map(np.asarray, template))
        self.state = TrainState(restored["params"], restored["opt_state"])
        if self.d_state is not None:
            self.d_state = restored["d_state"]
        with open(join(self.checkpoint_dir, "host_state.json")) as f:
            host = json.load(f)
        self.current_state_id = host["current_state_id"]
        self.current_epoch = host["current_epoch"]
        self.state.step = host["step"]
        self.training_loss_records = host["training_loss_records"]
        self.training_epoch_costs = host["training_epoch_costs"]
        self.loss.load_state_dict(host["loss_records"])
        self._best_quick = dict(host.get("best_quick", {}))
        # restore the audited logit bound and re-run the auto-softmax
        # escalation check: a resume must not restart in clamp after
        # the pre-crash run already measured an unbounded regime
        if host.get("logit_bound") is not None:
            self._logit_bound = float(host["logit_bound"])
            self._maybe_escalate_softmax()
        reports = join(self.dirs["records"], "quick_validation_reports.npy")
        if exists(reports):
            self.quick_validation_reports = list(np.load(reports, allow_pickle=True))

    def _write_stats_sidecar(self, snapshot_path: str) -> None:
        """Persist the training-set normalization stats next to the
        snapshot so test-time zero_mean/unit_std configs are
        self-contained (the reference bakes them into the torch
        checkpoint's MeanShift convs, networks/common.py:151-167;
        here they are module attrs, not params)."""
        mean = getattr(self.ds_train, "mean", None)
        std = getattr(self.ds_train, "std", None)
        stats = {}
        if mean is not None or std is not None:
            stats["mean"] = np.asarray(mean, np.float64).tolist()
            stats["std"] = np.asarray(std, np.float64).tolist()
        if self._logit_bound is not None:
            # audited max attention logit (running max over quick-eva
            # probes) — pallas_softmax='auto' resolves clamp vs stable
            # against this stamp (checkpoint.loading.resolve_pallas_softmax)
            stats["attn_logit_max"] = round(float(self._logit_bound), 3)
        if not stats:
            return
        with open(os.path.splitext(snapshot_path)[0] + ".stats.json", "w") as f:
            json.dump(stats, f)

    def save_models(self, training_state: str):
        from flax import serialization

        params = jax.device_get(self.state.params)
        path = join(self.dirs["models"], f"{training_state}_model_g.msgpack")
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(params))
        self._write_stats_sidecar(path)
        self.write_log(f"Saved model snapshot: {path}")
        if self.d_state is not None:
            dpath = join(self.dirs["models"], f"{training_state}_loss_d.msgpack")
            with open(dpath, "wb") as f:
                f.write(serialization.to_bytes(jax.device_get(self.d_state)))
            self.write_log(f"Saved discriminator snapshot: {dpath}")

    # -- jitted steps ---------------------------------------------------------

    def _make_train_step(self, training_state: str):
        scalars = self.loss.loss_scalars[training_state]
        threshold = float(self.loss_threshold)
        model, tx, loss = self.model, self.tx, self.loss
        adv = self.loss.adversarial
        gan_active = adv is not None and any("GAN" in n for n in scalars)

        def forward(p, batch, rng, sr_factor):
            # every family takes the batch's scale as a static python float
            # (one compiled step per scale bucket): MetaUpSampler's index
            # plan is resolved at trace time, and MDSR/IPT pick per-scale
            # heads statically. scale_free batches carry the REAL
            # (integer-rounded) scale in sr_factor; the per-item scale
            # column stays in the batch for the scale-conditional losses.
            return model.apply(
                p, batch["in"], sr_factor,
                deterministic=False,
                rngs={"dropout": rng, "droppath": jax.random.fold_in(rng, 1)},
            )

        rs = self.residual_scale

        def g_loss_and_report(p, batch, rng, d_state, sr_factor):
            # loss in f32 regardless of the activation dtype (bf16
            # mixed-precision keeps the loss/grad accumulation exact)
            pred = forward(p, batch, rng, sr_factor).astype(jnp.float32)
            if rs > 0:  # model embedding (meta_sr_trainer.py:111-112)
                pred = pred * (1.0 - rs) + batch["res"] * rs
            # one shared code path with SRLoss.__call__ (no divergence)
            return loss(pred, batch, training_state, adv_state=d_state)

        def guarded_update(params, opt_state, grads, total):
            ok = jnp.isfinite(total) & (total < threshold) & tree_finite(grads)

            def do_update(_):
                updates, new_opt = tx.update(grads, opt_state, params)
                return jax.tree.map(lambda a, b: a + b, params, updates), new_opt

            new_params, new_opt = jax.lax.cond(
                ok, do_update, lambda _: (params, opt_state), None)
            return new_params, new_opt, ok

        if not gan_active:
            @partial(jax.jit, donate_argnums=(0, 1), static_argnums=(4,))
            def train_step(params, opt_state, batch, rng, sr_factor):
                (total, report), grads = jax.value_and_grad(
                    g_loss_and_report, has_aux=True)(params, batch, rng, None, sr_factor)
                new_params, new_opt, ok = guarded_update(params, opt_state, grads, total)
                return new_params, new_opt, total, report, ok

            return train_step

        # alternating GAN step: D update(s) on stop_grad(fake), then G update
        # against the refreshed discriminator (adversarial.py:63-151 semantics)
        @partial(jax.jit, donate_argnums=(0, 1, 2), static_argnums=(5,))
        def gan_train_step(params, opt_state, d_state, batch, rng, sr_factor):
            fake = forward(params, batch, jax.random.fold_in(rng, 7), sr_factor)
            scales = batch.get("sr_scales")
            d_state, d_report = adv.d_step(
                d_state, fake, batch["out"], scales, jax.random.fold_in(rng, 11))
            (total, report), grads = jax.value_and_grad(
                g_loss_and_report, has_aux=True)(params, batch, rng, d_state, sr_factor)
            report.update(d_report)
            new_params, new_opt, ok = guarded_update(params, opt_state, grads, total)
            return new_params, new_opt, d_state, total, report, ok

        return gan_train_step

    def _eval_fn(self, shape):
        if shape not in self._eval_fns:
            model = self.model

            @partial(jax.jit, static_argnums=(2, 3))
            def eval_step(params, x, sr_factor, sr_scale=None):
                out = model.apply(params, x, sr_scale if sr_scale is not None
                                  else sr_factor)
                return out.astype(jnp.float32)  # metrics stay f32 on host

            self._eval_fns[shape] = eval_step
        return self._eval_fns[shape]

    # -- data feeding ---------------------------------------------------------

    def _sampler(self, n: int, out_q: "queue.Queue", seed: int):
        # exceptions must reach the main loop — a dead sampler thread would
        # otherwise leave train() blocked on q.get() forever
        rng = np.random.default_rng(seed)
        try:
            for _ in range(n):
                out_q.put(self.ds_train.sample(rng))
        except BaseException as e:  # noqa: BLE001 — re-raised in train()
            out_q.put(e)
            return
        out_q.put(None)

    @contextmanager
    def _stall_watchdog(self):
        """Run a stall watchdog for the enclosed block; always stopped —
        including on exception paths, where a leaked abort-mode watchdog
        would later os._exit(17) an otherwise-healthy process."""
        stop = None
        if self.stall_warn_s > 0:
            stop = threading.Event()
            threading.Thread(
                target=self._watchdog, daemon=True,
                args=(stop, self.stall_warn_s, self.stall_abort_s),
            ).start()
        try:
            yield
        finally:
            if stop is not None:
                stop.set()

    @staticmethod
    def _rss_gb() -> float:
        """Current resident set size in GiB (Linux /proc; 0.0 elsewhere)."""
        try:
            with open("/proc/self/statm") as f:
                pages = int(f.read().split()[1])
            return pages * os.sysconf("SC_PAGE_SIZE") / 2**30
        except (OSError, ValueError, IndexError):
            return 0.0

    def _watchdog(self, stop: "threading.Event", warn_s: float,
                  abort_s: float):
        """Log (and optionally abort) when the step loop stops beating."""
        last_step, last_t = self._wd_step, time.monotonic()
        warned = False
        poll = max(1.0, min(warn_s, 60.0))
        while not stop.wait(poll):
            if (self.rss_restart_gb > 0 and not self._rss_exceeded
                    and self._rss_gb() > self.rss_restart_gb):
                # flag only — the step loop exits at a SAFE boundary
                # (after a checkpoint), never mid-save like the OOM
                # killer would
                self.write_log(
                    f"WATCHDOG: host RSS {self._rss_gb():.1f} GiB > "
                    f"rss_restart_gb={self.rss_restart_gb:g} — will "
                    "checkpoint and exit 17 at the next step boundary")
                self._rss_exceeded = True
            step, now = self._wd_step, time.monotonic()
            if step != last_step:
                last_step, last_t, warned = step, now, False
                continue
            stalled = now - last_t
            if stalled >= warn_s and not warned:
                self.write_log(
                    f"WATCHDOG: no training progress for {stalled:.0f}s "
                    f"(step {step}); likely a wedged device dispatch/fetch")
                warned = True
            if abort_s > 0 and stalled >= abort_s:
                self.write_log(
                    f"WATCHDOG: aborting after {stalled:.0f}s stall — "
                    "restart to auto-resume from the last checkpoint")
                os._exit(17)
                return  # unreachable unless _exit is stubbed (tests)

    # -- main loop ------------------------------------------------------------

    def train(self):
        steps_this_run = 0
        for sid in range(self.current_state_id, len(self.training_states)):
            ts = self.training_states[sid]
            self.current_state_id = sid
            self.loss.set_training_state(ts)
            left = self.epochs_in_total[ts] - self.current_epoch
            if left <= 0:
                # state already trained to completion — but a crash in the
                # post-loop tail (save_models/final_eva run AFTER the last
                # checkpoint write) would otherwise skip those artifacts
                # forever on resume; redo them if the snapshot is missing
                model_file = join(self.dirs["models"], f"{ts}_model_g.msgpack")
                if not exists(model_file):
                    self.save_models(ts)
                    self.write_log(self.final_eva(ts))
                self.current_epoch = 0
                continue
            self.write_log(fancy_print(
                f"Training state {ts}: {left} epochs to go "
                f"(losses: {self.loss.active_terms(ts)})"))

            step_fn = self._make_train_step(ts)
            self._remake_step_fn = False  # fresh trace reads the current env
            q: "queue.Queue" = queue.Queue(maxsize=4)
            t = threading.Thread(
                target=self._sampler, args=(left, q, self.state.step + 17),
                daemon=True)
            t.start()

            timer = Timer()
            pending: list = []  # deferred (total, report) device scalars
            # one watchdog per state loop, stopped on every exit path
            # (exceptions included): the post-loop tail (final_eva) and
            # inter-state transitions are legitimately slow
            with self._stall_watchdog():
                while True:
                    batch = q.get()
                    if batch is None:
                        break
                    if isinstance(batch, BaseException):
                        raise batch
                    timer.tic()
                    host_batch = {"in": batch["in"], "out": batch["out"]}
                    if "seg_gt" in batch:
                        host_batch["seg_gt"] = batch["seg_gt"]
                    if self.residual_scale > 0:
                        host_batch["res"] = batch["res"]
                    if self.paras.scale_free or self.loss.adversarial is not None:
                        # ScaleGAN's D labels are 1/scale, so the adversarial
                        # path needs per-batch scales on fixed-scale configs too
                        scale_val = (batch["real_sr_scale"]
                                     if self.paras.scale_free
                                     else batch["sr_factor"])
                        host_batch["sr_scales"] = np.full(
                            (batch["in"].shape[0], 1), scale_val, np.float32)
                    device_batch = shard_batch(self.mesh, host_batch,
                                               spatial=self.spatial_axis)

                    self.jax_rng, step_rng = jax.random.split(self.jax_rng)
                    gan_active = (self.loss.adversarial is not None and
                                  any("GAN" in n for n in
                                      self.loss.loss_scalars[ts]))
                    sr_factor = float(batch["real_sr_scale"]
                                      if self.paras.scale_free
                                      else batch["sr_factor"])
                    if gan_active:
                        (self.state.params, self.state.opt_state, self.d_state,
                         total, report, ok) = step_fn(
                            self.state.params, self.state.opt_state, self.d_state,
                            device_batch, step_rng, sr_factor)
                    else:
                        (self.state.params, self.state.opt_state, total, report, ok
                         ) = step_fn(self.state.params, self.state.opt_state,
                                     device_batch, step_rng, sr_factor)

                    self.state.step += 1
                    self.current_epoch += 1
                    steps_this_run += 1
                    # host-side records: defer the scalar fetch — one batched
                    # device_get per flush window instead of a sync every step,
                    # so dispatch pipelines ahead of the device
                    pending.append((total, report))
                    at_check = self.current_epoch % self.check_every == 0
                    if len(pending) >= self.scalar_flush_steps or at_check:
                        self._flush_scalar_records(pending, ts)
                    self.training_epoch_costs.append(timer.toc())

                    if at_check:
                        plog = self.quick_eva()
                        self.save_checkpoint()
                        self.write_log(
                            f"[{ts}] epoch {self.current_epoch}/{self.epochs_in_total[ts]} "
                            f"loss={self._last_total_f:.6f} ({np.mean(self.training_epoch_costs[-self.check_every:]):.3f}s/epoch)\n"
                            + plog)
                        self.log_metrics(ts)
                        if self._remake_step_fn:
                            # auto-softmax escalated mid-run: re-trace
                            # the train step under the new variant
                            step_fn = self._make_train_step(ts)
                            self._remake_step_fn = False
                    self._wd_step = self.state.step  # watchdog heartbeat
                    if self._rss_exceeded:
                        # safe-boundary restart (see rss_restart_gb):
                        # flush + checkpoint HERE, then exit 17 for the
                        # supervisor — beats letting the OOM killer
                        # SIGKILL mid-save
                        self._flush_scalar_records(pending, ts)
                        self.save_checkpoint()
                        self.write_log(
                            f"RSS restart: checkpoint saved at step "
                            f"{self.state.step}; exiting 17 for the "
                            "supervisor to restart (auto-resume)")
                        os._exit(17)

                self._flush_scalar_records(pending, ts)
            self.save_models(ts)
            self.write_log(self.final_eva(ts))
            self.current_epoch = 0
        self.training_complete(steps_this_run)

    def _flush_scalar_records(self, pending, ts):
        """Drain the deferred per-step loss scalars in ONE device_get.

        The in-graph divergence guard (lax.cond on loss_threshold) already
        protects the params, so the host-side threshold filter here is
        purely about keeping diverged steps out of the records/plots —
        it can run arbitrarily late.
        """
        if not pending:
            return
        host = jax.device_get(pending)
        pending.clear()
        for total_f, report in host:
            total_f = float(total_f)
            # _last_total_f keeps the RAW latest loss (even diverged/
            # filtered ones) so checkpoint-boundary log lines show the
            # actual current value, not the last accepted one
            self._last_total_f = total_f
            if np.isfinite(total_f) and total_f < self.loss_threshold:
                self.loss.record(
                    {k: float(v) for k, v in report.items()}, ts)
                self.training_loss_records.setdefault(ts, []).append(total_f)

    # -- evaluation -----------------------------------------------------------

    def _infer_pairs(self, ids):
        """Batched whole-slice inference; one device->host fetch per scale."""
        pairs = [self.ds_valid.get_test_pair(i) for i in ids]
        recs = [dict() for _ in ids]
        scales = sorted(pairs[0].keys())
        for s in scales:
            lr = np.concatenate([p[s]["in"] for p in pairs], axis=0)
            # batch-parallel slice inference over the 'data' mesh axis
            # (SURVEY §7.1.8); padding keeps any N valid
            xb, nb = shard_batch_padded(self.mesh, lr)
            fn = self._eval_fn(xb.shape + (s,))
            sr_scale = None
            if self.paras.scale_free:  # static real scale (trace-time plan)
                sr_scale = float(pairs[0][s]["real_sr_scale"])
            out = np.asarray(fn(self.state.params, xb, float(s), sr_scale))[:nb]
            if self.residual_scale > 0:  # meta_sr_trainer.py:171-172
                from rdst_tpu.data import ops as _ops

                res = np.stack([
                    np.asarray(_ops.resize(x, p[s]["gt"].shape[:2])).reshape(
                        out.shape[1:])
                    for x, p in zip(lr, pairs)
                ])
                out = out * (1.0 - self.residual_scale) + res * self.residual_scale
            for i in range(len(ids)):
                recs[i][s] = out[i]
        return recs, pairs

    def _probe_logit_bound(self):
        """Audit the max attention logit on a held validation input.

        One extra device dispatch per quick-eva (the probe fn is traced
        once, under the audit env). Updates the running bound that the
        stats sidecar stamps (``attn_logit_max``) and that
        ``pallas_softmax='auto'`` escalation judges. Best-effort: any
        failure (exotic apply signature, no validation data) leaves the
        bound None, which resolves to the safe stable softmax."""
        if self._logit_probe == "disabled":
            return None
        try:
            if self._logit_probe is None:
                from rdst_tpu.kernels.logit_audit import make_logit_probe

                pair = self.ds_valid.get_test_pair(0)
                scale, d = sorted(pair.items())[-1]
                x = jnp.asarray(d["in"][:4])
                self._logit_probe = (make_logit_probe(
                    self.model, float(scale)), x)
            probe, x = self._logit_probe
            b = probe(self.state.params, x)
        except Exception as e:  # noqa: BLE001 — audit must never kill training
            self.write_log(f"logit audit probe failed ({e!r}); "
                           "bound stays unstamped (auto -> stable)")
            self._logit_probe = "disabled"
            return None
        if b is None:  # no window attention in this model
            self._logit_probe = "disabled"
            return None
        if self._logit_bound is None or b > self._logit_bound:
            self._logit_bound = float(b)
        return float(b)

    def _maybe_escalate_softmax(self) -> bool:
        """auto-mode escalation: once the audited bound reaches the
        margin, flip the env to the stable softmax and re-jit (train
        step + eval fns). The margin sits 20 under the 60 clamp, and
        logits grow ~0.002/step at the fastest observed rate (r4 100k
        run), so a once-per-check_every audit escalates long before the
        clamp corrupts anything."""
        from rdst_tpu.kernels.swin_block import AUTO_CLAMP_MARGIN

        if not (self._softmax_auto and self._softmax_mode == "clamp"):
            return False
        if self._logit_bound is None or self._logit_bound < AUTO_CLAMP_MARGIN:
            return False
        os.environ["RDST_TPU_PALLAS_SOFTMAX"] = "stable"
        self._softmax_mode = "stable"
        from rdst_tpu.kernels import clear_kernel_caches

        clear_kernel_caches()
        self._eval_fns.clear()
        self._remake_step_fn = True
        self.write_log(
            f"pallas_softmax=auto: audited logit bound "
            f"{self._logit_bound:.1f} >= margin {AUTO_CLAMP_MARGIN:.0f} — "
            "escalated to segment-stable softmax (re-jit)")
        return True

    def quick_eva(self) -> str:
        self._probe_logit_bound()
        self._maybe_escalate_softmax()
        n = min(self.quick_eva_num_samples, self.ds_valid.test_len())
        ids = self.rng.permutation(self.ds_valid.test_len())[:n]
        t0 = time.time()
        recs, pairs = self._infer_pairs(list(ids))
        report = self.quick_eva_func(recs, pairs)
        self.quick_validation_reports.append(report)
        plog = self.quick_eva_func.print(report)
        plog += self._keep_best_snapshot(report)
        plog += f"\nQuick evaluation of {n} samples cost {time.time() - t0:.2f}s"
        self._save_image_grid(recs[: self.num_images_to_save],
                              pairs[: self.num_images_to_save])
        try:
            self._plot_curves()
        except Exception as e:  # plotting must never kill training
            plog += f"\n(plotting failed: {e})"
        return plog

    def _keep_best_snapshot(self, report) -> str:
        """Write models/{state}_model_g_best.msgpack whenever the mean
        quick-eva PSNR improves, so long runs that overfit past their
        peak still leave the best weights on disk."""
        def psnr_values(rep):
            vals = []
            for k, v in rep.items():
                if isinstance(v, dict):  # multi-modality: nested per key
                    vals.extend(psnr_values(v))
                elif k.startswith("psnr") and np.size(v):
                    vals.append(np.mean(v))
            return vals

        vals = psnr_values(report)
        if not vals:
            return ""
        score = float(np.mean(vals))
        ts = self.training_states[self.current_state_id]
        # nan fails every <= comparison and would silently replace the
        # best snapshot with diverged params
        if not np.isfinite(score):
            return ""
        if score <= self._best_quick.get(ts, float("-inf")):
            return ""
        self._best_quick[ts] = score
        from flax import serialization

        path = join(self.dirs["models"], f"{ts}_model_g_best.msgpack")
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(self.state.params)))
        self._write_stats_sidecar(path)
        return (f"\nNew best quick-eva PSNR {score:.2f} dB -> "
                f"snapshot kept at {path}")

    def final_eva(self, training_state: str) -> str:
        recs, pairs = self._infer_pairs(list(range(self.ds_valid.test_len())))
        report = self.final_eva_func(recs, pairs)
        plog = fancy_print(f"Final evaluation after {training_state}")
        plog += self.final_eva_func.print(report)
        self.final_eva_func.save([report], self.dirs["final_results"],
                                 f"{training_state}_final_eva")
        return plog

    def _save_image_grid(self, recs, pairs):
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            if not recs:
                return
            scales = sorted(pairs[0].keys())
            n, m = len(recs), len(scales) * 2
            fig, axes = plt.subplots(n, m, figsize=(2 * m, 2 * n), squeeze=False)
            for i, (rec, pair) in enumerate(zip(recs, pairs)):
                for j, s in enumerate(scales):
                    axes[i][2 * j].imshow(np.clip(rec[s][..., 0], 0, 1), cmap="gray")
                    axes[i][2 * j].set_title(f"SR x{s}", fontsize=6)
                    axes[i][2 * j + 1].imshow(np.clip(pair[s]["gt"][..., 0], 0, 1), cmap="gray")
                    axes[i][2 * j + 1].set_title("GT", fontsize=6)
                    for ax in (axes[i][2 * j], axes[i][2 * j + 1]):
                        ax.axis("off")
            fig.savefig(join(self.dirs["records"],
                             f"epoch_{self.state.step}_images.png"), dpi=100)
            plt.close(fig)
        except Exception:
            pass

    def _plot_curves(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for ts, losses in self.training_loss_records.items():
            plt.plot(losses)
            plt.xlabel("epoch")
            plt.ylabel("loss")
            plt.grid(True)
            plt.savefig(join(self.dirs["plots"], f"{ts}_training_loss.png"))
            plt.close()
        if self.quick_validation_reports:
            self.quick_eva_func.plot_process(
                self.quick_validation_reports, self.dirs["plots"],
                prefix="quick_eva", step=self.check_every)

    def training_complete(self, steps_this_run: int = None):
        summary = {
            "training_loss_records": self.training_loss_records,
            "training_epoch_costs": self.training_epoch_costs,
        }
        np.save(join(self.dirs["final_results"], "training_records.npy"),
                np.asarray(summary, dtype=object))
        if steps_this_run == 0:
            self.write_log(fancy_print(
                "Training already complete (resumed checkpoint, 0 new epochs)"))
        elif self.training_epoch_costs:
            self.write_log(fancy_print(
                f"Training complete: {len(self.training_epoch_costs)} epochs, "
                f"{np.mean(self.training_epoch_costs):.3f}s/epoch"))

    # -- logging --------------------------------------------------------------

    def write_log(self, plog: str):
        with open(self.log_file, "a") as f:
            f.write(plog + "\n")
        if self.verbose:
            print(plog, flush=True)

    def log_metrics(self, ts: str):
        """Append one structured check-interval record to metrics.jsonl
        (the text log / PNG curves stay the reference-parity artifacts;
        this is the machine-readable twin — SURVEY §5.5)."""
        rec = {
            "time": time.time(),
            "state": ts,
            "step": int(self.state.step),
            "epoch": int(self.current_epoch),
            "loss": float(self._last_total_f),
            "s_per_epoch": float(
                np.mean(self.training_epoch_costs[-self.check_every:])),
        }
        # per-component means over THIS check interval (GAN stability:
        # 'Adv_D Real' vs 'Adv_D Fake' drifting apart is the collapse
        # signature the total hides). loss.records accumulates for the
        # whole run (and across resumes), so diff against the last
        # consumed length per (state, component).
        for name, vals in self.loss.records.get(ts, {}).items():
            pos = self._metrics_consumed.get((ts, name), 0)
            if len(vals) > pos:
                rec[f"loss_{name.replace(' ', '_')}"] = float(
                    np.mean(vals[pos:]))
                self._metrics_consumed[(ts, name)] = len(vals)
        if self.quick_validation_reports:
            for k, v in self.quick_validation_reports[-1].items():
                try:
                    rec[f"eva_{k}"] = float(np.mean(v))
                except (TypeError, ValueError):
                    pass
        try:
            with open(self.metrics_file, "a") as f:
                f.write(json.dumps(rec) + "\n")
        except OSError as e:  # observability must never kill training
            if self.verbose:
                print(f"(metrics.jsonl write failed: {e})", flush=True)


# reference-compatible name (the main trainer, trans_sr_trainer.py:22)
TransSRTrainer = SRTrainer
