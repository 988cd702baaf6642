"""End-to-end smoke: tiny RDST trains, checkpoints, resumes, and tests on
synthetic OASIS data (the reference's toy_problem-style fixture), on the
virtual CPU mesh."""

import pathlib

import numpy as np
import pytest

from rdst_tpu.config import ParametersLoader
from rdst_tpu.data import synthetic


@pytest.fixture(scope="module")
def e2e_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data = root / "OASIS" / "example"
    synthetic.make_oasis_example(str(data), shape=(40, 48, 40))
    repo = pathlib.Path(__file__).resolve().parents[1]
    p = ParametersLoader(str(repo / "config_files" / "rdst_tiny_oasis_x4.ini"))
    p.set("data_folder", str(data))
    p.set("output_dir", str(root / "outputs"))
    p.set("patch_size", 8)
    p.set("margin_oasis", [2, 2])
    p.set("batch_size", 8)  # divisible by the 8-device mesh
    p.set("rdst_embed_dim", 12)
    p.set("rdst_num_heads", [2, 2])
    p.set("rdst_window_size", [4, 4])
    p.set("rdst_dense_layer_depths", [2, 2])
    p.set("rdst_rdb_depths", [1, 1])
    p.set("rdst_growth_rate", 12)
    p.set("epochs_in_total", {"WarmUP": 4})
    p.set("check_every", 2)
    p.set("quick_eva_num_samples", 2)
    p.set("multi_threads", 1)
    return root, p


def test_train_resume_test(e2e_env):
    root, p = e2e_env
    from rdst_tpu.data.readers import make_train_valid_datasets
    from rdst_tpu.runners.trainer import SRTrainer

    ds_train, ds_valid = make_train_valid_datasets(p)
    trainer = SRTrainer(p, ds_train, ds_valid, seed=0)
    trainer.setup()
    trainer.train()

    out = root / "outputs" / "RDST_TINY_OASIS_SRx4_None"
    assert (out / "models" / "WarmUP_model_g.msgpack").exists()
    # best-quick-eva snapshot retention (overfit-proof long runs)
    assert (out / "models" / "WarmUP_model_g_best.msgpack").exists()
    assert (out / "checkpoint" / "host_state.json").exists()
    assert (out / "training_log.txt").exists()
    assert len(trainer.training_loss_records["WarmUP"]) == 4
    assert len(trainer.quick_validation_reports) == 2
    # structured JSONL twin of the text log (SURVEY §5.5 addition):
    # one record per check interval, with loss + quick-eva means
    import json

    lines = (out / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[-1])
    assert rec["state"] == "WarmUP" and rec["step"] == 4
    assert np.isfinite(rec["loss"]) and rec["s_per_epoch"] > 0
    assert any(k.startswith("eva_psnr") for k in rec)
    # r4: per-component means ride along (GAN runs get loss_Adv_D etc. —
    # the D/G stability curves VERDICT asked for; L1-only runs get loss_L1)
    assert np.isfinite(rec["loss_L1"])

    # resume: a fresh trainer restores the completed state and does nothing
    trainer2 = SRTrainer(p, ds_train, ds_valid, seed=0)
    trainer2.setup()
    assert trainer2.current_state_id == 0
    assert trainer2.current_epoch == 4
    trainer2.train()  # should complete instantly (0 epochs left)
    assert trainer2.state.step == 4  # restored counter, no extra steps taken

    # tester loads the snapshot and produces reports with caching
    from rdst_tpu.runners.tester import SRTester

    p.set("well_trained_single_scale_model_g",
          str(out / "models" / "WarmUP_model_g.msgpack"))
    tester = SRTester(p)
    tester.setup()
    stacked = tester.test()
    assert "psnr_4.0" in stacked
    assert len(stacked["psnr_4.0"]) > 0

    # resume path: second run must reuse cached reports
    tester2 = SRTester(p)
    tester2.setup()
    stacked2 = tester2.test()
    assert np.allclose(stacked["psnr_4.0"], stacked2["psnr_4.0"])


def test_bicubic_tester(e2e_env):
    root, p = e2e_env
    from rdst_tpu.runners.tester import SRTester

    q = ParametersLoader.from_dict(p.to_dict())
    q.set("feature_generator", "bicubic")
    q.set("model_name", "BICUBIC_TINY")
    tester = SRTester(q)
    tester.setup()
    stacked = tester.test()
    assert np.mean(stacked["psnr_4.0"]) > 15  # bicubic baseline sanity


def test_bf16_inference_dtype(e2e_env, monkeypatch):
    """inference_dtype = 'bfloat16' runs the tester through the fused
    kernel fast path (pair mode, interpret on CPU) and reports sane
    f32 metrics."""
    root, p = e2e_env
    from rdst_tpu.runners.tester import SRTester

    out = root / "outputs" / "RDST_TINY_OASIS_SRx4_None"
    snap = out / "models" / "WarmUP_model_g.msgpack"
    if not snap.exists():
        pytest.skip("depends on test_train_resume_test artifacts")
    def run(name, dtype):
        q = ParametersLoader.from_dict(p.to_dict())
        q.set("model_name", name)
        q.set("inference_dtype", dtype)
        q.set("well_trained_single_scale_model_g", str(snap))
        tester = SRTester(q)
        tester.setup()
        return tester.test()

    ref = run("RDST_TINY_F32CHK", "float32")
    monkeypatch.setenv("RDST_TPU_PALLAS", "pair")
    monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")
    got = run("RDST_TINY_BF16", "bfloat16")
    assert np.isfinite(got["psnr_4.0"]).all()
    # bf16 fast path must not move reported quality (4-epoch toy model,
    # so compare against its own f32 score, not an absolute bar)
    assert abs(np.mean(got["psnr_4.0"]) - np.mean(ref["psnr_4.0"])) < 0.3


def test_multi_scale_mdsr_training(e2e_env):
    """all_sr_scales=[2,3,4] with MDSR: per-scale compiled steps + eval."""
    root, base = e2e_env
    from rdst_tpu.config import ParametersLoader
    from rdst_tpu.data.readers import make_train_valid_datasets
    from rdst_tpu.runners.trainer import SRTrainer

    p = ParametersLoader.from_dict(base.to_dict())
    p.set("model_name", "MDSR_TINY")
    p.set("feature_generator", "mdsr")
    p.set("mdsr_n_resblocks", 1)
    p.set("mdsr_n_feats", 8)
    p.set("all_sr_scales", [2.0, 4.0])
    p.set("test_sr_scales", [2.0, 4.0])
    p.set("epochs_in_total", {"WarmUP": 6})
    p.set("check_every", 6)
    p.set("quick_eva_num_samples", 2)
    p.set("batch_size", 8)

    ds_train, ds_valid = make_train_valid_datasets(p)
    trainer = SRTrainer(p, ds_train, ds_valid, seed=0)
    trainer.setup()
    trainer.train()
    # both scales must have been trained and evaluated
    assert len(trainer.training_loss_records["WarmUP"]) == 6
    report = trainer.quick_validation_reports[-1]
    assert "psnr_2.0" in report and "psnr_4.0" in report

    # the tester must load the multi-scale snapshot (its msgpack template
    # has to declare the lazily-created per-scale heads/tails) and score
    # both scales end-to-end
    from rdst_tpu.runners.tester import SRTester

    q = ParametersLoader.from_dict(p.to_dict())
    q.set("sr_scales_for_final_testing", [2.0, 4.0])
    q.set("well_trained_single_scale_model_g",
          str(root / "outputs" / "MDSR_TINY_None" / "models"
              / "WarmUP_model_g.msgpack"))
    tester = SRTester(q)
    tester.setup()
    stacked = tester.test()
    assert "psnr_2.0" in stacked and "psnr_4.0" in stacked


def test_tiled_inference_matches_whole_slice(e2e_env):
    """Tiled unfold/SR/fold inference must closely match whole-slice SR."""
    root, base = e2e_env
    from rdst_tpu.config import ParametersLoader
    from rdst_tpu.runners.tester import SRTester

    out = root / "outputs" / "RDST_TINY_OASIS_SRx4_None"
    snapshot = out / "models" / "WarmUP_model_g.msgpack"
    if not snapshot.exists():  # allow standalone selection of this test
        from rdst_tpu.data.readers import make_train_valid_datasets
        from rdst_tpu.runners.trainer import SRTrainer

        ds_train, ds_valid = make_train_valid_datasets(base)
        trainer = SRTrainer(base, ds_train, ds_valid, seed=0)
        trainer.setup()
        trainer.train()
    p = ParametersLoader.from_dict(base.to_dict())
    p.set("well_trained_single_scale_model_g", str(snapshot))
    p.set("model_name", "RDST_TILED")
    p.set("tiled_inference", True)
    p.set("test_lr_patch_stride", 4)

    tester = SRTester(p)
    tester.setup()
    from rdst_tpu.data.readers import make_test_dataset

    ds = make_test_dataset(p, ["OAS1_0004_MR1"])
    recs_tiled, pairs = tester.inference_patient(ds)

    p.set("tiled_inference", False)
    tester2 = SRTester(p)
    tester2.setup()
    recs_whole, _ = tester2.inference_patient(ds)

    # window attention sees different context per tile, so pixels differ at
    # tile borders; the folded result must be a comparable-quality SR
    from rdst_tpu.metrics.image_metrics import psnr

    gt = pairs[0][4.0]["gt"]
    p_tiled = psnr(gt, np.clip(recs_tiled[0][4.0], 0, 1))
    p_whole = psnr(gt, np.clip(recs_whole[0][4.0], 0, 1))
    assert recs_tiled[0][4.0].shape == recs_whole[0][4.0].shape
    assert abs(p_tiled - p_whole) < 2.0, (p_tiled, p_whole)


def test_golden_trained_model_quality(tmp_path):
    """Regression gate: the committed 2000-step tiny-RDST snapshot must
    score >= 27.5 dB on freshly synthesized OASIS phantoms (bicubic on the
    same data scores ~25.8 dB) — guards the full pipeline end to end."""
    import pathlib

    repo = pathlib.Path(__file__).resolve().parents[1]
    snapshot = repo / "weights" / "rdst_tiny2k_oasis_x4.msgpack"
    if not snapshot.exists():
        pytest.skip("golden snapshot not present")

    from rdst_tpu.config import ParametersLoader
    from rdst_tpu.data import synthetic
    from rdst_tpu.runners.tester import SRTester

    data = tmp_path / "OASIS" / "example"
    synthetic.make_oasis_example(str(data), shape=(96, 112, 96))

    p = ParametersLoader(str(repo / "config_files" / "rdst_tiny_oasis_x4.ini"))
    p.set("data_folder", str(data))
    p.set("output_dir", str(tmp_path / "outputs"))
    p.set("model_name", "GOLDEN")
    p.set("well_trained_single_scale_model_g", str(snapshot))

    tester = SRTester(p)
    tester.setup()
    stacked = tester.test()
    mean_psnr = float(np.mean(stacked["psnr_4.0"]))
    assert mean_psnr >= 27.5, mean_psnr


def test_bf16_mixed_precision_training(e2e_env):
    """training_dtype='bfloat16': bf16 activations, f32 params/optimizer
    and f32 loss. The losses must track the f32 twin closely and the
    quick-eva quality must match within bf16 noise."""
    import jax

    from rdst_tpu.data.readers import make_train_valid_datasets
    from rdst_tpu.runners.trainer import SRTrainer

    root, base = e2e_env

    def run(name, dtype):
        p = ParametersLoader.from_dict(base.to_dict())
        p.set("model_name", name)
        p.set("training_dtype", dtype)
        p.set("epochs_in_total", {"WarmUP": 4})
        p.set("check_every", 4)
        p.set("quick_eva_num_samples", 2)
        ds_train, ds_valid = make_train_valid_datasets(p)
        tr = SRTrainer(p, ds_train, ds_valid, seed=0)
        tr.setup()
        tr.train()
        return tr

    tr_bf = run("BF16_TRAIN", "bfloat16")
    import jax.numpy as jnp

    assert tr_bf.training_dtype == jnp.bfloat16
    # params and optimizer state stayed f32
    assert all(np.asarray(p).dtype == np.float32
               for p in jax.tree.leaves(jax.device_get(tr_bf.state.params)))
    tr_f32 = run("F32_TRAIN", "float32")
    a = np.asarray(tr_bf.training_loss_records["WarmUP"])
    b = np.asarray(tr_f32.training_loss_records["WarmUP"])
    assert a.shape == b.shape and np.isfinite(a).all()
    # same data/rng order; activations-only bf16 keeps the loss close
    assert np.abs(a - b).max() < 0.1 * np.abs(b).mean() + 0.02, (a, b)

    def mean_psnr(tr):
        rep = tr.quick_validation_reports[-1]
        return float(np.mean(rep["psnr_4.0"]))

    assert abs(mean_psnr(tr_bf) - mean_psnr(tr_f32)) < 0.5


def test_config_driven_mesh_training(e2e_env):
    """mesh_shape=[2,2,2] from the CONFIG drives a dp x tp x sp mesh
    through the production trainer with no source edits (VERDICT r2 #4);
    params get TP-sharded, batches get DP+SP sharded, training steps run."""
    import jax

    from rdst_tpu.data.readers import make_train_valid_datasets
    from rdst_tpu.runners.trainer import SRTrainer

    root, base = e2e_env
    p = ParametersLoader.from_dict(base.to_dict())
    p.set("model_name", "MESH222")
    p.set("mesh_shape", [2, 2, 2])
    p.set("epochs_in_total", {"WarmUP": 2})
    p.set("check_every", 2)
    p.set("quick_eva_num_samples", 1)

    ds_train, ds_valid = make_train_valid_datasets(p)
    trainer = SRTrainer(p, ds_train, ds_valid, seed=0)
    assert dict(trainer.mesh.shape) == {"data": 2, "model": 2, "seq": 2}
    assert trainer.spatial_axis == "seq"
    trainer.setup()
    qkv = trainer.state.params["params"]["body_0"]["body_0"]["body"][
        "blocks_0"]["attn"]["qkv"]["kernel"]
    assert "model" in str(qkv.sharding.spec)
    trainer.train()
    assert len(trainer.training_loss_records["WarmUP"]) == 2
    assert all(np.isfinite(v) for v in trainer.training_loss_records["WarmUP"])


def test_pretrained_warm_start(e2e_env):
    """pre_trained_g / pre_trained_d weights-only warm-start (reference
    weights_init, trans_sr_trainer.py:246-283): G from a flax msgpack
    snapshot AND from a torch .pt state_dict (via checkpoint/
    torch_import); D from a d_state msgpack with opt_state reset."""
    import jax
    from flax import serialization
    from flax.traverse_util import flatten_dict

    from rdst_tpu.data.readers import make_train_valid_datasets
    from rdst_tpu.runners.trainer import SRTrainer

    root, base = e2e_env
    snap = (root / "outputs" / "RDST_TINY_OASIS_SRx4_None" / "models"
            / "WarmUP_model_g.msgpack")
    if not snap.exists():
        pytest.skip("depends on test_train_resume_test artifacts")

    def setup_trainer(name, seed=1, **keys):
        p = ParametersLoader.from_dict(base.to_dict())
        p.set("model_name", name)
        for k, v in keys.items():
            p.set(k, v)
        ds_train, ds_valid = make_train_valid_datasets(p)
        tr = SRTrainer(p, ds_train, ds_valid, seed=seed)
        tr.setup()
        return tr

    def leaves(tree):
        return flatten_dict(jax.device_get(tree)["params"])

    want = serialization.msgpack_restore(snap.read_bytes())

    # 1) flax msgpack snapshot -> identical weights, fresh optimizer
    tr = setup_trainer("WS_MSGPACK", pre_trained_g=str(snap))
    got = leaves(tr.state.params)
    for k, v in leaves(want).items():
        assert np.array_equal(np.asarray(got[k]), v), k
    log = (root / "outputs" / "WS_MSGPACK_None" / "training_log.txt").read_text()
    assert "Init G with pre-trained model" in log

    # 2) torch .pt state_dict routed through torch_import
    from rdst_tpu.checkpoint.torch_export import save_torch_checkpoint

    pt = root / "warm_start_g.pt"
    save_torch_checkpoint(want, str(pt), arch="rdst", mean=[0.0], std=[1.0])
    tr2 = setup_trainer("WS_TORCH", pre_trained_g=str(pt))
    got2 = leaves(tr2.state.params)
    for k, v in leaves(want).items():
        assert np.allclose(np.asarray(got2[k]), v, atol=0), k

    # 3) missing path fails loudly (NOT the reference's silent fallback)
    with pytest.raises(FileNotFoundError):
        setup_trainer("WS_MISSING", pre_trained_g=str(root / "nope.msgpack"))

    # 4) discriminator warm-start from a d_state msgpack
    gan_keys = dict(
        gan_type="GAN",
        training_losses=["L1", "GAN"],
        loss_scalars={"WarmUP": {"L1": 1, "GAN": 0.1}},
        epochs_in_total={"WarmUP": 0},
    )
    tr3 = setup_trainer("WS_GAN_SRC", seed=3, **gan_keys)
    dfile = root / "warm_start_d.msgpack"
    dfile.write_bytes(serialization.to_bytes(jax.device_get(tr3.d_state)))
    tr4 = setup_trainer("WS_GAN_DST", seed=4, pre_trained_d=str(dfile),
                        **gan_keys)
    a = flatten_dict(jax.device_get(tr3.d_state)["params"])
    b = flatten_dict(jax.device_get(tr4.d_state)["params"])
    for k in a:
        assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), k


def test_metasr_residual_scale_blending(e2e_env):
    """scale_free training + eval with residual_scale=0.8: the model
    embedding blends rec*(1-rs) + interpolated-LR*rs at every stage
    (reference meta_sr_trainer.py:111-112, 171-172)."""
    import copy

    root, p0 = e2e_env
    p = copy.deepcopy(p0)
    p.set("model_name", "RDST_TINY_METARS")
    p.set("scale_free", True)
    p.set("all_sr_scales", [2.0, 4.0])
    p.set("test_sr_scales", [4.0])
    p.set("sr_scales_for_final_testing", [4.0])
    p.set("residual_scale", 0.8)
    p.set("epochs_in_total", {"WarmUP": 2})
    p.set("check_every", 2)

    from rdst_tpu.data.readers import make_train_valid_datasets
    from rdst_tpu.runners.trainer import SRTrainer

    ds_train, ds_valid = make_train_valid_datasets(p)
    assert ds_train.return_res_image  # forced by residual_scale > 0
    batch = ds_train.sample(np.random.default_rng(0))
    assert len(batch["res"])  # datasets provide the residual image

    trainer = SRTrainer(p, ds_train, ds_valid, seed=0)
    assert trainer.residual_scale == 0.8
    trainer.setup()
    trainer.train()
    assert len(trainer.training_loss_records["WarmUP"]) == 2

    # with rs=0.8 the quick-eva recs are dominated by the bicubic residual:
    # they must be close to it and far from the raw network output
    ids = [0, 1]
    recs, pairs = trainer._infer_pairs(ids)
    from rdst_tpu.data import ops

    for i, pid in enumerate(ids):
        pair = pairs[i][4.0]
        res = np.asarray(ops.resize(pair["in"][0], pair["gt"].shape[:2]))
        res = res.reshape(recs[i][4.0].shape)
        blend_err = np.abs(recs[i][4.0] - res).mean()
        assert blend_err < 0.2 * np.abs(res).mean() + 0.05

    trainer.residual_scale = 0.0
    raw, _ = trainer._infer_pairs(ids)
    assert np.abs(raw[0][4.0] - recs[0][4.0]).max() > 1e-4


def test_brats_multimodal_train_test(tmp_path):
    """Full BraTS workflow on a tiny synthetic corpus: 4-modality channel
    input through the trainer, then SRTester with the nested
    MultiModalityMetaSREvaluation report (reference BraTS_dataset.py:99-113,
    trans_sr_tester.py:117-122)."""
    import pathlib

    data = tmp_path / "BraTS" / "example"
    synthetic.make_brats_example(
        str(data),
        patient_ids=("HGG_Brats17_SYN_001_1", "HGG_Brats17_SYN_002_1",
                     "HGG_Brats17_SYN_003_1"),
        shape=(48, 56, 40),
    )
    repo = pathlib.Path(__file__).resolve().parents[1]
    p = ParametersLoader(str(repo / "config_files" / "rdst_tiny_oasis_x4.ini"))
    p.set("data_folder", str(data))
    p.set("output_dir", str(tmp_path / "outputs"))
    p.set("model_name", "RDST_TINY_BRATS")
    p.set("input_channel", 4)
    p.set("patch_size", 8)
    p.set("medical_image_dim_brats", 2)
    p.set("margin_brats", [2, 2])
    p.set("modalities_brats", ["t1ce", "t1", "t2", "flair"])
    p.set("batch_size", 8)
    p.set("rdst_embed_dim", 12)
    p.set("rdst_num_heads", [2, 2])
    p.set("rdst_window_size", [4, 4])
    p.set("rdst_dense_layer_depths", [2, 2])
    p.set("rdst_rdb_depths", [1, 1])
    p.set("rdst_growth_rate", 12)
    p.set("epochs_in_total", {"WarmUP": 2})
    p.set("check_every", 2)
    p.set("quick_eva_num_samples", 2)
    p.set("multi_threads", 1)
    p.set("training_patient_ids_brats", ["HGG_Brats17_SYN_001_1"])
    p.set("validation_patient_ids_brats", ["HGG_Brats17_SYN_002_1"])
    p.set("testing_patient_ids_brats", ["HGG_Brats17_SYN_003_1"])

    from rdst_tpu.data.readers import make_train_valid_datasets
    from rdst_tpu.runners.trainer import SRTrainer

    ds_train, ds_valid = make_train_valid_datasets(p)
    batch = ds_train[0]
    assert batch["in"].shape[-1] == 4  # 4 stacked modalities
    trainer = SRTrainer(p, ds_train, ds_valid, seed=0)
    trainer.setup()
    trainer.train()

    out = tmp_path / "outputs" / "RDST_TINY_BRATS_None"
    snapshot = out / "models" / "WarmUP_model_g.msgpack"
    assert snapshot.exists()

    from rdst_tpu.runners.tester import SRTester

    p.set("well_trained_single_scale_model_g", str(snapshot))
    tester = SRTester(p)
    tester.setup()
    stacked = tester.test()
    # nested per-modality reports, one entry per test slice
    assert set(stacked) == {"t1ce", "t1", "t2", "flair"}
    for modality, rep in stacked.items():
        assert "psnr_4.0" in rep, modality
        assert len(rep["psnr_4.0"]) > 0


def _tiny_config(repo, tmp_path, data, model_name, **overrides):
    p = ParametersLoader(str(repo / "config_files" / "rdst_tiny_oasis_x4.ini"))
    p.set("data_folder", str(data))
    p.set("output_dir", str(tmp_path / "outputs"))
    p.set("model_name", model_name)
    p.set("patch_size", 8)
    p.set("batch_size", 8)
    p.set("rdst_embed_dim", 12)
    p.set("rdst_num_heads", [2, 2])
    p.set("rdst_window_size", [4, 4])
    p.set("rdst_dense_layer_depths", [2, 2])
    p.set("rdst_rdb_depths", [1, 1])
    p.set("rdst_growth_rate", 12)
    p.set("epochs_in_total", {"WarmUP": 2})
    p.set("check_every", 2)
    p.set("quick_eva_num_samples", 2)
    p.set("multi_threads", 1)
    for k, v in overrides.items():
        p.set(k, v)
    return p


def _train_and_test(p, tmp_path, model_name):
    from rdst_tpu.data.readers import make_train_valid_datasets
    from rdst_tpu.runners.tester import SRTester
    from rdst_tpu.runners.trainer import SRTrainer

    ds_train, ds_valid = make_train_valid_datasets(p)
    trainer = SRTrainer(p, ds_train, ds_valid, seed=0)
    trainer.setup()
    trainer.train()
    snapshot = (tmp_path / "outputs" / f"{model_name}_None" / "models"
                / "WarmUP_model_g.msgpack")
    assert snapshot.exists()
    p.set("well_trained_single_scale_model_g", str(snapshot))
    tester = SRTester(p)
    tester.setup()
    return tester.test()


def test_acdc_train_test(tmp_path):
    """Full ACDC workflow on a tiny synthetic corpus: frame-glob reader,
    centre crop, trainer, tester (reference ACDC_dataset.py:47-281)."""
    import pathlib

    data = tmp_path / "ACDC" / "example"
    synthetic.make_acdc_example(
        str(data), patient_ids=("patient001", "patient002", "patient003"),
        shape=(150, 150, 8))
    repo = pathlib.Path(__file__).resolve().parents[1]
    p = _tiny_config(
        repo, tmp_path, data, "RDST_TINY_ACDC",
        medical_image_dim_acdc=2, crop_size_acdc=128,
        training_patient_ids_acdc=["patient001"],
        validation_patient_ids_acdc=["patient002"],
        testing_patient_ids_acdc=["patient003"])
    stacked = _train_and_test(p, tmp_path, "RDST_TINY_ACDC")
    assert "psnr_4.0" in stacked
    assert len(stacked["psnr_4.0"]) > 0


def test_covid_train_test(tmp_path):
    """Full COVID-CT workflow on a tiny synthetic corpus: mask-paired CT
    reader, hard-coded 512 centre crop, large-slice whole-image inference
    (reference CovidCT_dataset.py:47-278)."""
    import pathlib

    data = tmp_path / "COVID" / "example"
    # the phantom only fills the central z band and the mask threshold
    # (>100 px) keeps ~4 of 16 slices — batch_size must fit that corpus
    synthetic.make_covid_example(
        str(data),
        patient_ids=("volume-covid19-A-0001", "volume-covid19-A-0002",
                     "volume-covid19-A-0003"),
        shape=(540, 540, 16))
    repo = pathlib.Path(__file__).resolve().parents[1]
    p = _tiny_config(
        repo, tmp_path, data, "RDST_TINY_COVID",
        batch_size=4,
        medical_image_dim_covid=2, margin_covid=[90, 50],
        training_patient_ids_covid=["volume-covid19-A-0001"],
        validation_patient_ids_covid=["volume-covid19-A-0002"],
        testing_patient_ids_covid=["volume-covid19-A-0003"])
    stacked = _train_and_test(p, tmp_path, "RDST_TINY_COVID")
    assert "psnr_4.0" in stacked
    assert len(stacked["psnr_4.0"]) > 0


def test_sampler_exception_propagates(tmp_path):
    """A dataset error inside the sampler thread must raise in train(),
    not leave the main loop blocked on the feed queue forever (regression:
    an undersized corpus hung training instead of failing)."""
    import pathlib

    from rdst_tpu.data.readers import make_train_valid_datasets
    from rdst_tpu.runners.trainer import SRTrainer

    data = tmp_path / "OASIS" / "example"
    synthetic.make_oasis_example(str(data), shape=(40, 48, 6))
    repo = pathlib.Path(__file__).resolve().parents[1]
    p = _tiny_config(repo, tmp_path, data, "RDST_TINY_SAMPLER_ERR",
                     margin_oasis=[2, 2], batch_size=512)
    ds_train, ds_valid = make_train_valid_datasets(p)
    trainer = SRTrainer(p, ds_train, ds_valid, seed=0)
    trainer.setup()
    with pytest.raises(ValueError, match="batch_size"):
        trainer.train()


def test_stall_watchdog(tmp_path, monkeypatch):
    """The stall watchdog logs when no step completes within stall_warn_s
    and hard-exits at stall_abort_s (failure detection for wedged device
    RPCs: the host otherwise blocks in a fetch with no error forever)."""
    import pathlib
    import threading
    import time as _time

    from rdst_tpu.data.readers import make_train_valid_datasets
    from rdst_tpu.runners import trainer as trainer_mod
    from rdst_tpu.runners.trainer import SRTrainer

    data = tmp_path / "OASIS" / "example"
    synthetic.make_oasis_example(str(data), shape=(40, 48, 24))
    repo = pathlib.Path(__file__).resolve().parents[1]
    p = _tiny_config(repo, tmp_path, data, "RDST_TINY_WATCHDOG",
                     margin_oasis=[2, 2], stall_warn_s=0.5, stall_abort_s=2.0)
    ds_train, ds_valid = make_train_valid_datasets(p)
    trainer = SRTrainer(p, ds_train, ds_valid, seed=0)
    # config plumbing lands on the trainer at __init__
    assert trainer.stall_warn_s == 0.5 and trainer.stall_abort_s == 2.0
    # but setup() itself runs under the watchdog, and a cold-cache CPU
    # compile legitimately exceeds a 2 s abort — the REAL os._exit(17)
    # would kill the pytest process (observed: the suite died silently
    # here on a fresh host). Production thresholds for the real setup;
    # the abort path is driven directly against _watchdog below.
    trainer.stall_warn_s, trainer.stall_abort_s = 600.0, 0.0
    trainer.setup()

    exited = {}
    monkeypatch.setattr(trainer_mod.os, "_exit",
                        lambda code: exited.setdefault("code", code))
    # drive the watchdog directly against a frozen heartbeat
    stop = threading.Event()
    t = threading.Thread(target=trainer._watchdog, args=(stop, 0.5, 2.0))
    t.start()
    deadline = _time.monotonic() + 30
    while "code" not in exited and _time.monotonic() < deadline:
        _time.sleep(0.1)
    stop.set()
    t.join(timeout=10)
    assert exited.get("code") == 17
    log = (tmp_path / "outputs" / "RDST_TINY_WATCHDOG_None"
           / "training_log.txt").read_text()
    assert "WATCHDOG: no training progress" in log
    assert "WATCHDOG: aborting" in log

    # a normal tiny run with production thresholds (first CPU compile of
    # the train step legitimately exceeds seconds-scale ones) trains to
    # completion and triggers nothing
    trainer.stall_warn_s, trainer.stall_abort_s = 600.0, 0.0
    trainer.train()
    log = (tmp_path / "outputs" / "RDST_TINY_WATCHDOG_None"
           / "training_log.txt").read_text()
    assert log.count("WATCHDOG: aborting") == 1  # only the frozen-probe one


def test_rss_restart_guard(tmp_path, monkeypatch):
    """rss_restart_gb: the watchdog flags RSS above the threshold and the
    step loop checkpoints + exits 17 at the next step boundary (clean
    supervisor restart instead of a mid-save OOM SIGKILL — a real 100k
    production run died exactly that way, r4)."""
    import pathlib

    from rdst_tpu.data.readers import make_train_valid_datasets
    from rdst_tpu.runners import trainer as trainer_mod
    from rdst_tpu.runners.trainer import SRTrainer

    data = tmp_path / "OASIS" / "example"
    synthetic.make_oasis_example(str(data), shape=(40, 48, 24))
    repo = pathlib.Path(__file__).resolve().parents[1]
    # threshold below any real process RSS -> trips on the first poll;
    # stall_warn_s tiny so the watchdog polls fast (poll = min(warn, 60))
    p = _tiny_config(repo, tmp_path, data, "RDST_TINY_RSSGUARD",
                     margin_oasis=[2, 2], stall_warn_s=0.2,
                     rss_restart_gb=0.001)
    ds_train, ds_valid = make_train_valid_datasets(p)
    trainer = SRTrainer(p, ds_train, ds_valid, seed=0)
    assert trainer.rss_restart_gb == 0.001
    assert trainer._rss_gb() > 0.001  # Linux /proc backing works
    trainer.stall_warn_s = 0.2  # keep setup()'s own watchdog quiet
    exited = {}
    monkeypatch.setattr(trainer_mod.os, "_exit",
                        lambda code: (_ for _ in ()).throw(SystemExit(code)))
    trainer.setup()
    try:
        trainer.train()
        raised = None
    except SystemExit as e:
        raised = e.code
    assert raised == 17
    out = tmp_path / "outputs" / "RDST_TINY_RSSGUARD_None"
    log = (out / "training_log.txt").read_text()
    assert "WATCHDOG: host RSS" in log
    assert "RSS restart: checkpoint saved" in log
    # the safe-boundary checkpoint exists -> a supervisor restart resumes
    assert (out / "checkpoint" / "host_state.json").exists()


def test_nonfinite_grad_guard(tmp_path):
    """The step guard must reject non-finite GRADS, not just non-finite
    loss: exactly-constant patches give LayerNorm zero variance, its
    backward amplifies by ~1/sqrt(eps) per block, and on deep configs the
    grads overflow while the loss stays finite — an unguarded update
    would poison the params forever (observed on the noise-free COVID
    corpus)."""
    import pathlib

    import jax
    import jax.numpy as jnp

    from rdst_tpu.data.readers import make_train_valid_datasets
    from rdst_tpu.parallel import shard_batch
    from rdst_tpu.runners.trainer import SRTrainer, tree_finite

    # unit semantics of the shared in-graph guard predicate
    good = {"a": jnp.ones((3,)), "b": jnp.zeros((2, 2))}
    assert bool(tree_finite(good))
    for bad_val in (jnp.nan, jnp.inf, -jnp.inf):
        bad = {"a": jnp.ones((3,)), "b": jnp.full((2, 2), bad_val)}
        assert not bool(tree_finite(bad))

    # integration: a poisoned batch flips the step's ok flag and leaves
    # the params untouched and finite
    data = tmp_path / "OASIS" / "example"
    synthetic.make_oasis_example(str(data), shape=(40, 48, 24))
    repo = pathlib.Path(__file__).resolve().parents[1]
    p = _tiny_config(repo, tmp_path, data, "RDST_TINY_GRADGUARD",
                     margin_oasis=[2, 2])
    ds_train, ds_valid = make_train_valid_datasets(p)
    trainer = SRTrainer(p, ds_train, ds_valid, seed=0)
    trainer.setup()
    ts = trainer.training_states[0]
    trainer.loss.set_training_state(ts)
    step_fn = trainer._make_train_step(ts)

    batch = ds_train.sample(np.random.default_rng(0))
    sr = float(batch["sr_factor"])
    db = shard_batch(trainer.mesh, {"in": batch["in"], "out": batch["out"]})
    p1, o1, total, report, ok = step_fn(
        trainer.state.params, trainer.state.opt_state, db,
        jax.random.PRNGKey(0), sr)
    assert bool(ok)

    p1_host = jax.tree.map(np.asarray, jax.device_get(p1))  # donated below
    poisoned = dict(db)
    poisoned["in"] = db["in"].at[0, 0, 0, 0].set(jnp.nan)
    p2, o2, total2, report2, ok2 = step_fn(
        p1, o1, poisoned, jax.random.PRNGKey(1), sr)
    assert not bool(ok2)
    assert all(bool(jnp.isfinite(v).all()) for v in jax.tree.leaves(p2))
    assert all(np.allclose(a, np.asarray(b))
               for a, b in zip(jax.tree.leaves(p1_host), jax.tree.leaves(p2)))


def test_metasr_fractional_scale_workflow(tmp_path):
    """The shipped Meta-SR workflow end-to-end at a FRACTIONAL test
    scale: scale-free training over a continuous scale set, then the
    tester scores x1.5 — a scale that exists as no fixed head anywhere
    (reference meta_sr_trainer.py + networks/meta_sr.py)."""
    import pathlib

    from rdst_tpu.data.readers import make_train_valid_datasets
    from rdst_tpu.runners.tester import SRTester
    from rdst_tpu.runners.trainer import SRTrainer

    data = tmp_path / "OASIS" / "example"
    synthetic.make_oasis_example(str(data), shape=(40, 48, 24))
    repo = pathlib.Path(__file__).resolve().parents[1]
    p = ParametersLoader(str(repo / "config_files"
                              / "metasr_20k_oasis20_x4.ini"))
    p.set("data_folder", str(data))
    p.set("output_dir", str(tmp_path / "outputs"))
    p.set("model_name", "METASR_TINY")
    p.set("patch_size", 8)
    p.set("batch_size", 8)
    p.set("margin_oasis", [2, 2])
    p.set("edsr_n_feats", 8)
    p.set("edsr_n_resblocks", 1)
    p.set("all_sr_scales", [1.5, 4.0])
    p.set("test_sr_scales", [4.0])
    p.set("sr_scales_for_final_testing", [1.5, 4.0])
    p.set("sr_scales_for_saving", [])
    p.set("epochs_in_total", {"WarmUP": 2})
    p.set("check_every", 2)
    p.set("quick_eva_num_samples", 2)
    p.set("multi_threads", 1)
    p.set("training_patient_ids_oasis", ["OAS1_0001_MR1", "OAS1_0002_MR1"])
    p.set("validation_patient_ids_oasis", ["OAS1_0003_MR1"])
    p.set("testing_patient_ids_oasis", ["OAS1_0004_MR1"])

    ds_train, ds_valid = make_train_valid_datasets(p)
    trainer = SRTrainer(p, ds_train, ds_valid, seed=0)
    trainer.setup()
    trainer.train()
    snap = (tmp_path / "outputs" / "METASR_TINY_None" / "models"
            / "WarmUP_model_g.msgpack")
    assert snap.exists()

    p.set("well_trained_single_scale_model_g", str(snap))
    tester = SRTester(p)
    tester.setup()
    stacked = tester.test()
    assert "psnr_1.5" in stacked and "psnr_4.0" in stacked
    # finite scores at a scale that exists nowhere as a fixed head is
    # the workflow proof; quality ordering needs a trained model (the
    # 2-epoch toy model here ranks scales arbitrarily)
    assert np.isfinite(stacked["psnr_1.5"]).all()
    assert np.isfinite(stacked["psnr_4.0"]).all()


def test_tester_weights_key_precedence():
    """The tester honors the reference's family weight keys: the r4
    MetaSR hardware eval passed ``well_trained_model_metasr`` (the key
    the reference's MetaSRTester reads, meta_sr_tester.py:60) and the
    tester refused to load. Precedence: explicit single-scale first,
    then metasr/mdsr family keys, then the per-scale x4 fallback."""
    from rdst_tpu.runners.tester import SRTester

    t = object.__new__(SRTester)
    t.paras = dict(well_trained_model_metasr="m.msgpack")
    assert t._model_path() == "m.msgpack"
    t.paras = dict(well_trained_model_mdsr="d.msgpack")
    assert t._model_path() == "d.msgpack"
    t.paras = dict(well_trained_single_scale_model_g="g.msgpack",
                   well_trained_model_metasr="m.msgpack")
    assert t._model_path() == "g.msgpack"
    t.paras = dict(well_trained_model_g_x4="x4.msgpack")
    assert t._model_path() == "x4.msgpack"
    t.paras = {}
    assert not t._model_path()
