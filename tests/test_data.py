"""Volume IO, synthetic fixtures, and dataset pipeline tests."""

import numpy as np
import pytest

from rdst_tpu.config import ParametersLoader
from rdst_tpu.data import io, synthetic
from rdst_tpu.data.datasets import select_slices


class TestVolumeIO:
    def test_nii_roundtrip(self, tmp_path, rng):
        x = rng.normal(0, 100, (17, 23, 9)).astype(np.float32)
        p = str(tmp_path / "vol.nii")
        io.save(p, x)
        v = io.load(p)
        assert v.shape == x.shape
        assert np.allclose(v.get_fdata(), x)

    def test_nii_gz_roundtrip(self, tmp_path, rng):
        x = (rng.random((8, 8, 4)) * 255).astype(np.uint8)
        p = str(tmp_path / "vol.nii.gz")
        io.save(p, x)
        assert np.array_equal(io.load(p).get_fdata(), x)

    def test_analyze_pair_roundtrip(self, tmp_path, rng):
        x = rng.normal(0, 10, (12, 10, 6, 1)).astype(np.float32)
        p = str(tmp_path / "vol.img")
        io.save(p, x)
        # loadable via either member of the pair
        assert np.allclose(io.load(p).get_fdata(), x)
        assert np.allclose(io.load(str(tmp_path / "vol.hdr")).get_fdata(), x)

    def test_fortran_order_matches_nibabel_convention(self, tmp_path):
        # first axis varies fastest on disk (Fortran order)
        x = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
        p = str(tmp_path / "v.nii")
        io.save(p, x)
        raw = open(p, "rb").read()[352:]
        first_vals = np.frombuffer(raw, dtype=np.int16, count=4)
        assert list(first_vals) == [x[0, 0, 0], x[1, 0, 0], x[0, 1, 0], x[1, 1, 0]]


def test_select_slices():
    v = np.zeros((5, 4, 4, 1))
    v[1] = 1.0
    v[3] = 2.0
    out, mask = select_slices(v)
    assert out.shape[0] == 2 and mask.tolist() == [False, True, False, True, False]


@pytest.fixture(scope="session")
def oasis_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("oasis")
    synthetic.make_oasis_example(str(root), shape=(48, 56, 48))
    return str(root)


@pytest.fixture(scope="session")
def oasis_paras(oasis_root):
    import pathlib

    repo = pathlib.Path(__file__).resolve().parents[1]
    p = ParametersLoader(str(repo / "config_files" / "rdst_e1_oasis_x4.ini"))
    p.set("data_folder", oasis_root)
    p.set("margin_oasis", [4, 4])
    p.set("batch_size", 4)
    p.set("multi_threads", 2)
    return p


class TestOASISDatasets:
    def test_train_dataset(self, oasis_paras, rng):
        from rdst_tpu.data.readers import OASISMultiSRTrain

        ds = OASISMultiSRTrain(oasis_paras)
        assert len(ds) > 0
        # toy_problem truncates to 2 patients
        assert len(set(ds.img_ids)) == 2
        batch = ds.sample(rng)
        assert batch["in"].shape == (4, 24, 24, 1)
        assert batch["out"].shape == (4, 96, 96, 1)
        assert batch["sr_factor"] == 4.0
        assert batch["in"].dtype == np.float32

    def test_train_normalized_per_patient(self, oasis_paras):
        from rdst_tpu.data.readers import OASISMultiSRTrain

        ds = OASISMultiSRTrain(oasis_paras)
        for pid, (lo, hi) in ds.norm_paras.items():
            assert hi > lo

    def test_test_dataset_pairs(self, oasis_paras):
        from rdst_tpu.data.readers import OASISMultiSRTest

        ds = OASISMultiSRTest(oasis_paras, ["OAS1_0004_MR1"])
        assert ds.test_len() > 0
        pair = ds.get_test_pair(0)
        assert set(pair.keys()) == {4.0}
        entry = pair[4.0]
        h, w = entry["in"].shape[1:3]
        assert entry["gt"].shape[:2] == (h * 4, w * 4)
        assert entry["in"].ndim == 4  # NHWC
        assert entry["real_sr_scale"] == 4.0

    def test_eval_funcs_attached(self, oasis_paras):
        from rdst_tpu.data.readers import OASISMultiSRTest

        ds = OASISMultiSRTest(oasis_paras, ["OAS1_0004_MR1"])
        assert "psnr_4.0" in ds.get_quick_eva_metrics()
        # quick eval on bicubic upsample of the LR input
        from rdst_tpu.data import ops

        pairs = [ds.get_test_pair(i) for i in range(2)]
        recs = []
        for p in pairs:
            lr = p[4.0]["in"][0]
            recs.append({4.0: ops.resize(lr, p[4.0]["gt"].shape[:2])})
        report = ds.quick_eva_func(recs, pairs)
        assert report["psnr_4.0"] > 20  # bicubic should beat 20dB on phantoms
        assert 0 < report["ssim_4.0"] <= 1

    def test_seg_train_dataset(self, oasis_paras, rng):
        from rdst_tpu.data.readers import OASISSegSRTrain

        ds = OASISSegSRTrain(oasis_paras)
        batch = ds.sample(rng)
        assert batch["seg_gt"].shape == (4, 96, 96, 1)
        assert set(np.unique(batch["seg_gt"])).issubset({0.0, 1.0, 2.0, 3.0})


class TestOtherDatasets:
    def test_brats(self, tmp_path, rng):
        import pathlib

        root = tmp_path / "BraTS17"
        synthetic.make_brats_example(str(root), shape=(48, 56, 40))
        repo = pathlib.Path(__file__).resolve().parents[1]
        p = ParametersLoader(str(repo / "config_files" / "rdst_e1_oasis_x4.ini"))
        p.set("data_folder", str(root))
        p.set("training_patient_ids_brats", ["HGG_Brats17_SYN_001_1", "HGG_Brats17_SYN_002_1"])
        p.set("margin_brats", [2, 2])
        p.set("batch_size", 2)
        p.set("input_channel", 4)
        p.set("multi_threads", 1)

        from rdst_tpu.data.readers import BraTSMultiSRTrain, BraTSMultiSRTest

        ds = BraTSMultiSRTrain(p)
        batch = ds.sample(rng)
        assert batch["in"].shape[-1] == 4  # modalities as channels
        dt = BraTSMultiSRTest(p, ["HGG_Brats17_SYN_001_1"])
        rep_keys = dt.get_quick_eva_metrics()
        assert "psnr_4.0" in rep_keys

    def test_acdc(self, tmp_path, rng):
        import pathlib

        root = tmp_path / "ACDC"
        synthetic.make_acdc_example(str(root), shape=(150, 150, 8))
        repo = pathlib.Path(__file__).resolve().parents[1]
        p = ParametersLoader(str(repo / "config_files" / "rdst_e1_oasis_x4.ini"))
        p.set("data_folder", str(root))
        p.set("training_patient_ids_acdc", ["patient001", "patient002"])
        p.set("crop_size_acdc", 128)
        p.set("batch_size", 2)
        p.set("multi_threads", 1)

        from rdst_tpu.data.readers import ACDCMultiSRTrain

        ds = ACDCMultiSRTrain(p)
        assert len(ds) > 0
        assert ds.hr_images[0].shape[:2] == (128, 128)
        batch = ds.sample(rng)
        assert batch["out"].shape[1:3] == (96, 96)

    def test_covid(self, tmp_path, rng):
        import pathlib

        root = tmp_path / "COVID"
        synthetic.make_covid_example(str(root), shape=(540, 540, 6))
        repo = pathlib.Path(__file__).resolve().parents[1]
        p = ParametersLoader(str(repo / "config_files" / "rdst_e1_oasis_x4.ini"))
        p.set("data_folder", str(root))
        p.set("training_patient_ids_covid", ["volume-covid19-A-0001", "volume-covid19-A-0002"])
        p.set("batch_size", 2)
        p.set("multi_threads", 1)

        from rdst_tpu.data.readers import CovidCTMultiSRTrain

        ds = CovidCTMultiSRTrain(p)
        assert len(ds) > 0
        assert ds.hr_images[0].shape[:2] == (512, 512)
