"""Config loader tests: parity with the reference ParametersLoader
semantics (/root/reference/utils/param_loader.py) and the shipped INI
files."""

import pathlib
import textwrap

import pytest

from rdst_tpu.config import ParametersLoader, parse_value


def _write(tmp_path, body):
    p = tmp_path / "cfg.ini"
    p.write_text(textwrap.dedent(body))
    return str(p)


def test_literal_values(tmp_path):
    cfg = _write(
        tmp_path,
        """
        [DEFAULT]
        name = 'RDST'
        flag = True
        nothing = None
        [A]
        xs = [1, 2, 3]
        d = {'WarmUP': {'L1': 1,}, 'UNet-F': {'L1': 0.1, 'UNet-F': 1}}
        f = 1e-8
        """,
    )
    p = ParametersLoader(cfg)
    assert p.name == "RDST"
    assert p.flag is True
    assert p.nothing is None
    assert p.xs == [1, 2, 3]
    assert p.d == {"WarmUP": {"L1": 1}, "UNet-F": {"L1": 0.1, "UNet-F": 1}}
    assert p.f == 1e-8


def test_first_seen_key_wins(tmp_path):
    # The DEFAULT section propagates into every section, and the first
    # occurrence of a key wins (reference param_loader.py:18-19).
    cfg = _write(
        tmp_path,
        """
        [DEFAULT]
        shared = 1
        [A]
        x = 10
        [B]
        x = 20
        shared = 2
        """,
    )
    p = ParametersLoader(cfg)
    assert p.shared == 1  # DEFAULT wins: it is seen first in every section
    assert p.x == 10  # section A is seen before B


def test_expression_fallback(tmp_path):
    cfg = _write(tmp_path, "[A]\nxs = [2] * 4\nr = list(range(3))\n")
    p = ParametersLoader(cfg)
    assert p.xs == [2, 2, 2, 2]
    assert p.r == [0, 1, 2]


def test_parse_value_restricted():
    with pytest.raises(Exception):
        parse_value("__import__('os').system('true')")


def test_str_and_dict_roundtrip(tmp_path):
    cfg = _write(tmp_path, "[A]\nx = 1\ny = 'z'\n")
    p = ParametersLoader(cfg)
    assert "x" in str(p) and "z" in str(p)
    q = ParametersLoader.from_dict(p.to_dict())
    assert q.x == 1 and q.y == "z"
    q.set("x", 5)
    assert q.x == 5 and q.names.count("x") == 1


@pytest.mark.parametrize(
    "ini",
    [
        "RDST_E1_OASIS_example_SRx4.ini",
        "RDST_E1_OASIS_example_SRx4_testing.ini",
    ],
)
def test_loads_reference_configs(reference_available, ini):
    """The shipped reference .ini files must load unchanged (north star)."""
    if not reference_available:
        pytest.skip("reference not mounted")
    path = pathlib.Path("/root/reference/config_files") / ini
    p = ParametersLoader(str(path))
    assert p.feature_generator == "rdst"
    assert p.rdst_embed_dim == 60
    assert p.rdst_rdb_depths == [3] * 8
    assert p.batch_size == 32
    assert p.training_states == ["WarmUP", "UNet-F"]
    assert p.loss_scalars["UNet-F"] == {"L1": 0.1, "UNet-F": 1}


def test_loads_local_example_config():
    repo = pathlib.Path(__file__).resolve().parents[1]
    p = ParametersLoader(str(repo / "config_files" / "rdst_e1_oasis_x4.ini"))
    assert p.feature_generator == "rdst"
    assert p.sr_scale == 4.0


def test_all_shipped_configs_lint():
    """Every shipped config loads, names a buildable generator, and the
    o20-corpus experiment configs share the canonical train/valid/test
    split (train 1-16 / valid 17-18 / test 19-20) so their quality rows
    stay comparable — guards against the round-3 HRL split drift."""
    from rdst_tpu.models import build_generator

    repo = pathlib.Path(__file__).resolve().parents[1]
    inis = sorted((repo / "config_files").glob("*.ini"))
    assert len(inis) >= 9
    o20 = []
    for ini in inis:
        p = ParametersLoader(str(ini))
        model = build_generator(p)  # module construction only (no init)
        assert model is not None, ini.name
        if "oasis20" in ini.name:
            o20.append((ini.name, p))
    assert len(o20) >= 4
    for name, p in o20:
        assert p.testing_patient_ids_oasis == [
            "OAS1_0019_MR1", "OAS1_0020_MR1"], name
        assert p.validation_patient_ids_oasis == [
            "OAS1_0017_MR1", "OAS1_0018_MR1"], name
        # membership, not just length: a 16-entry train list that leaks
        # a held-out valid/test patient must fail the lint
        assert p.training_patient_ids_oasis == [
            f"OAS1_{i:04d}_MR1" for i in range(1, 17)], name
