import pytest

from softmac_tpu.config import CN, get_cfg_defaults


def test_defaults_schema():
    cfg = get_cfg_defaults()
    assert cfg.SIMULATOR.dim == 3
    assert cfg.SIMULATOR.collision_type == 2
    assert cfg.ENV.loss_type == ""
    assert cfg.control_mode == "rigid"


def test_merge_and_freeze():
    cfg = get_cfg_defaults()
    other = CN()
    other.SIMULATOR = CN()
    other.SIMULATOR.dt = 1e-3
    other.control_mode = "mpm"
    cfg.merge_from_other_cfg(other)
    assert cfg.SIMULATOR.dt == 1e-3
    assert cfg.SIMULATOR.dim == 3  # untouched keys preserved
    assert cfg.control_mode == "mpm"

    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SIMULATOR.dt = 2e-3
    cfg.defrost()
    cfg.SIMULATOR.dt = 2e-3
    assert cfg.SIMULATOR.dt == 2e-3


def test_clone_is_deep():
    cfg = get_cfg_defaults()
    c2 = cfg.clone()
    c2.SIMULATOR.dt = 123.0
    assert cfg.SIMULATOR.dt != 123.0


def test_merge_from_list_coerces():
    cfg = get_cfg_defaults()
    cfg.merge_from_list(["SIMULATOR.dt", "0.001", "control_mode", "mpm"])
    assert cfg.SIMULATOR.dt == 0.001
    assert cfg.control_mode == "mpm"


def test_load_py_config(tmp_path):
    p = tmp_path / "cfg.py"
    p.write_text(
        "from softmac_tpu.config.node import CN\n"
        "cfg = CN()\n"
        "cfg.SIMULATOR = CN()\n"
        "cfg.SIMULATOR.n_particles = 77\n"
    )
    from softmac_tpu.config import load
    cfg = load(str(p))
    assert cfg.SIMULATOR.n_particles == 77
    assert cfg.SIMULATOR.dim == 3
