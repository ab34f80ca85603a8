import pathlib
"""Config cascade tests (behavior of reference utils/hparams.py)."""

import textwrap

from diffsinger_tpu.config import load_config, override_config


def _write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(textwrap.dedent(content))
    return str(p)


def test_base_config_chain_and_override(tmp_path):
    base = _write(
        tmp_path,
        "base.yaml",
        """
        a: 1
        nested:
          x: 1
          y: 2
        list_key: [1, 2]
        """,
    )
    child = _write(
        tmp_path,
        "child.yaml",
        f"""
        base_config: [{base}]
        a: 10
        nested:
          y: 20
        """,
    )
    cfg = load_config(child, save_snapshot=False)
    assert cfg["a"] == 10
    assert cfg["nested"] == {"x": 1, "y": 20}
    assert cfg["list_key"] == [1, 2]
    assert cfg.infer is False


def test_relative_base_config(tmp_path):
    _write(tmp_path, "base.yaml", "k: base\nother: 1\n")
    child = _write(tmp_path, "sub.yaml", "base_config: [./base.yaml]\nk: child\n")
    cfg = load_config(child, save_snapshot=False)
    assert cfg["k"] == "child"
    assert cfg["other"] == 1


def test_hparams_str_typed_override(tmp_path):
    child = _write(tmp_path, "c.yaml", "lr: 0.5\nflag: false\nsteps: 100\nname: hello\n")
    cfg = load_config(child, hparams_str="lr=0.25,flag=True,steps=7,name=world,newkey=3", save_snapshot=False)
    assert cfg["lr"] == 0.25 and isinstance(cfg["lr"], float)
    assert cfg["flag"] is True
    assert cfg["steps"] == 7 and isinstance(cfg["steps"], int)
    assert cfg["name"] == "world"
    assert cfg["newkey"] == 3


def test_work_dir_snapshot_precedence(tmp_path):
    child = _write(tmp_path, "c.yaml", "a: 1\nb: 2\n")
    ckpt_root = tmp_path / "checkpoints"
    # first load writes the snapshot
    cfg1 = load_config(child, exp_name="exp1", ckpt_root=ckpt_root)
    assert (ckpt_root / "exp1" / "config.yaml").exists()
    assert cfg1["a"] == 1
    # edit config file; snapshot should win without reset
    _write(tmp_path, "c.yaml", "a: 99\nb: 2\n")
    cfg2 = load_config(child, exp_name="exp1", ckpt_root=ckpt_root)
    assert cfg2["a"] == 1
    # with reset=True the new config file wins
    cfg3 = load_config(child, exp_name="exp1", ckpt_root=ckpt_root, reset=True)
    assert cfg3["a"] == 99


def test_reference_acoustic_config_loads():
    cfg = load_config(str(pathlib.Path(__file__).resolve().parents[1] / "configs" / "acoustic.yaml"), save_snapshot=False)
    # spot-check cascade over base.yaml
    assert cfg["hidden_size"] == 256
    assert cfg["audio_num_mel_bins"] == 128
    assert cfg["diffusion_type"] == "reflow"
    assert cfg["backbone_args"]["num_channels"] == 1024
    assert cfg["optimizer_args"]["lr"] == 0.0006  # overridden
    assert cfg["optimizer_args"]["beta1"] == 0.9  # inherited from base


def test_override_config_merges_nested():
    old = {"a": {"b": 1, "c": 2}, "d": 3}
    override_config(old, {"a": {"b": 10}, "e": 4})
    assert old == {"a": {"b": 10, "c": 2}, "d": 3, "e": 4}


def test_schema_doc_covers_every_reference_key():
    """docs/ConfigurationSchemas.md documents every key the reference's
    schema doc does (combined `*_min/max` rows count for both bounds).
    Skipped when the reference tree is absent (doc-parity check only)."""
    import pathlib
    import re

    import pytest

    ref_doc = pathlib.Path("/root/reference/docs/ConfigurationSchemas.md")
    if not ref_doc.exists():
        pytest.skip("reference tree not mounted")
    repo = pathlib.Path(__file__).resolve().parents[1]
    doc = (repo / "docs" / "ConfigurationSchemas.md").read_text(encoding="utf8")

    ref_keys = re.findall(r"^###\s+([a-zA-Z0-9_.]+)\s*$", ref_doc.read_text(encoding="utf8"), re.M)
    assert len(ref_keys) > 150

    def covered(k):
        leaf = k.split(".")[-1]
        if k in doc or leaf in doc:
            return True
        if leaf.endswith("_max") and leaf[:-4] + "_min/max" in doc:
            return True
        if leaf.endswith("max") and re.search(re.escape(leaf[:-3]) + r"min/max", doc):
            return True
        return False

    missing = [k for k in ref_keys if not covered(k)]
    assert not missing, missing
