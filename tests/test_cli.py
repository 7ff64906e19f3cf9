"""CLI entry point tests (visinger_tpu/run.py) — cheap paths only."""

import json
import os

import numpy as np
import yaml

from visinger_tpu.run import main


def _write_tiny_cfg(tmp_path, processed, binary):
    cfg_fn = tmp_path / "cfg.yaml"
    base = os.path.join(os.path.dirname(__file__), "..", "visinger_tpu",
                        "config", "defaults", "visinger_csd.yaml")
    cfg = {
        "base_config": [os.path.abspath(base)],
        "processed_data_dir": str(processed),
        "binary_data_dir": str(binary),
        "binarization_args": {
            "train_range": [2, -1], "valid_range": [1, 2],
            "test_range": [0, 1], "min_text": 2,
        },
    }
    cfg_fn.write_text(yaml.safe_dump(cfg))
    return str(cfg_fn)


def test_cli_synth_data_and_binarize(tmp_path):
    processed = tmp_path / "processed"
    binary = tmp_path / "binary"
    cfg_fn = _write_tiny_cfg(tmp_path, processed, binary)
    main(["synth-data", "--config", cfg_fn, "--n_items", "5"])
    assert (processed / "metadata.json").exists()
    assert (processed / "phone_set.json").exists()
    main(["binarize", "--config", cfg_fn])
    lengths = np.load(binary / "train_lengths.npy")
    assert len(lengths) >= 1
    with open(binary / "dur_map.json") as f:
        assert json.load(f)["[PAD]"] == 0


def test_cli_exp_name_persists_config(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    processed = tmp_path / "p"
    binary = tmp_path / "b"
    cfg_fn = _write_tiny_cfg(tmp_path, processed, binary)
    main(["synth-data", "--config", cfg_fn, "--exp_name", "exp1",
          "--n_items", "3"])
    saved = tmp_path / "checkpoints" / "exp1" / "config.yaml"
    assert saved.exists()
    with open(saved) as f:
        persisted = yaml.safe_load(f)
    assert persisted["processed_data_dir"] == str(processed)
    # re-resolve from the persisted config (simulates resume)
    main(["synth-data", "--exp_name", "exp1", "--n_items", "3"])


def test_cli_remove_and_debug_flags(tmp_path, monkeypatch):
    """--remove deletes the work dir after interactive confirm (reference
    hparams.py:110-113); --debug lands in the persisted config
    (hparams.py:120)."""
    monkeypatch.chdir(tmp_path)
    processed = tmp_path / "p"
    binary = tmp_path / "b"
    cfg_fn = _write_tiny_cfg(tmp_path, processed, binary)
    main(["synth-data", "--config", cfg_fn, "--exp_name", "exp_rm",
          "--n_items", "3", "--debug"])
    work = tmp_path / "checkpoints" / "exp_rm"
    with open(work / "config.yaml") as f:
        assert yaml.safe_load(f)["debug"] is True
    # N answer: work dir kept
    monkeypatch.setattr("builtins.input", lambda _="": "n")
    main(["synth-data", "--config", cfg_fn, "--exp_name", "exp_rm",
          "--n_items", "3", "--remove"])
    assert work.exists()
    # Y answer: removed, then recreated fresh by the run
    monkeypatch.setattr("builtins.input", lambda _="": "Y")
    (work / "marker.txt").write_text("x")
    main(["synth-data", "--config", cfg_fn, "--exp_name", "exp_rm",
          "--n_items", "3", "--remove"])
    assert not (work / "marker.txt").exists()
    assert (work / "config.yaml").exists()


def test_readonly_commands_do_not_rewrite_persisted_config(tmp_path,
                                                           monkeypatch):
    """infer/test/validate take one-off --hparams without mutating the
    experiment's saved config.yaml (round-2 review finding; the reference
    likewise skips persistence under --infer, hparams.py:84)."""
    import pytest

    monkeypatch.chdir(tmp_path)
    processed = tmp_path / "p"
    binary = tmp_path / "b"
    cfg_fn = _write_tiny_cfg(tmp_path, processed, binary)
    main(["synth-data", "--config", cfg_fn, "--exp_name", "exp2",
          "--n_items", "3"])
    main(["binarize", "--exp_name", "exp2"])
    saved = tmp_path / "checkpoints" / "exp2" / "config.yaml"
    before = saved.read_text()
    # no checkpoint exists -> validate/test exit early, AFTER config resolve
    with pytest.raises(SystemExit):
        main(["validate", "--exp_name", "exp2", "-hp", "use_pallas=true"])
    with pytest.raises(SystemExit):
        main(["test", "--exp_name", "exp2", "-hp", "max_sentences=1"])
    persisted = yaml.safe_load(saved.read_text())
    assert persisted.get("use_pallas") is not True
    assert persisted["max_sentences"] != 1
    assert saved.read_text() == before
