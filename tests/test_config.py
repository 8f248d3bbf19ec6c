"""Config-system and CLI tests."""
import json

import pytest

from psgd_tf_tpu import config
from psgd_tf_tpu.workloads import hello_psgd


def test_schema_reflects_signature():
    s = config.schema(hello_psgd.run)
    assert s["steps"] == 500
    assert s["preconditioner"] == "dense"
    assert s["lr_params"] == 0.5


def test_load_file_and_overrides(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"steps": 10, "lr_params": 0.3}))
    cfg = config.load(hello_psgd.run, str(p), ["steps=20", "seed=7"])
    assert cfg == {"steps": 20, "lr_params": 0.3, "seed": 7}


def test_load_rejects_unknown_keys():
    with pytest.raises(ValueError, match="unknown config keys"):
        config.load(hello_psgd.run, None, ["nope=1"])


def test_override_type_coercion():
    cfg = config.load(hello_psgd.run, None, ["lr_params=0.25", "steps=3"])
    assert cfg["lr_params"] == 0.25 and isinstance(cfg["steps"], int)


def test_cli_list_and_run(capsys):
    from psgd_tf_tpu.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "mnist_lenet5" in out and "hello_psgd" in out

    # rc mirrors the workload's success flag (120 steps may not hit the
    # 1e-4 convergence bar); the run itself must complete and echo config
    rc = main(["run", "hello_psgd", "--set", "steps=120"])
    assert rc in (0, 1)
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["steps"] == 120 and "loss" in result
