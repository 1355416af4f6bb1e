"""L6 infra tests: config merge precedence, loggers, plotting, misc utils
(reference configuration.py:58-97, logging.py:13-289, plotting.py:66-398,
utils.py:41-238 — the reference ships these untested)."""

import os

import numpy as np
import yaml

from safe_control_gym_tpu.utils.configuration import AttrDict, ConfigFactory, deep_set
from safe_control_gym_tpu.utils.logging import ExperimentLogger, FileLogger
from safe_control_gym_tpu.utils.plotting import load_from_logs, plot_from_logs
from safe_control_gym_tpu.utils.utils import (
    get_random_state,
    merge_dict,
    read_file,
    set_random_state,
    set_seed,
)


def test_config_merge_precedence(tmp_path):
    """Defaults <- override yaml <- kv_overrides <- typed literals
    (reference configuration.py:58-97)."""
    ov = tmp_path / "ov.yaml"
    ov.write_text(yaml.safe_dump({
        "task_config": {"ctrl_freq": 60, "episode_len_sec": 5},
        "algo_config": {"lr": 0.001},
    }))
    cfg = ConfigFactory().merge(args=[
        "--tag", "t1", "--seed", "7",
        "--overrides", str(ov),
        "--kv_overrides", "algo_config.lr=3e-4",
        "task_config.ctrl_freq=120", "task_config.name=fast",
    ])
    assert cfg.tag == "t1" and cfg.seed == 7
    # kv beats yaml; literals are typed, plain words stay strings.
    assert cfg.task_config["ctrl_freq"] == 120
    assert abs(cfg.algo_config["lr"] - 3e-4) < 1e-12
    assert isinstance(cfg.algo_config["lr"], float)
    assert cfg.task_config["name"] == "fast"
    assert cfg.task_config["episode_len_sec"] == 5  # yaml survives


def test_config_restore_roundtrip(tmp_path):
    from safe_control_gym_tpu.utils.configuration import save_config

    save_config({"tag": "x", "task_config": {"a": 1}}, str(tmp_path))
    cfg = ConfigFactory().merge(args=["--restore", str(tmp_path)])
    assert cfg.task_config["a"] == 1


def test_file_logger_restore_truncation(tmp_path):
    """FileLogger.restore(step) drops rows past the restore point
    (reference logging.py:95-124: resume without duplicated metric rows)."""
    fl = FileLogger(str(tmp_path))
    for s in range(10):
        fl.log("loss", float(s), s)
    fl.close()
    fl2 = FileLogger(str(tmp_path))
    fl2.restore(step=5)
    fl2.log("loss", 99.0, 5)
    fl2.close()
    steps, vals = [], []
    with open(os.path.join(str(tmp_path), "logs", "loss.log")) as f:
        for line in f:
            s, v = line.split()[:2]
            steps.append(int(float(s)))
            vals.append(float(v))
    assert max(steps) == 5 and vals[-1] == 99.0
    assert all(s <= 5 for s in steps)


def test_experiment_logger_and_plotting(tmp_path):
    d1, d2 = tmp_path / "seed0", tmp_path / "seed1"
    for i, d in enumerate((d1, d2)):
        lg = ExperimentLogger(str(d), log_std_out=False)
        for s in range(0, 100, 10):
            lg.add_scalar("eval/return", float(s + i), s)
        lg.dump_scalars()
        lg.close()
    logs = load_from_logs(str(d1))
    assert any("return" in k for k in logs)
    out = tmp_path / "curve.png"
    plot_from_logs([str(d1), str(d2)], metric="eval/return", out_path=str(out), window=2)
    assert out.exists() and out.stat().st_size > 0


def test_misc_utils(tmp_path):
    # read_file dispatch
    y = tmp_path / "x.yaml"
    y.write_text("a: 1\n")
    assert read_file(str(y)) == {"a": 1}
    j = tmp_path / "x.json"
    j.write_text('{"b": 2}')
    assert read_file(str(j)) == {"b": 2}
    # merge_dict recursion
    out = merge_dict({"a": {"b": 1, "c": 2}}, {"a": {"b": 9}})
    assert out == {"a": {"b": 9, "c": 2}}
    # deep_set
    d = {}
    deep_set(d, "x.y.z", 3)
    assert d == {"x": {"y": {"z": 3}}}
    # RNG snapshot/restore reproduces draws (reference utils.py:91-108)
    set_seed(123)
    snap = get_random_state()
    a = np.random.rand(3)
    set_random_state(snap)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
