"""Example scripts run headless (reference tests/test_examples/test_examples.py
runs tracking.py and verbose_api.py with rewritten argv)."""

import pytest
import os
import subprocess
import sys

pytestmark = pytest.mark.slow  # heavyweight: excluded from the fast CI shard


HERE = os.path.dirname(__file__)
EXAMPLES = os.path.join(HERE, "..", "examples")
ENV = {**os.environ, "JAX_PLATFORMS": ""}


def _run(args):
    return subprocess.run(
        [sys.executable] + args,
        capture_output=True, text=True, timeout=400,
        cwd=os.path.join(HERE, ".."),
        env=ENV,
    )


def test_tracking_example():
    # conftest forces CPU via jax.config; subprocesses need the same nudge.
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import sys; sys.argv=['tracking.py','--max_steps','10'];"
        f"exec(open(r'{os.path.join(EXAMPLES, 'tracking.py')}').read())"
    )
    r = _run(["-c", code])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "steps/sec" in r.stdout


def test_verbose_api_example():
    for task in ("cartpole", "quadrotor"):
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu');"
            f"import sys; sys.argv=['verbose_api.py','--task','{task}'];"
            f"exec(open(r'{os.path.join(EXAMPLES, 'verbose_api.py')}').read())"
        )
        r = _run(["-c", code])
        assert r.returncode == 0, r.stderr[-2000:]
        assert "reset -> obs" in r.stdout
        assert "constraint_values" in r.stdout


def test_scenario_rehearsal_example(tmp_path):
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        f"import sys; sys.argv=['scenario_rehearsal.py','--scenario','line',"
        f"'--out',r'{tmp_path}','--no-video'];"
        f"exec(open(r'{os.path.join(EXAMPLES, 'scenario_rehearsal.py')}').read())"
    )
    r = _run(["-c", code])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "tracked setpoints" in r.stdout
    # tracking within half a meter on the gentle 'line' scenario
    import re
    m = re.search(r"mean err=([\d.]+)", r.stdout)
    assert m and float(m.group(1)) < 0.5, r.stdout


def test_rl_training_example(tmp_path):
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        f"import sys; sys.argv=['rl_training.py','--steps','12800','--out',r'{tmp_path}'];"
        f"exec(open(r'{os.path.join(EXAMPLES, 'rl_training.py')}').read())"
    )
    r = _run(["-c", code])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "eval return after training" in r.stdout
    assert os.path.exists(os.path.join(str(tmp_path), "checkpoint"))
    assert os.path.exists(os.path.join(str(tmp_path), "learning_curve.png"))
