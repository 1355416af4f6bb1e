"""Example scripts run headless (reference tests/test_examples/test_examples.py
runs tracking.py and verbose_api.py with rewritten argv)."""

import os
import subprocess
import sys

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
