"""Constraint compilation and evaluation semantics vs the reference
(safe_control_gym/envs/constraints.py)."""

import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.envs.benchmark import EnvSpaces
from safe_control_gym_tpu.envs.constraints import build_constraints

SPACES = EnvSpaces(
    state_low=np.array([-2.0, -10.0, -0.5, -10.0]),
    state_high=np.array([2.0, 10.0, 0.5, 10.0]),
    action_low=np.array([-10.0]),
    action_high=np.array([10.0]),
    obs_low=np.array([-2.0, -10.0, -0.5, -10.0]),
    obs_high=np.array([2.0, 10.0, 0.5, 10.0]),
)


def test_default_constraints_match_reference_layout():
    """default_constraint => BoundedConstraint on env spaces: rows are
    [-I; I], values [-x+lo; x-hi] (constraints.py:273-368)."""
    cc = build_constraints(
        [
            {"constraint_form": "default_constraint", "constrained_variable": "input"},
            {"constraint_form": "default_constraint", "constrained_variable": "state"},
        ],
        SPACES,
    )
    assert cc.num_constraints == 2 + 8
    x = jnp.asarray([0.5, 1.0, -0.2, 3.0])
    u = jnp.asarray([2.0])
    vals = np.asarray(cc.get_values(x, u))
    want = np.concatenate(
        [
            [-2.0 - 10.0, 2.0 - 10.0],  # input rows: -u - 10, u - 10
            -np.asarray(x) + SPACES.state_low,
            np.asarray(x) - SPACES.state_high,
        ]
    )
    np.testing.assert_allclose(vals, np.round(want, 8), atol=1e-6)
    assert not bool(cc.is_violated(cc.get_values(x, u)))
    # Violate state upper bound.
    x_bad = jnp.asarray([2.5, 0.0, 0.0, 0.0])
    assert bool(cc.is_violated(cc.get_values(x_bad, u)))


def test_linear_constraint_with_active_dims():
    """active_dims folds into the stacked A (constraints.py:69-80)."""
    cc = build_constraints(
        [
            {
                "constraint_form": "linear_constraint",
                "constrained_variable": "state",
                "A": [[1.0, -1.0]],
                "b": [1.0],
                "active_dims": [0, 2],
            }
        ],
        SPACES,
    )
    x = jnp.asarray([0.7, 99.0, 0.3, -99.0])  # uses dims 0 and 2 only
    vals = np.asarray(cc.get_values(x, jnp.zeros(1)))
    np.testing.assert_allclose(vals, [0.7 - 0.3 - 1.0], atol=1e-6)


def test_quadratic_and_ordering():
    """Quadratic rows interleave back in spec order (ConstraintList order,
    constraints.py:503-520)."""
    cc = build_constraints(
        [
            {
                "constraint_form": "quadratic_constraint",
                "constrained_variable": "state",
                "P": np.eye(4).tolist(),
                "b": 1.0,
            },
            {
                "constraint_form": "linear_constraint",
                "constrained_variable": "input",
                "A": [[1.0]],
                "b": [5.0],
            },
        ],
        SPACES,
    )
    x = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    u = jnp.asarray([2.0])
    vals = np.asarray(cc.get_values(x, u))
    np.testing.assert_allclose(vals, [1.0, -3.0], atol=1e-6)  # quad first
    assert cc.num_constraints == 2


def test_strict_and_tolerance_semantics():
    cc = build_constraints(
        [
            {
                "constraint_form": "linear_constraint",
                "constrained_variable": "input",
                "A": [[1.0]],
                "b": [5.0],
                "strict": True,
                "tolerance": [1.0],
            }
        ],
        SPACES,
    )
    at_boundary = cc.get_values(jnp.zeros(4), jnp.asarray([5.0]))
    assert bool(cc.is_violated(at_boundary))  # strict: >= 0 violates
    near = cc.get_values(jnp.zeros(4), jnp.asarray([4.5]))
    assert not bool(cc.is_violated(near))
    assert bool(cc.is_almost_active(near))  # within tolerance 1.0
    far = cc.get_values(jnp.zeros(4), jnp.asarray([3.0]))
    assert not bool(cc.is_almost_active(far))


def test_batched_evaluation():
    cc = build_constraints(
        [{"constraint_form": "default_constraint", "constrained_variable": "state"}],
        SPACES,
    )
    xs = jnp.zeros((7, 4))
    us = jnp.zeros((7, 1))
    vals = cc.get_values(xs, us)
    assert vals.shape == (7, 8)
    assert cc.is_violated(vals).shape == (7,)


def test_symmetric_constraint():
    """|x_filtered| <= bound, d rows interleaved in spec order (reference
    SymmetricStateConstraint, constraints.py:371-415)."""
    cc = build_constraints(
        [
            {
                "constraint_form": "linear_constraint",
                "constrained_variable": "input",
                "A": [[1.0]],
                "b": [5.0],
            },
            {
                "constraint_form": "symmetric_constraint",
                "constrained_variable": "state",
                "bound": [1.5, 0.25],
                "active_dims": [0, 2],
            },
        ],
        SPACES,
    )
    assert cc.num_constraints == 3
    x = jnp.asarray([-1.0, 99.0, 0.3, -99.0])
    u = jnp.asarray([2.0])
    vals = np.asarray(cc.get_values(x, u))
    # Spec order: linear row first, then the two |x|-b rows.
    np.testing.assert_allclose(vals, [-3.0, 1.0 - 1.5, 0.3 - 0.25], atol=1e-6)
    assert bool(cc.is_violated(cc.get_values(x, u)))
    x_ok = jnp.asarray([1.0, 0.0, -0.2, 0.0])
    assert not bool(cc.is_violated(cc.get_values(x_ok, u)))
    # State-only rows view picks up the symmetric rows.
    sv = np.asarray(cc.get_state_values(x_ok))
    np.testing.assert_allclose(sv, [1.0 - 1.5, 0.2 - 0.25], atol=1e-6)
