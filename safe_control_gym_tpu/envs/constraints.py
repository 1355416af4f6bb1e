"""Batched constraint evaluation.

TPU-native counterpart of the reference's constraint framework
(safe_control_gym/envs/constraints.py).  The reference evaluates a Python list
of constraint objects one by one per step; here the YAML spec list is
*compiled once* into stacked matrices and flag vectors, and evaluation is a
single fused affine op over (state, input) — shape-static, vmap-friendly, and
differentiable (so controllers get the "symbolic" constraint form for free).

Semantics preserved from the reference:
  * every constraint is g(x) <= 0 (constraints.py:21-33);
  * ``active_dims`` becomes a selection filter folded into the stacked A
    (constraints.py:69-80);
  * values are rounded to 8 decimals before the violation test
    (constraints.py:106-119);
  * ``strict`` rows violate at >= 0, others at > 0 (constraints.py:121-141);
  * ``is_almost_active`` uses per-row tolerances (constraints.py:143-158);
  * constraint order and concatenation match ConstraintList.get_values
    (constraints.py:503-520).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.envs.benchmark import EnvSpaces

BIG = 1e30  # Stand-in for the reference's float32 max bounds.


@dataclasses.dataclass(frozen=True)
class _Quadratic:
    """One x^T P x <= b row (reference QuadraticContstraint, constraints.py:179-223)."""

    P: np.ndarray  # (d, d), filter already applied: full-dim P' = F^T P F
    b: float
    on_input: bool  # False: acts on state; True: acts on input.


@dataclasses.dataclass(frozen=True)
class _Symmetric:
    """One |F x| <= b block (reference SymmetricStateConstraint,
    constraints.py:371-415): d rows of |x_filtered| - bound."""

    F: np.ndarray  # (d, nx) selection filter
    b: np.ndarray  # (d,)


@dataclasses.dataclass(frozen=True)
class CompiledConstraints:
    """Stacked constraint program.

    Rows are ordered exactly like the reference's ConstraintList: one block per
    spec entry, in YAML order.  Linear/bounded/default rows live in (A_x, A_u,
    b); quadratic entries are kept separately and interleaved back by
    ``row_order``.
    """

    num_constraints: int
    A_x: np.ndarray  # (nc_lin, nx)
    A_u: np.ndarray  # (nc_lin, nu)
    b: np.ndarray  # (nc_lin,)
    quadratics: Sequence[_Quadratic]
    symmetrics: Sequence[_Symmetric]
    row_order: np.ndarray  # (nc,) permutation: output row -> position in [lin rows..., quad rows..., sym rows...]
    strict: np.ndarray  # (nc,) bool
    tolerance: np.ndarray  # (nc,) float; -inf disables almost-active for that row
    state_only_rows: np.ndarray  # (nc,) bool: rows from STATE-type constraints
    input_rows: np.ndarray  # (nc,) bool: rows from INPUT-type constraints
    rounding: int = 8

    def get_values_raw(self, x, u):
        """Differentiable evaluation (no rounding) — used by controllers
        (MPC/CBF) that need constraint *gradients*; jnp.round has zero
        gradient, so the rounded path must never sit on a controller's
        autodiff path."""
        dtype = x.dtype
        vals = [x @ self.A_x.T.astype(dtype) + u @ self.A_u.T.astype(dtype) - self.b.astype(dtype)]
        for q in self.quadratics:
            v = u if q.on_input else x
            P = jnp.asarray(q.P, dtype)
            vals.append(((v @ P) * v).sum(-1, keepdims=True) - jnp.asarray(q.b, dtype))
        for s in self.symmetrics:
            vals.append(jnp.abs(x @ s.F.T.astype(dtype)) - s.b.astype(dtype))
        stacked = jnp.concatenate(vals, axis=-1)
        return stacked[..., self.row_order]

    def get_values(self, x, u):
        """Evaluate all constraints. x: (..., nx), u: (..., nu) -> (..., nc).
        Rounded to 8 decimals like the reference (constraints.py:119)."""
        ordered = self.get_values_raw(x, u)
        scale = 10.0 ** self.rounding
        return jnp.round(ordered * scale) / scale

    def is_violated(self, values):
        """Any row violated (reference ConstraintList.is_violated, :541-563)."""
        strict = jnp.asarray(self.strict)
        hit = jnp.where(strict, values >= 0.0, values > 0.0)
        return jnp.any(hit, axis=-1)

    def is_almost_active(self, values):
        """Any row within tolerance of violation (reference :565-583)."""
        tol = jnp.asarray(self.tolerance, values.dtype)
        return jnp.any(values + tol > 0.0, axis=-1)

    def get_state_values(self, x):
        """State-only constraint values for reset info (benchmark_env.py:376-383).

        Returns the state-constraint rows in list order.
        """
        u = jnp.zeros((*x.shape[:-1], self.A_u.shape[1]), x.dtype)
        vals = self.get_values(x, u)
        idx = np.nonzero(self.state_only_rows)[0]
        return vals[..., idx]


def _filter_matrix(dim: int, active_dims) -> np.ndarray:
    if active_dims is None:
        return np.eye(dim)
    if isinstance(active_dims, int):
        active_dims = [active_dims]
    return np.eye(dim)[np.asarray(active_dims)]


def build_constraints(
    specs: Optional[Sequence[dict]], spaces: EnvSpaces
) -> Optional[CompiledConstraints]:
    """Compile YAML constraint specs (reference create_constraint_list,
    constraints.py:594-612) into a ``CompiledConstraints`` program."""
    if not specs:
        return None
    nx, nu = spaces.state_dim, spaces.action_dim
    lin_Ax, lin_Au, lin_b = [], [], []
    lin_meta = []  # (strict, tol_or_None, var_type) per linear row-block
    quads: list[_Quadratic] = []
    quad_meta = []
    syms: list[_Symmetric] = []
    sym_meta = []
    order_tags = []  # ('lin', n_rows) / ('quad', 1) / ('sym', d) in spec order

    for spec in specs:
        spec = dict(spec)
        form = spec.pop("constraint_form")
        var = spec.pop("constrained_variable")
        strict = bool(spec.pop("strict", False))
        active_dims = spec.pop("active_dims", None)
        tolerance = spec.pop("tolerance", None)
        if var == "state":
            dim = nx
        elif var == "input":
            dim = nu
        elif var == "input_and_state":
            dim = nx + nu
        else:
            raise ValueError(f"invalid constrained_variable {var!r}")
        F = _filter_matrix(dim, active_dims)

        def _split(A_full):
            """Split full-dim rows into state and input blocks."""
            rows = A_full.shape[0]
            if var == "state":
                return A_full, np.zeros((rows, nu))
            if var == "input":
                return np.zeros((rows, nx)), A_full
            return A_full[:, :nx], A_full[:, nx:]

        if form == "linear_constraint":
            A = np.array(spec["A"], ndmin=2, dtype=float)
            b = np.array(spec["b"], ndmin=1, dtype=float)
            A_full = A @ F
            Ax, Au = _split(A_full)
            lin_Ax.append(Ax)
            lin_Au.append(Au)
            lin_b.append(b)
            lin_meta.append((strict, tolerance, var, A.shape[0]))
            order_tags.append(("lin", A.shape[0]))
        elif form in ("bounded_constraint", "default_constraint"):
            if form == "default_constraint":
                # Bounds default to the env spaces (constraints.py:307-368).
                if var == "state":
                    lo_def, hi_def = spaces.state_low, spaces.state_high
                elif var == "input":
                    lo_def, hi_def = spaces.action_low, spaces.action_high
                else:
                    raise ValueError("default_constraint must be state or input")
                lo = np.asarray(spec.get("lower_bounds", lo_def), dtype=float)
                hi = np.asarray(spec.get("upper_bounds", hi_def), dtype=float)
                # Clamp the reference's float32-max sentinels to a finite BIG
                # so the affine evaluation stays NaN-free.
                lo = np.maximum(lo, -BIG)
                hi = np.minimum(hi, BIG)
            else:
                lo = np.array(spec["lower_bounds"], ndmin=1, dtype=float)
                hi = np.array(spec["upper_bounds"], ndmin=1, dtype=float)
            d = lo.shape[0]
            A = np.vstack([-np.eye(d), np.eye(d)])  # (2d, d)
            b = np.hstack([-lo, hi])
            A_full = A @ F
            Ax, Au = _split(A_full)
            lin_Ax.append(Ax)
            lin_Au.append(Au)
            lin_b.append(b)
            lin_meta.append((strict, tolerance, var, 2 * d))
            order_tags.append(("lin", 2 * d))
        elif form == "symmetric_constraint":
            # |x_filtered| <= bound, d rows (reference SymmetricStateConstraint,
            # constraints.py:371-415; state-only by construction there).
            if var != "state":
                raise ValueError("symmetric_constraint must be on state")
            bound = np.array(spec["bound"], ndmin=1, dtype=float)
            if F.shape[0] != bound.shape[0]:
                if active_dims is None and bound.shape[0] < nx:
                    raise ValueError(
                        "symmetric_constraint bound dim does not match state dim"
                    )
            syms.append(_Symmetric(F=F, b=bound))
            sym_meta.append((strict, tolerance, var, bound.shape[0]))
            order_tags.append(("sym", bound.shape[0]))
        elif form == "quadratic_constraint":
            P = np.array(spec["P"], ndmin=2, dtype=float)
            P_full = F.T @ P @ F
            quads.append(
                _Quadratic(P=P_full, b=float(spec["b"]), on_input=(var == "input"))
            )
            quad_meta.append((strict, tolerance, var, 1))
            order_tags.append(("quad", 1))
        else:
            raise ValueError(f"unknown constraint_form {form!r}")

    nc_lin = sum(n for _, _, _, n in lin_meta)
    A_x = np.vstack(lin_Ax) if lin_Ax else np.zeros((0, nx))
    A_u = np.vstack(lin_Au) if lin_Au else np.zeros((0, nu))
    b = np.hstack(lin_b) if lin_b else np.zeros((0,))

    # Rebuild output-row order = spec order (lin rows first in the stacked
    # value vector, quad rows appended after).
    row_order, strict_v, tol_v, state_v, input_v = [], [], [], [], []
    lin_cursor, quad_cursor = 0, nc_lin
    sym_cursor = nc_lin + len(quads)
    lin_i, quad_i, sym_i = 0, 0, 0
    for kind, n in order_tags:
        if kind == "lin":
            strict_f, tol, var, _ = lin_meta[lin_i]
            lin_i += 1
            rows = list(range(lin_cursor, lin_cursor + n))
            lin_cursor += n
        elif kind == "sym":
            strict_f, tol, var, _ = sym_meta[sym_i]
            sym_i += 1
            rows = list(range(sym_cursor, sym_cursor + n))
            sym_cursor += n
        else:
            strict_f, tol, var, _ = quad_meta[quad_i]
            quad_i += 1
            rows = [quad_cursor]
            quad_cursor += 1
        row_order.extend(rows)
        strict_v.extend([strict_f] * n)
        if tol is None:
            tol_v.extend([-np.inf] * n)
        else:
            tol_arr = np.array(tol, ndmin=1, dtype=float)
            tol_v.extend((tol_arr if tol_arr.size == n else np.full(n, tol_arr[0])).tolist())
        state_v.extend([var == "state"] * n)
        input_v.extend([var == "input"] * n)

    return CompiledConstraints(
        num_constraints=len(row_order),
        A_x=A_x,
        A_u=A_u,
        b=b,
        quadratics=tuple(quads),
        symmetrics=tuple(syms),
        row_order=np.asarray(row_order, dtype=np.int32),
        strict=np.asarray(strict_v, dtype=bool),
        tolerance=np.asarray(tol_v, dtype=float),
        state_only_rows=np.asarray(state_v, dtype=bool),
        input_rows=np.asarray(input_v, dtype=bool),
    )


def box_bounds_view(specs, nx: int, nu: int, spaces=None):
    """Per-dim box bounds when ``specs`` is a pure box program, else None.

    The Pallas whole-rollout engines count constraint violations in-kernel
    with per-dimension bound comparisons; that is exact only when every spec
    is a plain (default|bounded) box on ``state`` or ``input`` — non-strict,
    with at most a subset ``active_dims`` filter.  Linear/quadratic/symmetric
    forms, ``input_and_state`` coupling, and strict rows cannot be expressed
    as an independent per-dim test, so this returns None and the engines fall
    back to the general path (``supports()`` gates on it).

    Returns ``(s_lo, s_hi, u_lo, u_hi)`` float arrays with bounds intersected
    across specs and ``±BIG`` where unconstrained.  With ``spaces=None`` the
    default-constraint bounds degrade to ``±BIG`` placeholders — callers that
    only need a validity check (``supports()``) pass no spaces.
    """
    if not specs:
        return None
    s_lo, s_hi = np.full(nx, -BIG), np.full(nx, BIG)
    u_lo, u_hi = np.full(nu, -BIG), np.full(nu, BIG)
    for spec in specs:
        form = spec.get("constraint_form")
        var = spec.get("constrained_variable")
        if form not in ("bounded_constraint", "default_constraint"):
            return None
        if var not in ("state", "input"):
            return None
        if spec.get("strict", False):
            return None
        dim = nx if var == "state" else nu
        ad = spec.get("active_dims")
        dims = np.arange(dim) if ad is None else np.atleast_1d(np.asarray(ad, int))
        if dims.ndim != 1 or (dims < 0).any() or (dims >= dim).any():
            return None
        if form == "default_constraint":
            if spaces is not None:
                lo_def = np.asarray(
                    spaces.state_low if var == "state" else spaces.action_low, float)
                hi_def = np.asarray(
                    spaces.state_high if var == "state" else spaces.action_high, float)
            else:
                lo_def, hi_def = np.full(dim, -BIG), np.full(dim, BIG)
            lo = np.asarray(spec.get("lower_bounds", lo_def[dims]), float).ravel()
            hi = np.asarray(spec.get("upper_bounds", hi_def[dims]), float).ravel()
        else:
            if "lower_bounds" not in spec or "upper_bounds" not in spec:
                return None
            lo = np.asarray(spec["lower_bounds"], float).ravel()
            hi = np.asarray(spec["upper_bounds"], float).ravel()
        if lo.size != dims.size or hi.size != dims.size:
            return None
        tgt_lo, tgt_hi = (s_lo, s_hi) if var == "state" else (u_lo, u_hi)
        np.maximum.at(tgt_lo, dims, np.maximum(lo, -BIG))
        np.minimum.at(tgt_hi, dims, np.minimum(hi, BIG))
    return s_lo, s_hi, u_lo, u_hi
