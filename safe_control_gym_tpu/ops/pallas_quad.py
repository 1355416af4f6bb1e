"""Fused Pallas TPU kernel for the 3D-quadrotor integration hot loop.

The environment hot path integrates the 12-state rigid body with
``PYB_STEPS_PER_CTRL`` RK4 substeps per control step (reference
base_aviary.py:266-322 runs this as the inner PyBullet loop; here it is the
compute core of ``Quadrotor.step``).  Under plain XLA the vmapped substep
chain compiles to dozens of small VPU kernels whose dispatch overhead
dominates at B≈4k (measured ~28 us per substep on v5p vs <1 us of actual
VPU compute).  This kernel fuses the *entire* substep loop — all RK4 stages
of all substeps — into one Pallas program: state lives in VMEM/registers as
12 component tiles, HBM is touched exactly once in and once out.

Layout: batch spread over **sublanes x lanes** — each state component
arrives as an (8, B/8) tile (f32 native tile is (8, 128)), so every
elementwise op drives all 8 VPU sublanes.  The first cut used (1, B) rows
(batch on lanes only) and measured 59 us/call at B=4096 — 1/8 VPU
utilization; this layout runs the same math ~8x faster.

Dispatch is a ``jax.custom_batching.custom_vmap``: the unbatched primal is
the caller-supplied XLA substep chain (bitwise-identical to the historical
path, and what CPU tests exercise); the batched rule routes eligible shapes
(TPU backend, f32, B % 128 == 0, no aero augmentation) to the fused kernel
and everything else to ``jax.vmap`` of the primal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Matches envs/quadrotor.py constants (reference assets/cf2x.urdf params).
_GRAVITY = 9.8
_ARM_L = 0.0397
_KF = 3.16e-10
_KM_OVER_KF = 7.94e-12 / _KF
_PWM2RPM_SCALE = 0.2685
_PWM2RPM_CONST = 4070.3
_MIN_PWM = 20000.0
_MAX_PWM = 65535.0

_NX = 12  # [x, vx, y, vy, z, vz, phi, theta, psi, p, q, r]
_TPU_PLATFORMS = ("tpu", "axon")


def _fc_rows(s, f, ext, minv, j, g, arm_l, km_over_kf):
    """Rigid-body derivative on per-component (sub, lanes) tiles.

    Same closed form as envs/quadrotor.py::quad_fc_3d (itself transcribed
    from reference quadrotor.py:624-674); kept in component-row form so the
    whole chain stays one fused VPU program.
    """
    vx, vy, vz = s[1], s[3], s[5]
    phi, theta, psi = s[6], s[7], s[8]
    p, q, r = s[9], s[10], s[11]
    f1, f2, f3, f4 = f

    T = f1 + f2 + f3 + f4
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    cth, sth = jnp.cos(theta), jnp.sin(theta)
    cpsi, spsi = jnp.cos(psi), jnp.sin(psi)
    # Thrust direction = body z-axis in world frame (ops/rotations.py:85-98).
    zb_x = cpsi * sth * cphi + spsi * sphi
    zb_y = spsi * sth * cphi - cpsi * sphi
    zb_z = cth * cphi
    ax = (zb_x * T + ext[0]) * minv
    ay = (zb_y * T + ext[1]) * minv
    az = (zb_z * T + ext[2]) * minv - g

    l_sq2 = arm_l / (2.0**0.5)
    mx = l_sq2 * (f1 + f2 - f3 - f4)
    my = l_sq2 * (-f1 + f2 + f3 - f4)
    mz = km_over_kf * (f1 - f2 + f3 - f4)
    jx, jy, jz = j
    # gyroscopic term: pqr x (J pqr)
    gx = q * (jz * r) - r * (jy * q)
    gy = r * (jx * p) - p * (jz * r)
    gz = p * (jy * q) - q * (jx * p)
    p_dot = (mx - gx) / jx
    q_dot = (my - gy) / jy
    r_dot = (mz - gz) / jz

    tth = sth / cth
    phi_dot = p + sphi * tth * q + cphi * tth * r
    theta_dot = cphi * q - sphi * r
    psi_dot = sphi / cth * q + cphi / cth * r

    return (vx, ax, vy, ay, vz, az, phi_dot, theta_dot, psi_dot, p_dot, q_dot, r_dot)


def _axpy(x, a, k):
    return tuple(xi + a * ki for xi, ki in zip(x, k))


def _actuate(t):
    """Per-motor thrust command -> realized force: the cmd2pwm -> pwm2rpm ->
    rpm^2*KF pipeline (envs/quadrotor.py:229-244, reference
    quadrotor_utils.py:21-67) fused into the kernel so the env step passes
    raw thrusts and saves the separate preprocess kernels."""
    pwm = (jnp.sqrt(jnp.maximum(t, 0.0) / _KF) - _PWM2RPM_CONST) / _PWM2RPM_SCALE
    pwm = jnp.clip(pwm, _MIN_PWM, _MAX_PWM)
    rpm = _PWM2RPM_SCALE * pwm + _PWM2RPM_CONST
    return rpm * rpm * _KF


def _substeps_kernel(x_ref, f_ref, ext_ref, m_ref, j_ref, o_ref, *,
                     dt, n_sub, euler, g, arm_l, km_over_kf, actuation):
    # refs are (rows, SUB, LANES); component i is the (SUB, LANES) tile ref[i].
    x = x_ref[:]
    s = tuple(x[i] for i in range(_NX))
    fr = f_ref[:]
    f = tuple(fr[i] for i in range(4))
    if actuation:
        f = tuple(_actuate(fi) for fi in f)
    er = ext_ref[:]
    ext = tuple(er[i] for i in range(3))
    minv = 1.0 / m_ref[0]
    jr = j_ref[:]
    j = tuple(jr[i] for i in range(3))

    fc = functools.partial(_fc_rows, f=f, ext=ext, minv=minv, j=j, g=g,
                           arm_l=arm_l, km_over_kf=km_over_kf)
    for _ in range(n_sub):
        if euler:
            s = _axpy(s, dt, fc(s))
        else:
            k1 = fc(s)
            k2 = fc(_axpy(s, dt / 2, k1))
            k3 = fc(_axpy(s, dt / 2, k2))
            k4 = fc(_axpy(s, dt, k3))
            s = tuple(
                si + dt / 6 * (a + 2 * b + 2 * c + d)
                for si, a, b, c, d in zip(s, k1, k2, k3, k4)
            )
    o_ref[:] = jnp.stack(s, axis=0)


def _pallas_substeps(x_b, f_b, ext_b, m_b, j_b, *, dt, n_sub, euler,
                     g, arm_l, km_over_kf, block, sub, actuation=False,
                     interpret=False):
    """(B, nx) batched fused substeps via one Pallas program.

    Components are laid out as (rows, sub, B/sub): sublane dim ``sub`` (8 for
    full VPU occupancy when B % 1024 == 0, else 1) x lane dim B/sub.
    ``block`` tiles the lane dimension.
    """
    B = x_b.shape[0]
    dtype = x_b.dtype
    lanes = B // sub
    grid = lanes // block
    kern = functools.partial(
        _substeps_kernel, dt=dt, n_sub=n_sub, euler=euler, g=g,
        arm_l=arm_l, km_over_kf=km_over_kf, actuation=actuation,
    )
    row_spec = lambda rows: pl.BlockSpec(
        (rows, sub, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    def to_tiles(a, rows):
        # (B, rows) -> (rows, sub, lanes): component-major, batch split over
        # sublanes x lanes.
        return a.T.reshape(rows, sub, lanes)

    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[row_spec(_NX), row_spec(4), row_spec(3), row_spec(1), row_spec(3)],
        out_specs=row_spec(_NX),
        out_shape=jax.ShapeDtypeStruct((_NX, sub, lanes), dtype),
        cost_estimate=pl.CostEstimate(
            # ~115 flops + 8 transcendentals per fc eval; 4 evals/substep.
            flops=n_sub * 4 * 115 * B,
            transcendentals=n_sub * 4 * 8 * B,
            bytes_accessed=(2 * _NX + 4 + 3 + 1 + 3) * B * 4,
        ),
        interpret=interpret,
    )(
        to_tiles(x_b, _NX),
        to_tiles(f_b, 4),
        to_tiles(ext_b, 3),
        m_b.reshape(1, sub, lanes),
        to_tiles(j_b, 3),
    )
    return out.reshape(_NX, B).T


def make_quad3d_integrator(xla_substeps, dt, n_sub, euler=False, *,
                           g=_GRAVITY, arm_l=_ARM_L, km_over_kf=_KM_OVER_KF,
                           actuation=False, force_pallas=None):
    """Build the substep integrator with a fused-TPU batched fast path.

    ``xla_substeps(x, forces, ext, mass, j_diag) -> x'`` is the unbatched
    reference chain (rk4_step/euler_step loop over ``n_sub``); it remains the
    primal, so anything that never vmaps — or runs on CPU — is untouched.
    ``force_pallas``: None = auto (TPU + eligible shapes), False = never,
    True = use the kernel in interpret mode even off-TPU (tests).
    ``actuation=True``: the second argument is raw per-motor thrust commands
    and the cmd2pwm/pwm2rpm/force pipeline runs inside the kernel (the
    primal must then apply the same pipeline itself).
    """

    @jax.custom_batching.custom_vmap
    def integrate(x, forces, ext, mass, j_diag):
        return xla_substeps(x, forces, ext, mass, j_diag)

    @integrate.def_vmap
    def _batched(axis_size, in_batched, x, forces, ext, mass, j_diag):
        args = [x, forces, ext, mass, j_diag]
        # Broadcast any unbatched operand to the batch (leading) axis.
        full = [
            a if b else jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))
            for a, b in zip(args, in_batched)
        ]
        x_b, f_b, ext_b, m_b, j_b = full
        platform = jax.devices()[0].platform
        # Sublane split for full VPU occupancy; lanes must stay 128-aligned
        # and the lane block must tile the lane extent exactly.
        sub = 8 if axis_size % 1024 == 0 else 1
        lanes = axis_size // sub
        if lanes % 4096 == 0:
            block = 4096
        elif lanes <= 4096 and lanes % 128 == 0:
            block = lanes
        else:
            block = 0
        eligible = (
            x_b.dtype == jnp.float32
            and block > 0
            and (platform in _TPU_PLATFORMS or force_pallas)
            and force_pallas is not False
        )
        if eligible:
            out = _pallas_substeps(
                x_b, f_b, ext_b, m_b, j_b, dt=dt, n_sub=n_sub, euler=euler,
                g=g, arm_l=arm_l, km_over_kf=km_over_kf, block=block, sub=sub,
                actuation=actuation,
                interpret=bool(force_pallas) and platform not in _TPU_PLATFORMS,
            )
        else:
            out = jax.vmap(xla_substeps)(x_b, f_b, ext_b, m_b, j_b)
        return out, True

    return integrate
