"""SDFormat rotation utilities in JAX.

TPU-native counterpart of the reference's CasADi/NumPy rotation helpers
(reference: safe_control_gym/math_and_models/transformations.py:125-197).
All functions are batch-friendly: scalar angle inputs may carry leading batch
dimensions; outputs stack the 3x3 matrix into the trailing two axes.
"""

import jax.numpy as jnp


def rot_z(psi):
    """Rotation about Z (SDFormat convention). Returns (..., 3, 3)."""
    c, s = jnp.cos(psi), jnp.sin(psi)
    z = jnp.zeros_like(psi)
    o = jnp.ones_like(psi)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], axis=-1),
            jnp.stack([s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def rot_y(theta):
    """Rotation about Y (SDFormat convention). Returns (..., 3, 3)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    return jnp.stack(
        [
            jnp.stack([c, z, s], axis=-1),
            jnp.stack([z, o, z], axis=-1),
            jnp.stack([-s, z, c], axis=-1),
        ],
        axis=-2,
    )


def rot_x(phi):
    """Rotation about X (SDFormat convention). Returns (..., 3, 3)."""
    c, s = jnp.cos(phi), jnp.sin(phi)
    z = jnp.zeros_like(phi)
    o = jnp.ones_like(phi)
    return jnp.stack(
        [
            jnp.stack([o, z, z], axis=-1),
            jnp.stack([z, c, -s], axis=-1),
            jnp.stack([z, s, c], axis=-1),
        ],
        axis=-2,
    )


def rot_xyz(phi, theta, psi):
    """Extrinsic X-Y-Z Euler rotation (body->world), SDFormat convention.

    Matches the reference's ``csRotXYZ`` (transformations.py:168-182),
    R = Rz(psi) @ Ry(theta) @ Rx(phi), composed *analytically*: on TPU, f32
    matmuls default to bf16 passes, so forming the product with two 3x3
    matmuls loses ~3 decimal digits; the closed-form entries keep full f32/f64
    precision and skip the matmuls entirely.
    """
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    cth, sth = jnp.cos(theta), jnp.sin(theta)
    cpsi, spsi = jnp.cos(psi), jnp.sin(psi)
    return jnp.stack(
        [
            jnp.stack(
                [cpsi * cth, cpsi * sth * sphi - spsi * cphi,
                 cpsi * sth * cphi + spsi * sphi], axis=-1
            ),
            jnp.stack(
                [spsi * cth, spsi * sth * sphi + cpsi * cphi,
                 spsi * sth * cphi - cpsi * sphi], axis=-1
            ),
            jnp.stack([-sth, cth * sphi, cth * cphi], axis=-1),
        ],
        axis=-2,
    )


def body_z_world(phi, theta, psi):
    """Third column of rot_xyz: the body z-axis in world frame — the thrust
    direction.  Avoids forming the full matrix in the hot dynamics path."""
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    cth, sth = jnp.cos(theta), jnp.sin(theta)
    cpsi, spsi = jnp.cos(psi), jnp.sin(psi)
    return jnp.stack(
        [
            cpsi * sth * cphi + spsi * sphi,
            spsi * sth * cphi - cpsi * sphi,
            cth * cphi,
        ],
        axis=-1,
    )


def euler_jacobian(phi, theta):
    """Matrix mapping body rates (p, q, r) to Euler-angle rates.

    Reference uses this inside the 3D quadrotor symbolic dynamics
    (quadrotor.py:671-673).  Returns (..., 3, 3).
    """
    sphi, cphi = jnp.sin(phi), jnp.cos(phi)
    tth = jnp.tan(theta)
    cth = jnp.cos(theta)
    z = jnp.zeros_like(phi)
    o = jnp.ones_like(phi)
    return jnp.stack(
        [
            jnp.stack([o, sphi * tth, cphi * tth], axis=-1),
            jnp.stack([z, cphi, -sphi], axis=-1),
            jnp.stack([z, sphi / cth, cphi / cth], axis=-1),
        ],
        axis=-2,
    )


def unit_vector(v, axis=-1, eps=0.0):
    """Normalize ``v`` along ``axis`` (reference transformations.py:10-49)."""
    n = jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=True))
    return v / (n + eps)


def projection_matrix(point, normal):
    """4x4 orthogonal projection onto the plane through ``point`` with ``normal``.

    Mirrors the orthogonal branch of the reference's ``projection_matrix``
    (transformations.py:52-105), used to lift planar reference trajectories
    into 3D.  Host-side (env build time) — float64 NumPy.
    """
    import numpy as np

    point = np.asarray(point, dtype=np.float64)[:3]
    normal = np.asarray(normal, dtype=np.float64)[:3]
    normal = normal / np.linalg.norm(normal)
    M = np.eye(4)
    M[:3, :3] -= np.outer(normal, normal)
    M[:3, 3] = np.dot(point, normal) * normal
    return M


def transform_trajectory(pos, vel, point, normal):
    """Project a planar (T,3) trajectory onto an arbitrary plane in 3D.

    Mirrors reference transformations.py:107-123 exactly: positions use the
    affine part, velocities are multiplied by the same augmented matrix.
    Host-side (env build time) — float64 NumPy.
    """
    import numpy as np

    M = projection_matrix(point, normal)
    pos = np.asarray(pos)
    vel = np.asarray(vel)
    aug_pos = np.concatenate([pos, np.ones((pos.shape[0], 1))], -1)
    aug_vel = np.concatenate([vel, np.ones((vel.shape[0], 1))], -1)
    return (aug_pos @ M.T)[:, :3], (aug_vel @ M.T)[:, :3]
