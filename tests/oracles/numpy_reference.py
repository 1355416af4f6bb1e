"""CPU oracle: NumPy implementation of the analytic dynamics + RK4.

Independent re-derivation of the reference's CasADi equations
(quadrotor.py:594-674 for the quadrotor; the canonical frictionless cart-pole
for CartPole) and its RK4 discretization (mpc_utils.py:79-101), with the same
expression ordering as the JAX engine so fixed-seed trajectories can be
compared at tight tolerance (bitwise in float64 on CPU).

The oracle takes *already-sampled* per-episode parameters and disturbance
force sequences; RNG-stream equivalence is tested separately (the engine's
RNG spec is jax.random with documented key derivations).
"""

import numpy as np


def rk4(f, x, u, dt):
    k1 = f(x, u)
    k2 = f(x + dt / 2 * k1, u)
    k3 = f(x + dt / 2 * k2, u)
    k4 = f(x + dt * k3, u)
    return x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)


# -- CartPole ---------------------------------------------------------------

def cartpole_fc(x, u, pole_length, pole_mass, cart_mass, g=9.8):
    x_dot, theta, theta_dot = x[1], x[2], x[3]
    force = u[0]
    l = pole_length / 2.0
    Mm = cart_mass + pole_mass
    ml = pole_mass * l
    sin_t, cos_t = np.sin(theta), np.cos(theta)
    temp = (force + ml * theta_dot**2 * sin_t) / Mm
    theta_dd = (g * sin_t - cos_t * temp) / (l * (4.0 / 3.0 - pole_mass * cos_t**2 / Mm))
    x_dd = temp - ml * theta_dd * cos_t / Mm
    return np.array([x_dot, x_dd, theta_dot, theta_dd], dtype=x.dtype)


def cartpole_rollout(x0, forces, dt, n_sub, pole_length, pole_mass, cart_mass):
    """forces: (T, 1) post-disturbance cart forces; returns (T+1, 4)."""
    x = np.array(x0)
    traj = [x.copy()]
    fc = lambda x_, u_: cartpole_fc(x_, u_, pole_length, pole_mass, cart_mass)
    for t in range(forces.shape[0]):
        for _ in range(n_sub):
            x = rk4(fc, x, forces[t], dt)
        traj.append(x.copy())
    return np.stack(traj)


# -- Quadrotor ---------------------------------------------------------------

KF = 3.16e-10
KM = 7.94e-12
ARM_L = 0.0397
PWM2RPM_SCALE = 0.2685
PWM2RPM_CONST = 4070.3
MIN_PWM, MAX_PWM = 20000.0, 65535.0
G = 9.8


def cmd2pwm(thrust):
    n_motor = 4 // thrust.shape[0]
    thrust = np.maximum(thrust, 0.0)
    pwm = (np.sqrt(thrust / n_motor / KF) - PWM2RPM_CONST) / PWM2RPM_SCALE
    if thrust.shape[0] == 1:
        pwm = np.repeat(pwm, 4)
    elif thrust.shape[0] == 2:
        pwm = np.concatenate([pwm, pwm[::-1]])
    return np.clip(pwm, MIN_PWM, MAX_PWM)


def pwm2rpm(pwm):
    return PWM2RPM_SCALE * pwm + PWM2RPM_CONST


def thrust_to_forces(thrust, dtype=np.float64):
    return (pwm2rpm(cmd2pwm(thrust.astype(dtype))) ** 2) * KF


def quad1d_fc(x, forces, mass, ext_fz=0.0):
    T = np.sum(forces)
    return np.array([x[1], T / mass - G + ext_fz / mass], dtype=x.dtype)


def quad2d_fc(x, forces, mass, iyy, ext_fx=0.0, ext_fz=0.0):
    T1 = forces[0] + forces[3]
    T2 = forces[1] + forces[2]
    theta = x[4]
    x_dd = np.sin(theta) * (T1 + T2) / mass + ext_fx / mass
    z_dd = np.cos(theta) * (T1 + T2) / mass - G + ext_fz / mass
    theta_dd = ARM_L * (T2 - T1) / iyy / np.sqrt(2.0)
    return np.array([x[1], x_dd, x[3], z_dd, x[5], theta_dd], dtype=x.dtype)


def _rot_xyz(phi, theta, psi):
    """Analytic Rz(psi) @ Ry(theta) @ Rx(phi), same expression order as the
    engine (ops/rotations.py:rot_xyz)."""
    cphi, sphi = np.cos(phi), np.sin(phi)
    cth, sth = np.cos(theta), np.sin(theta)
    cpsi, spsi = np.cos(psi), np.sin(psi)
    return np.array(
        [
            [cpsi * cth, cpsi * sth * sphi - spsi * cphi, cpsi * sth * cphi + spsi * sphi],
            [spsi * cth, spsi * sth * sphi + cpsi * cphi, spsi * sth * cphi - cpsi * sphi],
            [-sth, cth * sphi, cth * cphi],
        ]
    )


def _body_z_world(phi, theta, psi):
    cphi, sphi = np.cos(phi), np.sin(phi)
    cth, sth = np.cos(theta), np.sin(theta)
    cpsi, spsi = np.cos(psi), np.sin(psi)
    return np.array(
        [
            cpsi * sth * cphi + spsi * sphi,
            spsi * sth * cphi - cpsi * sphi,
            cth * cphi,
        ]
    )


def quad3d_fc(x, forces, mass, j_diag, ext_f=np.zeros(3)):
    phi, theta, psi = x[6], x[7], x[8]
    pqr = x[9:12]
    f1, f2, f3, f4 = forces
    T = f1 + f2 + f3 + f4
    zb = _body_z_world(phi, theta, psi)
    gvec = np.array([0.0, 0.0, G])
    pos_dd = zb * T / mass - gvec + ext_f / mass
    l_sq2 = ARM_L / np.sqrt(2.0)
    Mb = np.array(
        [
            l_sq2 * (f1 + f2 - f3 - f4),
            l_sq2 * (-f1 + f2 + f3 - f4),
            (KM / KF) * (f1 - f2 + f3 - f4),
        ]
    )
    Jw = j_diag * pqr
    gyro = np.cross(pqr, Jw)
    rate_dot = (Mb - gyro) / j_diag
    sphi, cphi = np.sin(phi), np.cos(phi)
    tth, cth = np.tan(theta), np.cos(theta)
    p_, q_, r_ = pqr
    ang_dot = np.array(
        [
            p_ + sphi * tth * q_ + cphi * tth * r_,
            cphi * q_ - sphi * r_,
            sphi / cth * q_ + cphi / cth * r_,
        ]
    )
    out = np.empty(12, dtype=x.dtype)
    out[0], out[1] = x[1], pos_dd[0]
    out[2], out[3] = x[3], pos_dd[1]
    out[4], out[5] = x[5], pos_dd[2]
    out[6:9] = ang_dot
    out[9:12] = rate_dot
    return out


def quad_rollout(quad_type, x0, thrusts, dt, n_sub, mass, j_diag, ext_forces=None):
    """thrusts: (T, nu) post-disturbance commanded thrusts;
    ext_forces: (T, 3) world disturbance force per control step."""
    x = np.array(x0)
    traj = [x.copy()]
    T = thrusts.shape[0]
    if ext_forces is None:
        ext_forces = np.zeros((T, 3))
    for t in range(T):
        forces = thrust_to_forces(thrusts[t], dtype=x.dtype)
        if quad_type == 1:
            fc = lambda x_, u_: quad1d_fc(x_, u_, mass, ext_forces[t][2])
        elif quad_type == 2:
            fc = lambda x_, u_: quad2d_fc(
                x_, u_, mass, j_diag[1], ext_forces[t][0], ext_forces[t][2]
            )
        else:
            fc = lambda x_, u_: quad3d_fc(x_, u_, mass, j_diag, ext_forces[t])
        for _ in range(n_sub):
            x = rk4(fc, x, forces, dt)
        traj.append(x.copy())
    return np.stack(traj)
