"""Crazyflie firmware software-in-the-loop emulator.

TPU-native counterpart of the reference's FirmwareWrapper
(safe_control_gym/controllers/firmware/firmware_wrapper.py), which drives the
SWIG-wrapped C firmware (pycffirmware) at 500 Hz inside ``step()``.  Here the
firmware pieces are reimplemented (no bindings):

  * Mellinger controller math + power distribution — controllers/mellinger.py
    (numerics from the public Crazyflie firmware);
  * 2-pole Butterworth LPFs on gyro/acc at 80/30 Hz
    (firmware_wrapper.py:133-138, lpf2pInit/lpf2pApply semantics);
  * finite-difference sensor emulation (rates and acc from consecutive env
    states, firmware_wrapper.py:245-268);
  * the high-level command queue: sendFullStateCmd / sendTakeoffCmd /
    sendLandCmd / sendGotoCmd / sendStopCmd / sendNotifySetpointStopCmd
    (firmware_wrapper.py:483-663), with quintic (minimum-jerk) setpoint
    interpolation standing in for the firmware's 7th-order planner;
  * tick-gated controller cadence and tumble-detection motor kill
    (firmware_wrapper.py:413-466);
  * motor-order remap of the produced action ([3, 2, 1, 0],
    firmware_wrapper.py:277-278).

The inner 500 Hz loop steps the analytic env (jitted); the command API stays
host-side, matching how user controllers interact with it
(competition/getting_started.py:162-202).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.mellinger import (
    KD_OMEGA_RP,
    MellingerState,
    mellinger_control,
    power_distribution,
)
from safe_control_gym_tpu.envs.quadrotor import KF, MAX_PWM, MIN_PWM, PWM2RPM_CONST, PWM2RPM_SCALE


class Lpf2p:
    """2-pole Butterworth low-pass (firmware filter.c lpf2p)."""

    def __init__(self, sample_freq: float, cutoff_freq: float):
        fr = sample_freq / cutoff_freq
        ohm = math.tan(math.pi / fr)
        c = 1.0 + 2.0 * math.cos(math.pi / 4.0) * ohm + ohm * ohm
        self.b0 = ohm * ohm / c
        self.b1 = 2.0 * self.b0
        self.b2 = self.b0
        self.a1 = 2.0 * (ohm * ohm - 1.0) / c
        self.a2 = (1.0 - 2.0 * math.cos(math.pi / 4.0) * ohm + ohm * ohm) / c
        self.d1 = 0.0
        self.d2 = 0.0

    def apply(self, sample: float) -> float:
        d0 = sample - self.d1 * self.a1 - self.d2 * self.a2
        out = d0 * self.b0 + self.d1 * self.b1 + self.d2 * self.b2
        self.d2, self.d1 = self.d1, d0
        return out


def _poly7_nojerk(T, x0, dx0, ddx0, xf, dxf, ddxf):
    """7th-order polynomial coefficients (ascending), matching the firmware
    planner's ``poly7_nojerk`` (crazyflie-firmware pptraj.c, reached via
    crtpCommanderHighLevelTakeoff/Land/GoTo -> plan_* ->
    piecewise_plan_7th_order_no_jerk): boundary conditions
    p(0)=x0, p'(0)=dx0, p''(0)=ddx0, p'''(0)=0 and the same at T with
    (xf, dxf, ddxf, 0).  Solved as the 8x8 linear system directly (exact,
    no transcribed closed forms)."""
    T = max(float(T), 1e-6)
    A = np.zeros((8, 8))
    # p(0), p'(0), p''(0), p'''(0)
    A[0, 0] = 1.0
    A[1, 1] = 1.0
    A[2, 2] = 2.0
    A[3, 3] = 6.0
    powers = T ** np.arange(8, dtype=float)
    k = np.arange(8, dtype=float)
    A[4] = powers  # p(T)
    A[5, 1:] = k[1:] * powers[:-1]  # p'(T)
    A[6, 2:] = k[2:] * (k[2:] - 1) * powers[:-2]  # p''(T)
    A[7, 3:] = k[3:] * (k[3:] - 1) * (k[3:] - 2) * powers[:-3]  # p'''(T)
    b = np.array([x0, dx0, ddx0, 0.0, xf, dxf, ddxf, 0.0])
    return np.linalg.solve(A, b)


def _poly_eval(c, t):
    """(pos, vel, acc) of an ascending-coefficient polynomial at t."""
    k = np.arange(len(c), dtype=float)
    tp = t ** k
    pos = float(np.dot(c, tp))
    vel = float(np.dot(c[1:] * k[1:], tp[:-1]))
    acc = float(np.dot(c[2:] * k[2:] * (k[2:] - 1), tp[:-2]))
    return pos, vel, acc


class FirmwareWrapper:
    """Reference-compatible SITL wrapper (reset/step + send*Cmd API)."""

    # Configurable hardware-response delays (reference firmware_wrapper.py:14-16,
    # 129-131): firmware loops between commanding an action and the motors
    # responding (ACTION_DELAY), and between a motion and the sensors
    # registering it (SENSOR_DELAY).  STATE_DELAY is unsupported upstream too.
    ACTION_DELAY = 0
    SENSOR_DELAY = 0
    STATE_DELAY = 0
    GYRO_LPF_CUTOFF_FREQ = 80.0
    ACCEL_LPF_CUTOFF_FREQ = 30.0

    def __init__(self, env_func, firmware_freq: int = 500, ctrl_freq: int = 25,
                 verbose=False, action_delay: int = None, sensor_delay: int = None,
                 fused: bool = False, kd_omega_rp: float = None, **kwargs):
        if action_delay is not None:
            self.ACTION_DELAY = int(action_delay)
        if sensor_delay is not None:
            self.SENSOR_DELAY = int(sensor_delay)
        if self.STATE_DELAY:
            raise NotImplementedError("State delay is not implemented. Leave at 0.")
        self.env = env_func() if callable(env_func) else env_func
        assert self.env.ctrl_freq == firmware_freq, (
            "the wrapped env must run at the firmware frequency "
            "(the reference rewrites ctrl_freq to 500 Hz, getting_started.py:69-83)"
        )
        self.firmware_freq = firmware_freq
        self.ctrl_freq = ctrl_freq
        self.firmware_dt = 1.0 / firmware_freq
        self.ctrl_dt = 1.0 / ctrl_freq
        self.verbose = verbose
        self._env_step = jax.jit(self.env.step)
        self._env_reset = jax.jit(self.env.reset)
        # Fused mode scans the whole 500 Hz tick block between user commands
        # on-device (one dispatch per 25-30 Hz control step) instead of one
        # dispatch per firmware tick.  The reference's full competition run
        # finishes "in less than a minute" (reference README.md:16) because
        # its C firmware loop is host-native; the per-tick dispatch here cost
        # ~6.7 ms over the device tunnel, ~0.1x realtime per episode.  The
        # command API, gating and planner stay host-side in f64 (exact
        # semantics); everything dispatched per tick moves into one lax.scan.
        self.fused = bool(fused)
        # Stock attitude-rate-derivative gain unless overridden: the SITL's
        # finite-difference gyro makes the stock value destabilizing (see
        # mellinger.py note); the competition loop passes 0.
        self.kd_omega_rp = KD_OMEGA_RP if kd_omega_rp is None else float(kd_omega_rp)
        self._fused_step = None  # built lazily at first reset (needs shapes)

    # -- lifecycle -------------------------------------------------------------
    def reset(self, seed: int = 0):
        self.ms = MellingerState.create()
        self.tick = 0
        self.pwms = np.zeros(4)
        self.action = np.zeros(4)
        self.command_queue: list = []
        self.tumble_counter = 0
        self._error = False
        # Delay ring buffers (firmware_wrapper.py:129-131).
        self.action_history = [np.zeros(4) for _ in range(self.ACTION_DELAY)]
        self.sensor_history = [
            [np.zeros(3), np.zeros(3)] for _ in range(self.SENSOR_DELAY)
        ]
        self.full_state_cmd_override = True  # until a HL command is sent
        self.setpoint = {
            "pos": np.zeros(3), "vel": np.zeros(3), "acc": np.zeros(3),
            "yaw": 0.0, "omega": np.zeros(3),
        }
        self._plan = None  # (kind, t0, duration, p0, p1, yaw0, yaw1)
        # NOTE: the reference initializes acclpf with GYRO_LPF_CUTOFF_FREQ and
        # gyrolpf with ACCEL_LPF_CUTOFF_FREQ — the cutoffs are swapped
        # relative to their names (firmware_wrapper.py:137-138).  The swap is
        # load-bearing: the 30 Hz gyro LPF is what keeps the stock
        # KD_OMEGA_RP=200 derivative term stable.  Reproduced exactly.
        self.acclpf = [Lpf2p(self.firmware_freq, self.GYRO_LPF_CUTOFF_FREQ) for _ in range(3)]
        self.gyrolpf = [Lpf2p(self.firmware_freq, self.ACCEL_LPF_CUTOFF_FREQ) for _ in range(3)]
        self.last_pos_pid_call = 0.0
        self.last_att_pid_call = 0.0
        self.env_state, obs, info = self._env_reset(jax.random.key(seed))
        o = np.asarray(obs)
        self.prev_vel = np.array([o[1], o[3], o[5]])
        self.prev_rpy = np.array([o[6], o[7], o[8]])
        self.setpoint["pos"] = np.array([o[0], o[2], o[4]])
        self.states = []
        if self.fused:
            if self._fused_step is None:
                self._build_fused()
            f32 = jnp.float32
            self._carry = dict(
                env_state=self.env_state,
                obs=jnp.asarray(obs, f32),
                action=jnp.zeros(4, f32),
                ms=MellingerState.create(),
                gd1=jnp.zeros(3, f32), gd2=jnp.zeros(3, f32),
                ad1=jnp.zeros(3, f32), ad2=jnp.zeros(3, f32),
                prev_vel=jnp.asarray(self.prev_vel, f32),
                prev_rpy=jnp.asarray(self.prev_rpy, f32),
                tumble=jnp.zeros((), jnp.int32),
                pwms=jnp.zeros(4, f32),
                ahist=jnp.zeros((self.ACTION_DELAY, 4), f32),
                shist=jnp.zeros((self.SENSOR_DELAY, 2, 3), f32),
                error=jnp.zeros((), bool),
                done=jnp.zeros((), bool),
                reward=jnp.zeros((), f32),
                executed=jnp.zeros((), jnp.int32),
                info_vec=jnp.zeros((self._info_len,), f32),
                gate_m=jnp.full((self._n_gates,), jnp.inf, f32),
                obst_m=jnp.full((self._n_obst,), jnp.inf, f32),
            )
            self.block_clearance = None
        return obs, info

    # -- fused on-device tick loop ----------------------------------------------
    def _build_fused(self):
        """Compile the per-control-step firmware tick block as one lax.scan.

        Replaces the reference's host-side 500 Hz while loop
        (firmware_wrapper.py:208-295) with a single device dispatch per
        control decision: env substep + finite-difference sensors + LPFs +
        tumble kill + Mellinger tick + X-mixing + delay buffers all run
        in-kernel; the command queue, controller-cadence gating and the HL
        planner remain host-side (computed in f64, fed in as per-tick arrays,
        so gating/setpoint semantics are bit-identical to the host loop)."""
        from safe_control_gym_tpu.envs.gates import gate_frame_margin, obstacle_margin

        env_step = self.env.step
        fdt = self.firmware_dt
        k_act, k_sen = self.ACTION_DELAY, self.SENSOR_DELAY
        # Clearance diagnostics (tick-rate, in-kernel): running min signed
        # margin to every gate frame / obstacle over the control block, for
        # the robustness sweeps (a 25 Hz sample can miss an 8 cm excursion
        # at race speed; the collision check itself runs per tick anyway).
        n_gates = len(getattr(self.env.config, "gates", None) or [])
        n_obst = len(getattr(self.env.config, "obstacles", None) or [])
        self._n_gates, self._n_obst = n_gates, n_obst
        # NumPy closure constants (NOT device arrays): each device array
        # captured by a traced function costs a device_get at lowering time —
        # minutes over a remote tunnel (see quadrotor.py _weights_vec note).
        a_low = np.asarray(self.env.spaces.action_low, np.float32)
        a_high = np.asarray(self.env.spaces.action_high, np.float32)
        remap = np.asarray([3, 2, 1, 0])
        kdo = np.float32(self.kd_omega_rp)
        gl, al = self.gyrolpf[0], self.acclpf[0]
        g_coef = np.asarray([gl.b0, gl.b1, gl.b2, gl.a1, gl.a2], np.float32)
        a_coef = np.asarray([al.b0, al.b1, al.b2, al.a1, al.a2], np.float32)

        # Fixed info packing spec: the env step's info pytree is flattened
        # into one f32 vector inside the kernel so the host fetches a single
        # buffer per control step (the tunnel makes per-leaf fetches ~ms each).
        out_sd = jax.eval_shape(
            env_step, self.env_state, jnp.zeros(4, jnp.float32)
        )
        leaves, treedef = jax.tree_util.tree_flatten(out_sd[4])
        self._info_spec = [(l.shape, l.dtype) for l in leaves]
        self._info_treedef = treedef
        self._info_len = int(sum(int(np.prod(l.shape)) for l in leaves))
        obs_len = int(np.prod(out_sd[1].shape))
        self._obs_len = obs_len

        def pack_info(info):
            ls = jax.tree_util.tree_leaves(info)
            if not ls:
                return jnp.zeros((0,), jnp.float32)
            return jnp.concatenate(
                [jnp.reshape(l, (-1,)).astype(jnp.float32) for l in ls]
            )

        def tick(carry, xs):
            def live(c):
                es, obs, r, d, info = env_step(c["env_state"], c["action"])
                cur_pos = jnp.stack([obs[0], obs[2], obs[4]])
                cur_vel = jnp.stack([obs[1], obs[3], obs[5]])
                cur_rpy = obs[6:9]
                # Finite-difference sensors (firmware_wrapper.py:248-268).
                rates = (cur_rpy - c["prev_rpy"]) / fdt
                acc = (cur_vel - c["prev_vel"]) / fdt / 9.8 + jnp.asarray(
                    [0.0, 0.0, 1.0], obs.dtype
                )
                if k_sen:
                    acc_meas, rates_meas = c["shist"][0, 0], c["shist"][0, 1]
                    shist = jnp.concatenate(
                        [c["shist"][1:], jnp.stack([acc, rates])[None]], 0
                    )
                else:
                    acc_meas, rates_meas = acc, rates
                    shist = c["shist"]
                # 2-pole LPFs; per the reference, the gyro bank carries the
                # ACCEL cutoff and vice versa (firmware_wrapper.py:137-138).
                gd0 = rates_meas - c["gd1"] * g_coef[3] - c["gd2"] * g_coef[4]
                gyro = gd0 * g_coef[0] + c["gd1"] * g_coef[1] + c["gd2"] * g_coef[2]
                gd1, gd2 = gd0, c["gd1"]
                ad0 = acc_meas - c["ad1"] * a_coef[3] - c["ad2"] * a_coef[4]
                ad1, ad2 = ad0, c["ad1"]
                # Tumble kill on the raw world acc (firmware_wrapper.py:421-431).
                tumble = jnp.where(acc[2] < -0.5, c["tumble"] + 1, 0)
                killed = tumble >= 30
                error = c["error"] | killed
                pwms = jnp.where(killed, jnp.zeros(4, jnp.float32), c["pwms"])

                def do_ctrl(args):
                    pw, ms = args
                    control, ms2 = mellinger_control(
                        ms, fdt, cur_pos, cur_vel, cur_rpy, gyro,
                        xs["sp_pos"], xs["sp_vel"], xs["sp_acc"],
                        xs["sp_yaw"], xs["sp_omega"],
                        kd_omega_rp=kdo,
                    )
                    return power_distribution(control).astype(jnp.float32), ms2

                pwms, ms = jax.lax.cond(
                    xs["run_ctrl"] & ~error, do_ctrl, lambda a: a, (pwms, c["ms"])
                )
                rpm = PWM2RPM_SCALE * jnp.clip(pwms, MIN_PWM, MAX_PWM) + PWM2RPM_CONST
                new_action = (KF * rpm**2)[remap]
                new_action = jnp.clip(new_action, a_low, a_high)
                if k_act:
                    delayed = c["ahist"][0]
                    ahist = jnp.concatenate([c["ahist"][1:], new_action[None]], 0)
                    new_action = delayed
                else:
                    ahist = c["ahist"]
                new_action = jnp.where(error, jnp.zeros(4, jnp.float32), new_action)
                d = d | error
                if n_gates or n_obst:
                    true_pos = jnp.stack([es.x[0], es.x[2], es.x[4]])
                gate_m = c["gate_m"]
                if n_gates:
                    gate_m = jnp.minimum(
                        gate_m,
                        gate_frame_margin(
                            true_pos, es.gates_eff[:, :2], es.gates_eff[:, 2],
                            es.gates_eff[:, 3],
                        ),
                    )
                obst_m = c["obst_m"]
                if n_obst:
                    obst_m = jnp.minimum(
                        obst_m, obstacle_margin(true_pos, es.obstacles_eff)
                    )
                return dict(
                    env_state=es, obs=obs.astype(jnp.float32),
                    gate_m=gate_m, obst_m=obst_m,
                    action=new_action.astype(jnp.float32), ms=ms,
                    gd1=gd1, gd2=gd2, ad1=ad1, ad2=ad2,
                    prev_vel=cur_vel, prev_rpy=cur_rpy, tumble=tumble,
                    pwms=pwms, ahist=ahist, shist=shist,
                    error=error, done=d, reward=r.astype(jnp.float32),
                    executed=c["executed"] + 1, info_vec=pack_info(info),
                )

            return jax.lax.cond(carry["done"], lambda c: c, live, carry), None

        def fused(carry, xs):
            carry, _ = jax.lax.scan(tick, carry, xs)
            out_vec = jnp.concatenate([
                carry["obs"],
                carry["action"],
                carry["pwms"],
                jnp.stack([
                    carry["reward"],
                    carry["done"].astype(jnp.float32),
                    carry["error"].astype(jnp.float32),
                    carry["executed"].astype(jnp.float32),
                ]),
                carry["info_vec"],
                carry["gate_m"],
                carry["obst_m"],
            ])
            return carry, out_vec

        self._fused_step = jax.jit(fused)

    def _unpack_info(self, vec):
        """info f32 vector -> host dict with original shapes/dtypes."""
        out_leaves = []
        i = 0
        for shape, dtype in self._info_spec:
            n = int(np.prod(shape))
            chunk = vec[i:i + n].reshape(shape)
            if np.issubdtype(dtype, np.bool_):
                chunk = chunk > 0.5
            elif np.issubdtype(dtype, np.integer):
                chunk = np.round(chunk).astype(dtype)
            else:
                chunk = chunk.astype(dtype)
            out_leaves.append(chunk[()] if shape == () else chunk)
            i += n
        return jax.tree_util.tree_unflatten(self._info_treedef, out_leaves)

    def _setpoints_for(self, ticks):
        """Per-tick setpoint arrays, f64 host math identical to
        _update_setpoint (the plan is fixed for the duration of one control
        step: the command queue pops at most one command per step call)."""
        n = len(ticks)
        if self.full_state_cmd_override or self._plan is None:
            sp = self.setpoint
            return dict(
                pos=np.tile(np.asarray(sp["pos"], float), (n, 1)),
                vel=np.tile(np.asarray(sp["vel"], float), (n, 1)),
                acc=np.tile(np.asarray(sp["acc"], float), (n, 1)),
                yaw=np.full(n, float(sp["yaw"])),
                omega=np.tile(np.asarray(sp["omega"], float), (n, 1)),
            ), False
        kind, t0, duration, coeffs, yaw_c = self._plan
        pos = np.zeros((n, 3)); vel = np.zeros((n, 3)); acc = np.zeros((n, 3))
        yaw = np.zeros(n); om = np.zeros((n, 3))
        for j, k in enumerate(ticks):
            t = k / self.firmware_freq
            tau = float(np.clip(t - t0, 0.0, duration))
            pva = np.array([_poly_eval(coeffs[i], tau) for i in range(3)])
            yw, yr, _ = _poly_eval(yaw_c, tau)
            if t - t0 >= duration:
                pva[:, 1:] = 0.0
                yr = 0.0
            pos[j], vel[j], acc[j] = pva[:, 0], pva[:, 1], pva[:, 2]
            yaw[j] = yw
            om[j] = [0.0, 0.0, yr]
        return dict(pos=pos, vel=vel, acc=acc, yaw=yaw, omega=om), True

    def _step_fused(self, sim_time: float, action):
        self._process_command_queue(sim_time)
        # Tick count via the exact host while-condition (f64 comparisons).
        ticks = []
        k = self.tick
        while k / self.firmware_freq < sim_time + self.ctrl_dt:
            ticks.append(k)
            k += 1
        n = len(ticks)
        if n == 0:
            return None, 0.0, False, {}, np.asarray(action, np.float32)
        # Controller cadence gating, exact f64 host semantics
        # (firmware_wrapper.py:433-446).
        run_ctrl = np.zeros(n, bool)
        la, lp = self.last_att_pid_call, self.last_pos_pid_call
        gate_after = []
        for j, kk in enumerate(ticks):
            ct = kk / self.firmware_freq
            if ct - la > 0.002:
                run_ctrl[j] = True
                la = ct
                if ct - lp > 0.01:
                    lp = ct
            gate_after.append((la, lp))
        sp_seq, plan_active = self._setpoints_for(ticks)
        f32 = jnp.float32
        carry = dict(
            self._carry,
            action=jnp.asarray(np.asarray(action, np.float32).reshape(4)),
            error=jnp.asarray(bool(self._error)),
            pwms=jnp.asarray(np.asarray(self.pwms, np.float32)),
            done=jnp.zeros((), bool),
            reward=jnp.zeros((), f32),
            executed=jnp.zeros((), jnp.int32),
            info_vec=jnp.zeros((self._info_len,), f32),
            gate_m=jnp.full((self._n_gates,), jnp.inf, f32),
            obst_m=jnp.full((self._n_obst,), jnp.inf, f32),
        )
        xs = dict(
            run_ctrl=jnp.asarray(run_ctrl),
            sp_pos=jnp.asarray(sp_seq["pos"], f32),
            sp_vel=jnp.asarray(sp_seq["vel"], f32),
            sp_acc=jnp.asarray(sp_seq["acc"], f32),
            sp_yaw=jnp.asarray(sp_seq["yaw"], f32),
            sp_omega=jnp.asarray(sp_seq["omega"], f32),
        )
        self._carry, out_vec = self._fused_step(carry, xs)
        out = np.asarray(jax.device_get(out_vec))
        ol = self._obs_len
        obs = out[:ol]
        action_out = out[ol:ol + 4].astype(np.float64)
        self.pwms = out[ol + 4:ol + 8].astype(np.float64)
        reward = float(out[ol + 8])
        done = bool(out[ol + 9] > 0.5)
        self._error = bool(out[ol + 10] > 0.5)
        executed = int(round(out[ol + 11]))
        tail = out[ol + 12:]
        info = self._unpack_info(tail[:self._info_len])
        # Tick-rate clearance minima over this control block (diagnostics).
        self.block_clearance = {
            "gates": tail[self._info_len:self._info_len + self._n_gates].copy(),
            "obstacles": tail[self._info_len + self._n_gates:].copy(),
        }
        self.tick += executed
        self.last_att_pid_call, self.last_pos_pid_call = gate_after[executed - 1]
        if plan_active:
            j = executed - 1
            self.setpoint = {
                "pos": sp_seq["pos"][j], "vel": sp_seq["vel"][j],
                "acc": sp_seq["acc"][j], "yaw": float(sp_seq["yaw"][j]),
                "omega": sp_seq["omega"][j],
            }
        self.action = action_out
        self.env_state = self._carry["env_state"]
        return obs, reward, done, info, action_out

    def close(self):
        pass

    # -- main loop (firmware_wrapper.py:208-295) --------------------------------
    def step(self, sim_time: float, action):
        """One control-period block of 500 Hz firmware loops.

        Fused mode (default): a single on-device lax.scan dispatch.
        Host mode (``fused=False``): the original per-tick loop, kept as the
        semantics oracle (tests/test_firmware.py pins fused == host)."""
        if self.fused:
            return self._step_fused(sim_time, action)
        return self._step_host(sim_time, action)

    def _step_host(self, sim_time: float, action):
        self._process_command_queue(sim_time)
        obs = reward = done = info = None
        action = np.asarray(action, dtype=np.float32)
        while self.tick / self.firmware_freq < sim_time + self.ctrl_dt:
            self.env_state, obs_j, reward, done, info = self._env_step(
                self.env_state, jnp.asarray(action)
            )
            obs = np.asarray(obs_j)
            cur_pos = np.array([obs[0], obs[2], obs[4]])
            cur_vel = np.array([obs[1], obs[3], obs[5]])
            cur_rpy = np.array([obs[6], obs[7], obs[8]])
            # Finite-difference sensors (firmware_wrapper.py:248-268).
            rates = (cur_rpy - self.prev_rpy) / self.firmware_dt
            self.prev_rpy = cur_rpy
            acc = (cur_vel - self.prev_vel) / self.firmware_dt / 9.8 + np.array([0, 0, 1.0])
            self.prev_vel = cur_vel
            # Sensor delay (firmware_wrapper.py:264-268): the controller sees
            # the measurement from SENSOR_DELAY loops ago; LPFs apply at
            # sensorData-update time, i.e. on the delayed sample.
            if self.SENSOR_DELAY:
                acc_meas, rates_meas = self.sensor_history[0]
                self.sensor_history = self.sensor_history[1:] + [[acc, rates]]
            else:
                acc_meas, rates_meas = acc, rates
            gyro = np.array([self.gyrolpf[i].apply(rates_meas[i]) for i in range(3)])
            acc_f = np.array([self.acclpf[i].apply(acc_meas[i]) for i in range(3)])

            # Tumble detection (firmware_wrapper.py:421-431) — the reference
            # checks state.acc.z, the UNFILTERED undelayed world acc.
            if acc[2] < -0.5:
                self.tumble_counter += 1
            else:
                self.tumble_counter = 0
            if self.tumble_counter >= 30:
                self.pwms = np.zeros(4)
                self._error = True

            # Setpoint update from the active HL plan.
            self._update_setpoint(self.tick / self.firmware_freq)

            # Controller tick gating (firmware_wrapper.py:433-446): attitude
            # PID when >2 ms since the last call, position PID when >10 ms;
            # controllerMellinger executes on the attitude cadence
            # (RATE_DO_EXECUTE(ATTITUDE_RATE)), PWMs zero-order-hold between
            # executions.  With cur_time = tick/500 the float comparison
            # fires every OTHER loop — the reference's effective 250 Hz.
            cur_time = self.tick / self.firmware_freq
            if cur_time - self.last_att_pid_call > 0.002:
                run_ctrl = True
                self.last_att_pid_call = cur_time
                if cur_time - self.last_pos_pid_call > 0.01:
                    self.last_pos_pid_call = cur_time
            else:
                run_ctrl = False
            if not self._error and run_ctrl:
                control, self.ms = mellinger_control(
                    self.ms,
                    self.firmware_dt,
                    jnp.asarray(cur_pos, jnp.float32),
                    jnp.asarray(cur_vel, jnp.float32),
                    jnp.asarray(cur_rpy, jnp.float32),
                    jnp.asarray(gyro, jnp.float32),
                    jnp.asarray(self.setpoint["pos"], jnp.float32),
                    jnp.asarray(self.setpoint["vel"], jnp.float32),
                    jnp.asarray(self.setpoint["acc"], jnp.float32),
                    jnp.asarray(self.setpoint["yaw"], jnp.float32),
                    jnp.asarray(self.setpoint["omega"], jnp.float32),
                    kd_omega_rp=jnp.asarray(self.kd_omega_rp, jnp.float32),
                )
                self.pwms = np.asarray(power_distribution(control))

            # PWM -> per-motor forces, firmware motor order [3, 2, 1, 0]
            # (firmware_wrapper.py:277-278).
            rpm = PWM2RPM_SCALE * np.clip(self.pwms, MIN_PWM, MAX_PWM) + PWM2RPM_CONST
            new_action = (KF * rpm**2)[[3, 2, 1, 0]]
            # Keep the emitted thrusts inside the env's physical input bounds:
            # at the PWM ceiling the f64 thrust equals the bound exactly and
            # the env's f32 cast can tip it ~1e-7 over, tripping the default
            # input constraint (done_on_violation ends the episode).  Same
            # guard as the sim-only PID path (competition/controller.py
            # _clip_forces).
            new_action = np.clip(
                new_action,
                np.asarray(self.env.spaces.action_low, np.float32),
                np.asarray(self.env.spaces.action_high, np.float32),
            )
            # Action delay (firmware_wrapper.py:283-287): motors respond to
            # the command issued ACTION_DELAY loops ago.
            if self.ACTION_DELAY:
                delayed = self.action_history[0]
                self.action_history = self.action_history[1:] + [new_action]
                new_action = delayed
            if self._error:
                new_action = np.zeros(4)
                done = True
            action = new_action
            self.action = action
            self.tick += 1
            if bool(done):
                break
        return obs, float(reward), bool(done), info, action

    # -- high-level command API (firmware_wrapper.py:483-663) -------------------
    def sendFullStateCmd(self, pos, vel, acc, yaw, rpy_rate, timestep):
        self.command_queue.append(("_fullState", (np.asarray(pos, float), np.asarray(vel, float), np.asarray(acc, float), float(yaw), np.asarray(rpy_rate, float))))

    def sendTakeoffCmd(self, height, duration):
        self.command_queue.append(("_takeoff", (float(height), float(duration))))

    def sendTakeoffYawCmd(self, height, duration, yaw):
        self.command_queue.append(("_takeoff", (float(height), float(duration), float(yaw))))

    def sendLandCmd(self, height, duration):
        self.command_queue.append(("_land", (float(height), float(duration))))

    def sendLandYawCmd(self, height, duration, yaw):
        self.command_queue.append(("_land", (float(height), float(duration), float(yaw))))

    def sendGotoCmd(self, pos, yaw, duration_s, relative):
        self.command_queue.append(("_goto", (np.asarray(pos, float), float(yaw), float(duration_s), bool(relative))))

    def sendStopCmd(self):
        self.command_queue.append(("_stop", ()))

    def sendNotifySetpointStop(self, *args):
        self.command_queue.append(("_notify_stop", ()))

    def _process_command_queue(self, sim_time):
        if self.command_queue:
            cmd, args = self.command_queue.pop(0)
            self._cmd_time = sim_time
            getattr(self, cmd)(sim_time, *args)

    # -- command implementations -------------------------------------------------
    def _fullState(self, t, pos, vel, acc, yaw, rpy_rate):
        self.full_state_cmd_override = True
        self._plan = None
        self.setpoint = {"pos": pos, "vel": vel, "acc": acc, "yaw": yaw, "omega": rpy_rate}

    def _plan_poly7(self, t, duration, p1, yaw1):
        """Plan a 7th-order no-jerk move from the CURRENT setpoint state to
        (p1, yaw1) at rest — the firmware planner's plan_takeoff/plan_land/
        plan_go_to shape (crtpCommanderHighLevel* -> pptraj poly7_nojerk)."""
        p0 = np.asarray(self.setpoint["pos"], float)
        v0 = np.asarray(self.setpoint["vel"], float)
        a0 = np.asarray(self.setpoint["acc"], float)
        coeffs = np.stack([
            _poly7_nojerk(duration, p0[i], v0[i], a0[i], float(p1[i]), 0.0, 0.0)
            for i in range(3)
        ])
        yaw_c = _poly7_nojerk(duration, float(self.setpoint["yaw"]), 0.0, 0.0,
                              float(yaw1), 0.0, 0.0)
        self._plan = ("poly7", t, max(float(duration), 1e-6), coeffs, yaw_c)

    def _takeoff(self, t, height, duration, yaw=0.0):
        self.full_state_cmd_override = False
        p0 = np.asarray(self.setpoint["pos"], float)
        self._plan_poly7(t, duration, [p0[0], p0[1], height], yaw)

    def _land(self, t, height, duration, yaw=0.0):
        self.full_state_cmd_override = False
        p0 = np.asarray(self.setpoint["pos"], float)
        self._plan_poly7(t, duration, [p0[0], p0[1], height], yaw)

    def _goto(self, t, pos, yaw, duration, relative):
        self.full_state_cmd_override = False
        p0 = np.asarray(self.setpoint["pos"], float)
        p1 = p0 + np.asarray(pos, float) if relative else np.asarray(pos, float)
        self._plan_poly7(t, duration, p1, yaw)

    def _stop(self, t):
        self.full_state_cmd_override = False
        self._plan = None
        self.pwms = np.zeros(4)
        self._error = True  # motors off

    def _notify_stop(self, t):
        self.full_state_cmd_override = False

    def _update_setpoint(self, t):
        if self.full_state_cmd_override or self._plan is None:
            return
        kind, t0, duration, coeffs, yaw_c = self._plan
        tau = float(np.clip(t - t0, 0.0, duration))
        pva = np.array([_poly_eval(coeffs[i], tau) for i in range(3)])
        yaw, yaw_rate, _ = _poly_eval(yaw_c, tau)
        if t - t0 >= duration:
            # Plan finished: hold the endpoint at rest (planner's hover hold).
            pva[:, 1:] = 0.0
            yaw_rate = 0.0
        self.setpoint = {
            "pos": pva[:, 0], "vel": pva[:, 1], "acc": pva[:, 2],
            "yaw": yaw, "omega": np.array([0.0, 0.0, yaw_rate]),
        }
