"""Stage actions and sequencer for the competition flight plan.

TPU-native counterpart of reference competition/stage_sequencer.py (:29-111)
and the stage_action_*.py modules: each stage exposes ``reset()`` and
``run(global_it, stage_it, pos, vel, rpy, pqr) -> (done, Command, args)``;
the sequencer runs stages in order until each reports done.
"""

from __future__ import annotations

import numpy as np

from safe_control_gym_tpu.competition.competition_utils import Command


class StageAction:
    def reset(self):
        pass

    def run(self, global_it, stage_it, pos, vel, rpy, pqr, corrections=None):
        raise NotImplementedError


class StageActionTakeOff(StageAction):
    """Reference stage_action_take_off.py: one TAKEOFF command, wait out the
    duration."""

    def __init__(self, ctrl_freq, height=1.0, duration=2.0):
        self.ctrl_freq = ctrl_freq
        self.height = height
        self.duration = duration

    def run(self, global_it, stage_it, pos, vel, rpy, pqr, corrections=None):
        if stage_it == 0:
            return False, Command.TAKEOFF, (self.height, self.duration)
        done = stage_it >= self.duration * self.ctrl_freq
        return done, Command.NONE, ()


class StageActionLand(StageAction):
    def __init__(self, ctrl_freq, height=0.05, duration=2.0):
        self.ctrl_freq = ctrl_freq
        self.height = height
        self.duration = duration

    def run(self, global_it, stage_it, pos, vel, rpy, pqr, corrections=None):
        if stage_it == 0:
            return False, Command.LAND, (self.height, self.duration)
        done = stage_it >= self.duration * self.ctrl_freq
        return done, Command.NONE, ()


class StageActionGotoXY(StageAction):
    def __init__(self, ctrl_freq, x, y, z=None, duration=3.0):
        self.ctrl_freq = ctrl_freq
        self.target = (x, y, z)
        self.duration = duration

    def run(self, global_it, stage_it, pos, vel, rpy, pqr, corrections=None):
        if stage_it == 0:
            x, y, z = self.target
            z = pos[2] if z is None else z
            return False, Command.GOTO, ([x, y, z], 0.0, self.duration, False)
        done = stage_it >= self.duration * self.ctrl_freq
        return done, Command.NONE, ()


class StageActionSetPointStop(StageAction):
    def run(self, global_it, stage_it, pos, vel, rpy, pqr, corrections=None):
        return True, Command.NOTIFYSETPOINTSTOP, ()


class StageActionHardBrake(StageAction):
    """Full-state commands holding the current position (reference
    stage_action_hard_brake.py)."""

    def __init__(self, ctrl_freq, duration=0.5):
        self.ctrl_freq = ctrl_freq
        self.duration = duration
        self.hold = None

    def reset(self):
        self.hold = None

    def run(self, global_it, stage_it, pos, vel, rpy, pqr, corrections=None):
        if self.hold is None:
            self.hold = np.asarray(pos)
        done = stage_it >= self.duration * self.ctrl_freq
        args = (self.hold, np.zeros(3), np.zeros(3), 0.0, np.zeros(3), global_it / self.ctrl_freq)
        return done, Command.FULLSTATE, args


def _gate_correction_offset(ref_p, corrections, radius=0.8):
    """Shift a reference point by the measured gate pose corrections.

    The env reveals the exact gate pose only once the drone is in range
    (reference ek_controller_impl.py:228-291); the offset is blended in with
    a Gaussian weight centered on each gate so the track deforms locally
    instead of jumping.  Both the NEXT and the PREVIOUS target gate
    contribute: when the target advances mid-crossing, the passed gate's
    correction must persist around its frame — dropping it snapped the
    setpoint ~8 cm at the aperture and clipped the frame edge (level2,
    stock-gain tracking).
    """
    if not corrections:
        return np.zeros(3)
    off = np.zeros(3)
    for which in ("next", "prev"):
        delta = np.asarray(corrections.get(f"{which}_gate_correction", np.zeros(3)))
        if not np.any(delta):
            continue
        gate = np.asarray(corrections.get(f"{which}_gate_location", np.full(3, 99.0)))
        d = np.linalg.norm(np.asarray(ref_p) - gate)
        off = off + delta * np.exp(-0.5 * (d / radius) ** 2)
    return off


class StageActionSpline(StageAction):
    """Track the planned trajectory with FULLSTATE commands (reference
    stage_action_spline.py).  Progress integrates with a gate-adaptive
    speed: crawl through apertures, race between them."""

    def __init__(self, ctrl_freq, trajectory, speed_scale=1.0,
                 gate_centers=None, gate_slow_scale=0.3, gate_slow_radius=0.7,
                 gate_exit_radius=None):
        self.ctrl_freq = ctrl_freq
        self.traj = trajectory
        self.speed_scale = speed_scale
        self.gate_centers = gate_centers or []
        self.gate_slow_scale = gate_slow_scale
        self.gate_slow_radius = gate_slow_radius
        # Asymmetric crawl: approach slowly over gate_slow_radius (shed
        # cross-track error before the aperture), exit over the shorter
        # gate_exit_radius (the frame is behind once crossed) — symmetric
        # wide crawls cost ~2x the course time for no extra safety.
        self.gate_exit_radius = (
            gate_slow_radius * 0.45 if gate_exit_radius is None else gate_exit_radius
        )
        # Plan times at which each gate is crossed (for the signed
        # before/after decision).
        self.gate_times = []
        if self.gate_centers:
            import numpy as _np

            ts = _np.linspace(trajectory.start_time, trajectory.end_time, 400)
            ps = _np.stack([trajectory.position(t).reshape(-1)[:3] for t in ts])
            for g in self.gate_centers:
                d = _np.linalg.norm(ps - _np.asarray(g)[None], axis=-1)
                self.gate_times.append(float(ts[int(d.argmin())]))
        self.reset()

    def reset(self):
        self.ref_t = self.traj.start_time

    def run(self, global_it, stage_it, pos, vel, rpy, pqr, corrections=None):
        ref_p = self.traj.position(self.ref_t).reshape(-1)[:3]
        scale = self.speed_scale
        if self.gate_centers:
            # Continuous Gaussian blend toward the crawl speed near gates: a
            # hard radius switch steps the commanded velocity by >50%, which
            # rings the position loop through the stock Mellinger attitude
            # damping (KD_OMEGA_RP=200) and cost a gate collision.  The
            # radius is ASYMMETRIC around each gate's crossing time.
            w = 0.0
            for g, tg in zip(self.gate_centers, self.gate_times):
                d = np.linalg.norm(ref_p - g)
                r = self.gate_slow_radius if self.ref_t <= tg else self.gate_exit_radius
                w = max(w, np.exp(-0.5 * (d / max(r, 1e-6)) ** 2))
            scale = self.speed_scale + (self.gate_slow_scale - self.speed_scale) * w
        self.ref_t = min(self.ref_t + scale / self.ctrl_freq, self.traj.end_time)
        done = self.ref_t >= self.traj.end_time
        p = self.traj.position(self.ref_t).reshape(-1)[:3]
        p = p + _gate_correction_offset(p, corrections)
        v = self.traj.velocity(self.ref_t).reshape(-1)[:3] * scale
        args = (p, v, np.zeros(3), 0.0, np.zeros(3), global_it / self.ctrl_freq)
        return done, Command.FULLSTATE, args


class StageActionMPCC(StageAction):
    """Race along the planned path with MPCC, sending a look-ahead state of
    the optimized plan as a FULLSTATE command (reference
    stage_action_mpcc.py).  ``lead`` picks plan step k as the setpoint: the
    one-step state sits millimeters from the drone, which a
    position-dominant tracker ignores (it would hover while the virtual
    progress runs on); ~0.2 s of look-ahead gives it a real error to chase."""

    def __init__(self, ctrl_freq, mpcc, duration=None, lead=5,
                 gate_centers=None, gate_slow_scale=0.45, gate_slow_radius=0.9,
                 floor_rate=0.35, max_ahead=0.45):
        self.ctrl_freq = ctrl_freq
        self.mpcc = mpcc
        self.theta = 0.0
        self.theta_dot = 0.0
        self.theta_cmd = 0.0
        self.duration = duration
        self.lead = lead
        # Same smooth Gaussian gate-proximity slowdown as the spline stage:
        # the commanded lead/velocity shrink near apertures so the tracker
        # sheds cross-track error before the frame.
        self.gate_centers = gate_centers or []
        self.gate_slow_scale = gate_slow_scale
        self.gate_slow_radius = gate_slow_radius
        # Commanded-progress integrator bounds: the setpoint always advances
        # at >= floor_rate (plan-time units/s) but never runs more than
        # max_ahead ahead of the re-anchored (true) progress.  Without the
        # floor the loop deadlocks: theta_dot collapses near a gate, the
        # commanded point lands millimeters from the drone, the
        # position-dominant Mellinger holds, the re-anchor then pins theta to
        # the unmoving drone — observed as the level2 "conservative stall"
        # (0 gates).  Without the cap the command runs away when the tracker
        # truly cannot follow (the round-1 vertical-runaway failure).
        self.floor_rate = floor_rate
        self.max_ahead = max_ahead

    def reset(self):
        self.theta = 0.0
        self.theta_dot = 0.0
        self.theta_cmd = 0.0
        self.mpcc.reset()

    def run(self, global_it, stage_it, pos, vel, rpy, pqr, corrections=None):
        obs12 = np.concatenate(
            [[pos[0], vel[0], pos[1], vel[1], pos[2], vel[2]], rpy, pqr]
        )
        x_next, xs, self.theta, self.theta_dot = self.mpcc.solve(
            obs12, self.theta, self.theta_dot
        )
        # Clamp the carried virtual progress speed: warm-started solutions
        # can ratchet it past the soft bound when tracking lags.
        self.theta_dot = float(
            np.clip(self.theta_dot, 0.0, self.mpcc.params["theta_dot_max"])
        )
        # Command the planned PATH at the optimizer's progress + chosen speed
        # rather than the raw iLQR state: the geometric plan is collision-free
        # by construction, while an under-converged plan state can cut gate
        # frames; MPCC still contributes the speed profile (theta/theta_dot).
        slow = 1.0
        if self.gate_centers:
            ref_p, _ = self.mpcc.reference_at(self.theta, self.theta_dot)
            dmin = min(np.linalg.norm(ref_p - g) for g in self.gate_centers)
            w = np.exp(-0.5 * (dmin / max(self.gate_slow_radius, 1e-6)) ** 2)
            slow = 1.0 + (self.gate_slow_scale - 1.0) * w
        # Persistent command-progress: MPCC sets the pace (theta_dot), the
        # floor guarantees motion, the cap keeps the setpoint tethered to the
        # drone's actual progress.
        rate = max(self.theta_dot * slow, self.floor_rate)
        self.theta_cmd = max(self.theta_cmd, self.theta)
        self.theta_cmd = min(
            self.theta_cmd + rate / self.ctrl_freq,
            self.theta + self.max_ahead,
            self.mpcc.theta_max,
        )
        theta_lead = min(
            self.theta_cmd + self.lead / self.ctrl_freq * rate,
            self.mpcc.theta_max,
        )
        p, v = self.mpcc.reference_at(theta_lead, rate)
        p = p + _gate_correction_offset(p, corrections)
        # Velocity feedforward bounded to what the tracker can realize.
        speed = float(np.linalg.norm(v))
        if speed > 2.0:
            v = v * (2.0 / speed)
        done = self.theta >= self.mpcc.theta_max - 1e-3
        args = (p, v, np.zeros(3), 0.0, np.zeros(3), global_it / self.ctrl_freq)
        return done, Command.FULLSTATE, args


class StageActionNone(StageAction):
    def __init__(self, steps=1):
        self.steps = steps

    def run(self, global_it, stage_it, pos, vel, rpy, pqr, corrections=None):
        return stage_it >= self.steps - 1, Command.NONE, ()


class StageActionFinished(StageAction):
    def run(self, global_it, stage_it, pos, vel, rpy, pqr, corrections=None):
        return False, Command.FINISHED, ()


class StageSequencer:
    """Run stages in order (reference stage_sequencer.py:29-111)."""

    def __init__(self, stages):
        self.stages = list(stages)
        self.reset()

    def reset(self):
        self.idx = 0
        self.stage_it = 0
        for s in self.stages:
            s.reset()

    def run(self, global_it, pos, vel, rpy, pqr, corrections=None):
        if self.idx >= len(self.stages):
            return Command.FINISHED, ()
        stage = self.stages[self.idx]
        done, command, args = stage.run(
            global_it, self.stage_it, pos, vel, rpy, pqr, corrections=corrections
        )
        self.stage_it += 1
        if done:
            self.idx += 1
            self.stage_it = 0
        return command, args
