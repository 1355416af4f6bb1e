"""Built-in registry entries.

Mirrors the reference's registrations: envs in
safe_control_gym/envs/__init__.py (the fork registers only ``quadrotor``;
``cartpole`` is restored here per the upstream suite) and the 13 controllers
in safe_control_gym/controllers/__init__.py:6-60 plus the firmware wrapper.
Controller entries are added lazily as modules land.
"""

from safe_control_gym_tpu.utils.registration import register

register(
    id="quadrotor",
    entry_point="safe_control_gym_tpu.envs.quadrotor:make_quadrotor_from_dict",
)
register(
    id="cartpole",
    entry_point="safe_control_gym_tpu.envs.cartpole:make_cartpole_from_dict",
)

_CONTROLLERS = {
    "pid": "safe_control_gym_tpu.controllers.pid:PID",
    "lqr": "safe_control_gym_tpu.controllers.lqr:LQR",
    "ilqr": "safe_control_gym_tpu.controllers.ilqr:iLQR",
    "mpc": "safe_control_gym_tpu.controllers.mpc:MPC",
    "linear_mpc": "safe_control_gym_tpu.controllers.linear_mpc:LinearMPC",
    "gp_mpc": "safe_control_gym_tpu.controllers.gp_mpc:GPMPC",
    "cbf": "safe_control_gym_tpu.controllers.cbf:CBF_QP",
    "ppo": "safe_control_gym_tpu.controllers.ppo:PPO",
    "sac": "safe_control_gym_tpu.controllers.sac:SAC",
    "ddpg": "safe_control_gym_tpu.controllers.ddpg:DDPG",
    "safe_explorer_ppo": "safe_control_gym_tpu.controllers.safe_explorer:SafeExplorerPPO",
    "rarl": "safe_control_gym_tpu.controllers.rarl:RARL",
    "rap": "safe_control_gym_tpu.controllers.rarl:RAP",
    "mellinger": "safe_control_gym_tpu.controllers.mellinger:MellingerController",
}
for _id, _ep in _CONTROLLERS.items():
    register(id=_id, entry_point=_ep)
