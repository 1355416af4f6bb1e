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

# (entry_point, default config) — defaults mirror the reference's per-algo
# YAMLs (controllers/*/{algo}.yaml); None where the dataclass defaults are
# the config surface.
_CONTROLLERS = {
    "pid": ("safe_control_gym_tpu.controllers.pid:PID", None),
    "lqr": ("safe_control_gym_tpu.controllers.lqr:LQR",
            {"q_lqr": [1.0], "r_lqr": [1.0], "discrete_dynamics": True}),
    "ilqr": ("safe_control_gym_tpu.controllers.ilqr:iLQR",
             {"q_lqr": [1.0], "r_lqr": [1.0], "max_iterations": 15,
              "lamb_factor": 10.0, "lamb_max": 1000.0, "epsilon": 0.01}),
    "mpc": ("safe_control_gym_tpu.controllers.mpc:MPC",
            {"horizon": 5, "q_mpc": [1.0], "r_mpc": [1.0], "warmstart": True,
             "soft_constraints": False, "constraint_tol": 1e-6}),
    "linear_mpc": ("safe_control_gym_tpu.controllers.linear_mpc:LinearMPC",
                   {"horizon": 5, "q_mpc": [1.0], "r_mpc": [1.0]}),
    "gp_mpc": ("safe_control_gym_tpu.controllers.gp_mpc:GPMPC",
               {"horizon": 5, "q_mpc": [1.0], "r_mpc": [1.0], "prob": 0.955,
                "num_samples": 300, "num_inducing": 64}),
    "cbf": ("safe_control_gym_tpu.controllers.cbf:CBF_QP",
            {"slope": 0.1, "soft_constrained": True, "slack_weight": 10000.0}),
    "ppo": ("safe_control_gym_tpu.controllers.ppo:PPO",
            {"hidden_dim": 64, "gamma": 0.99, "use_gae": False,
             "gae_lambda": 0.95, "clip_param": 0.2, "target_kl": 0.01,
             "entropy_coef": 0.01, "opt_epochs": 10, "mini_batch_size": 64,
             "actor_lr": 3e-4, "critic_lr": 1e-3, "max_env_steps": 1_000_000,
             "rollout_batch_size": 4, "rollout_steps": 100}),
    "sac": ("safe_control_gym_tpu.controllers.sac:SAC",
            {"hidden_dim": 256, "gamma": 0.99, "tau": 0.005,
             "init_temperature": 0.2, "use_entropy_tuning": False,
             "train_interval": 100, "train_batch_size": 64,
             "actor_lr": 1e-3, "critic_lr": 1e-3, "warm_up_steps": 1000,
             "rollout_batch_size": 4, "max_buffer_size": 1_000_000}),
    "ddpg": ("safe_control_gym_tpu.controllers.ddpg:DDPG",
             {"hidden_dim": 256, "gamma": 0.99, "tau": 0.005,
              "train_interval": 100, "train_batch_size": 64,
              "actor_lr": 1e-3, "critic_lr": 1e-3, "warm_up_steps": 10_000,
              "rollout_batch_size": 4, "max_buffer_size": 1_000_000}),
    "safe_explorer_ppo": (
        "safe_control_gym_tpu.controllers.safe_explorer:SafeExplorerPPO",
        {"constraint_margin": 0.0, "pretrain_steps": 200}),
    "rarl": ("safe_control_gym_tpu.controllers.rarl:RARL",
             {"rollout_batch_size": 4, "rollout_steps": 100,
              "num_pro_iters": 1, "num_adv_iters": 1}),
    "rap": ("safe_control_gym_tpu.controllers.rarl:RAP",
            {"num_adversaries": 3, "rollout_batch_size": 4, "rollout_steps": 100}),
    "mellinger": ("safe_control_gym_tpu.controllers.mellinger:MellingerController", None),
}
for _id, (_ep, _cfg) in _CONTROLLERS.items():
    register(id=_id, entry_point=_ep, config_entry_point=_cfg)
