"""Import smoke test (reference tests/test_build.py:1-6 imports the five top
packages; here every subpackage plus the registry surface)."""


def test_imports():
    import safe_control_gym_tpu
    import safe_control_gym_tpu.envs
    import safe_control_gym_tpu.ops
    import safe_control_gym_tpu.models
    import safe_control_gym_tpu.parallel
    import safe_control_gym_tpu.controllers
    import safe_control_gym_tpu.competition
    import safe_control_gym_tpu.utils

    assert safe_control_gym_tpu.__version__


def test_registry_surface():
    from safe_control_gym_tpu import registry

    ids = registry.ids()
    for cid in ["quadrotor", "cartpole", "pid", "lqr", "ilqr", "mpc",
                "linear_mpc", "gp_mpc", "cbf", "ppo", "sac", "ddpg",
                "safe_explorer_ppo", "rarl", "rap", "mellinger"]:
        assert cid in ids, f"{cid} not registered"


def test_make_env_from_registry():
    from safe_control_gym_tpu import make

    env = make("cartpole", task="stabilization", episode_len_sec=2)
    assert env.max_episode_steps == 100


def test_make_controller_from_registry():
    import jax

    from safe_control_gym_tpu import make

    env = make("cartpole", task="stabilization", cost="quadratic", episode_len_sec=2)
    lqr = make("lqr", env, q_lqr=[1.0], r_lqr=[0.1])
    a = lqr.select_action(jax.numpy.zeros(4))
    assert a.shape == (1,)


def test_profiling_trace_summary(tmp_path):
    """device_trace + summarize_kernels round-trip (aux tracing subsystem)."""
    import jax
    import jax.numpy as jnp

    from safe_control_gym_tpu.utils.profiling import device_trace, summarize_kernels

    @jax.jit
    def f(x):
        return jnp.sin(x) @ jnp.cos(x.T)

    x = jnp.ones((128, 128))
    f(x).block_until_ready()
    with device_trace(str(tmp_path)):
        f(x).block_until_ready()
    rows = summarize_kernels(str(tmp_path), top=5)
    assert rows and all({"name", "total_us", "count"} <= set(r) for r in rows)
