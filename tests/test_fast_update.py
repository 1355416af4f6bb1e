"""VMEM-resident PPO update kernel (parallel/fast_update.py).

Interpret-mode validation: kernel gradients equal jax.value_and_grad of
the reference losses (incl. jnp.minimum/jnp.clip subgradient conventions),
and full training trajectories match the XLA update path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_gym_tpu.controllers.ppo import PPO
from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor

pytestmark = pytest.mark.slow

jax.config.update("jax_platforms", "cpu")


def _env():
    return make_quadrotor(QuadrotorConfig(
        quad_type=3, ctrl_freq=60, pyb_freq=240, episode_len_sec=2,
        task="traj_tracking",
        task_info={"trajectory_type": "figure8", "trajectory_plane": "xy",
                   "trajectory_position_offset": [0, 0], "trajectory_scale": 1.0,
                   "num_cycles": 1, "proj_point": [0, 0, 0.5],
                   "proj_normal": [0, 1, 1]},
        cost="rl_reward", normalized_rl_action_space=True,
    ))


def test_fast_update_matches_xla_training():
    """Three full train steps with the Pallas update equal the XLA update
    path: same params, same logstd, same metrics (fp tolerance)."""
    env = _env()
    outs = {}
    for fast in (False, True):
        ppo = PPO(env, seed=0, rollout_batch_size=64, rollout_steps=16,
                  opt_epochs=3, mini_batch_size=256,
                  use_fast_update=fast, fast_interpret=True,
                  reshuffle_each_epoch=False)
        s = ppo.state
        for _ in range(3):
            s, m = ppo._train_step(s)
        outs[fast] = (jax.device_get((s.ac.actor_params, s.ac.critic_params,
                                      s.ac.logstd)),
                      {k: float(v) for k, v in jax.device_get(m).items()})
    for xa, xb in zip(jax.tree.leaves(outs[False][0]),
                      jax.tree.leaves(outs[True][0])):
        np.testing.assert_allclose(xa, xb, rtol=3e-4, atol=3e-6)
    for k in ("policy_loss", "value_loss", "entropy_loss", "approx_kl"):
        np.testing.assert_allclose(outs[False][1][k], outs[True][1][k],
                                   rtol=2e-3, atol=1e-6, err_msg=k)


@pytest.mark.parametrize("nx,nu", [(12, 4), (4, 1), (6, 2)])
def test_fast_update_multichunk_grads(nx, nu):
    """Chunked accumulation (mb > chunk) produces the same gradients as a
    direct XLA value_and_grad on one synthetic minibatch — for the quad-3D,
    cartpole, and planar-quad obs/act shapes."""
    from safe_control_gym_tpu.parallel.fast_update import FastPPOUpdate
    from safe_control_gym_tpu.models.distributions import Normal
    from safe_control_gym_tpu.models.networks import MLP

    H, mb, chunk = 64, 512, 128
    F_ROWS = nx + nu + 4
    actor = MLP(nu, (H, H), act="tanh", out_gain=0.01)
    critic = MLP(1, (H, H), act="tanh")
    k = jax.random.key(3)
    ap = actor.init(k, jnp.zeros((1, nx)))
    cp = critic.init(jax.random.fold_in(k, 1), jnp.zeros((1, nx)))
    logstd = -0.5 * jnp.ones(nu)

    rng = np.random.default_rng(0)
    obs = rng.normal(size=(mb, nx)).astype(np.float32)
    act = rng.normal(size=(mb, nu)).astype(np.float32) * 0.5
    logp_old = rng.normal(size=(mb,)).astype(np.float32) * 0.1 - 4.0
    ret = rng.normal(size=(mb,)).astype(np.float32)
    adv = rng.normal(size=(mb,)).astype(np.float32)
    v_old = rng.normal(size=(mb,)).astype(np.float32)
    clip = 0.2

    def losses(ap_, logstd_, cp_):
        mean = actor.apply(ap_, obs)
        dist = Normal(mean, jnp.exp(logstd_))
        logp = dist.log_prob(act)
        ratio = jnp.exp(logp - logp_old)
        surr = jnp.minimum(
            ratio * adv, jnp.clip(ratio, 1 - clip, 1 + clip) * adv)
        p_loss = -surr.mean()
        v_cur = critic.apply(cp_, obs)[..., 0]
        v_loss = 0.5 * ((v_cur - ret) ** 2).mean()
        return p_loss + v_loss

    ga_ref, gl_ref, gc_ref = jax.grad(losses, argnums=(0, 1, 2))(
        ap, logstd, cp)

    fu = FastPPOUpdate(mb, H, "tanh", clip, chunk=chunk, interpret=True,
                       obs_dim=nx, act_dim=nu)
    packed = np.concatenate(
        [obs, act, v_old[:, None], logp_old[:, None], ret[:, None],
         adv[:, None]], axis=1)
    assert packed.shape[1] == F_ROWS
    mb_T = jnp.asarray(packed.T.reshape(F_ROWS, 8, mb // 8))
    ga, gc, glogstd, sums = fu.grads(mb_T, fu.prep_weights(ap, cp, logstd))

    for xa, xb in zip(jax.tree.leaves(ga_ref), jax.tree.leaves(ga)):
        np.testing.assert_allclose(np.asarray(xb), np.asarray(xa),
                                   rtol=2e-4, atol=2e-6)
    for xa, xb in zip(jax.tree.leaves(gc_ref), jax.tree.leaves(gc)):
        np.testing.assert_allclose(np.asarray(xb), np.asarray(xa),
                                   rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(glogstd), np.asarray(gl_ref),
                               rtol=2e-4, atol=2e-6)
    # Loss sums: policy = -sum(min_surr)/N, value = 0.5*sum(sq)/N.
    p_loss_ref = float(-jnp.minimum(
        jnp.exp(Normal(actor.apply(ap, obs), jnp.exp(logstd)).log_prob(act)
                - logp_old) * adv,
        jnp.clip(jnp.exp(Normal(actor.apply(ap, obs), jnp.exp(logstd))
                         .log_prob(act) - logp_old),
                 1 - clip, 1 + clip) * adv).mean())
    np.testing.assert_allclose(float(-sums[0] / mb), p_loss_ref, rtol=2e-4)


def test_fast_update_rejects_sub_register_chunks():
    """Mosaic only supports the kernel's (F, 8, CL) -> (F, 8*CL) flatten
    when the chunk is a whole number of (8 sublane x 128 lane) registers:
    a compiled (non-interpret) FastPPOUpdate below 1024 samples/chunk must
    raise an actionable ValueError up front, not an internal Mosaic error
    at trace time (found by running dryrun_multichip's tiny shapes on a
    real TPU), and the PPO auto gate must decline such minibatches."""
    from safe_control_gym_tpu.parallel.fast_update import FastPPOUpdate

    with pytest.raises(ValueError, match="multiple of 1024"):
        FastPPOUpdate(64, 128, "tanh", 0.2, interpret=False)
    # Interpret mode (used by the CPU tests above) has no Mosaic layout
    # constraint and keeps accepting small chunks.
    FastPPOUpdate(64, 128, "tanh", 0.2, interpret=True)

    env = _env()
    # fast_interpret=True stands in for the TPU backend in the auto gate.
    ppo = PPO(env, seed=0, rollout_batch_size=8, rollout_steps=4,
              opt_epochs=1, mini_batch_size=16,
              use_fast_update="auto", fast_interpret=True)
    assert ppo._fu is None, "auto gate must decline mb=16 (not 1024-aligned)"
    ppo = PPO(env, seed=0, rollout_batch_size=64, rollout_steps=16,
              opt_epochs=1, mini_batch_size=1024,
              use_fast_update="auto", fast_interpret=True)
    assert ppo._fu is not None
