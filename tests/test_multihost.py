"""True multi-host smoke test — gated on a real multi-process JAX runtime
(SURVEY.md §4.2: "True multi-host (config 5) additionally gets a
jax.distributed smoke test gated on available hardware").

Run on a pod slice with one process per host, e.g.:

    BLOCKPUZZLE_NUM_PROCESSES=2 python -m pytest tests/test_multihost.py

after ``jax.distributed.initialize`` (the train CLI's ``--distributed``
flag does this).  On single-process machines (this CI) the test skips.
"""

import numpy as np
import pytest

import jax


multihost = pytest.mark.skipif(
    jax.process_count() < 2, reason="requires a multi-process JAX runtime"
)


@multihost
def test_env_axis_sharded_across_hosts():
    import jax.numpy as jnp

    from blockpuzzle_tpu import dist
    from blockpuzzle_tpu.env import make_env

    mesh = dist.make_mesh()
    env = make_env()
    n = 128 * jax.device_count()
    state, ts = env.init_jit(jax.random.key(0), n)
    state = dist.shard_batch_axis(mesh, state)
    state2, ts2 = jax.jit(env.step)(state, jnp.zeros(n, jnp.int32))
    # every process sees the same global reward sum (implicit all-reduce
    # through addressable-shard consistency)
    total = float(jnp.sum(ts2.reward))
    assert np.isfinite(total)


@multihost
def test_grad_psum_across_hosts():
    from blockpuzzle_tpu import dist
    from blockpuzzle_tpu.config import default_config
    from blockpuzzle_tpu.env import make_env
    from blockpuzzle_tpu.learn import PPO, PPOConfig

    mesh = dist.make_mesh()
    env = make_env(default_config())
    ppo = PPO(env, PPOConfig(
        num_envs=8 * jax.device_count(), rollout_len=4,
        num_epochs=1, num_minibatches=2, hidden=32, channels=(8,),
    ))
    state = ppo.init(jax.random.key(0))
    shardings = dist.to_named(mesh, dist.train_state_spec(state))
    state = jax.device_put(state, shardings)
    state, metrics = jax.jit(ppo.update, donate_argnums=(0,))(state)
    assert np.isfinite(float(metrics["loss"]))
