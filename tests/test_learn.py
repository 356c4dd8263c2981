"""Learner tests: PPO and DQN update programs at tiny shapes (SURVEY §4.2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blockpuzzle_tpu.config import default_config
from blockpuzzle_tpu.env import make_env
from blockpuzzle_tpu.learn import DQN, DQNConfig, PPO, PPOConfig


@pytest.fixture(scope="module")
def env():
    return make_env(default_config())


def small_ppo(env, **kw):
    cfg = PPOConfig(
        num_envs=16,
        rollout_len=8,
        num_epochs=1,
        num_minibatches=2,
        hidden=32,
        channels=(8,),
        **kw,
    )
    return PPO(env, cfg)


def test_ppo_init_and_update_shapes(env):
    ppo = small_ppo(env)
    state = ppo.init(jax.random.key(0))
    p0 = jax.tree.map(np.array, state.params)  # host copy: state is donated
    state2, metrics = ppo.update_jit(state)
    assert int(state2.update_count) == 1
    for k in ("loss", "policy_loss", "value_loss", "entropy", "approx_kl",
              "episode_return", "reward_per_step"):
        assert np.isfinite(float(metrics[k])), k
    # params actually changed
    diff = jax.tree.map(
        lambda a, b: float(np.abs(a - np.asarray(b)).max()), p0, state2.params
    )
    assert max(jax.tree.leaves(diff)) > 0


def test_ppo_multiple_updates_stable(env):
    ppo = small_ppo(env)
    state = ppo.init(jax.random.key(1))
    for _ in range(3):
        state, metrics = ppo.update_jit(state)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["entropy"]) >= 0


def test_ppo_policy_only_picks_legal_actions(env):
    """Masked logits make illegal actions unsampleable."""
    from blockpuzzle_tpu.learn import networks

    ppo = small_ppo(env)
    state = ppo.init(jax.random.key(2))
    board, queue, action_mask = ppo.observe(state.env_state)
    logits, value = ppo.net.apply(state.params, board, queue, action_mask)
    assert logits.shape == (16, env.num_actions)
    assert value.shape == (16,)
    samples = networks.masked_categorical(jax.random.key(3), logits)
    mask = np.asarray(action_mask)
    for i, a in enumerate(np.asarray(samples)):
        assert mask[i, a], f"sampled illegal action {a} for env {i}"


def test_gae_simple_case(env):
    """GAE on a hand-built 2-step batch matches the closed form."""
    from blockpuzzle_tpu.learn.ppo import Batch

    ppo = small_ppo(env)
    gamma, lam = ppo.cfg.gamma, ppo.cfg.gae_lambda
    T, N = 3, 2
    z = jnp.zeros((T, N))
    batch = Batch(
        board=z, queue=z, action_mask=z, action=z, log_prob=z,
        value=jnp.array([[1.0, 1.0], [2.0, 2.0], [3.0, 3.0]]),
        reward=jnp.array([[1.0, 1.0], [1.0, 1.0], [1.0, 1.0]]),
        done=jnp.array([[False, False], [False, True], [False, False]]),
        terminated=jnp.array([[False, False], [False, True], [False, False]]),
        final_value=z,
    )
    last_value = jnp.array([5.0, 5.0])
    adv, ret = ppo._gae(batch, last_value)
    # env 1, t=1 terminated: delta = r - v = 1 - 2 = -1, no bootstrap
    d2 = 1.0 + gamma * 5.0 - 3.0
    d1_env1 = 1.0 - 2.0
    assert float(adv[1, 1]) == pytest.approx(d1_env1 + gamma * lam * 0.0)
    assert float(adv[2, 0]) == pytest.approx(d2)
    np.testing.assert_allclose(
        np.asarray(ret), np.asarray(adv + batch.value), rtol=1e-6
    )


def test_ppo_runtime_hypers_match_static(env):
    """update(state, default_hypers) matches update(state) to float
    tolerance — the sweep path (runtime scalars) has the same semantics as
    the baked-constant path.  Not bit-exact: the static program constant-
    folds e.g. gamma*gae_lambda at f64 before the single f32 round, the
    runtime program rounds each factor to f32 first."""
    from blockpuzzle_tpu.learn import default_hypers

    ppo = small_ppo(env)
    state_a = ppo.init(jax.random.key(7))
    state_b = ppo.init(jax.random.key(7))
    out_a, m_a = jax.jit(ppo.update)(state_a)
    out_b, m_b = jax.jit(ppo.update)(state_b, default_hypers(ppo.cfg))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        ),
        out_a.params,
        out_b.params,
    )
    np.testing.assert_allclose(
        float(m_a["loss"]), float(m_b["loss"]), rtol=1e-4
    )


def test_ppo_runtime_lr_is_live(env):
    """Changing the runtime lr changes the step (no silent constant-folding);
    lr=0 freezes the params exactly."""
    ppo = small_ppo(env)
    state = ppo.init(jax.random.key(8))
    p0 = jax.tree.map(np.array, state.params)
    from blockpuzzle_tpu.learn import default_hypers

    hy = dict(default_hypers(ppo.cfg), lr=0.0)
    out, _ = jax.jit(ppo.update)(state, hy)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        p0,
        out.params,
    )


def test_ppo_anneal_updates_decays_lr(env):
    """cfg.anneal_updates>0 (hypers=None path) shrinks the step over time
    and reaches lr=0 at the horizon."""
    ppo = small_ppo(env, anneal_updates=2)
    state = ppo.init(jax.random.key(9))
    state = state.replace(update_count=jnp.asarray(2, jnp.int32))
    p0 = jax.tree.map(np.array, state.params)
    out, _ = jax.jit(ppo.update)(state)  # frac = 1 - 2/2 = 0 -> frozen
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        p0,
        out.params,
    )


def test_ppo_multi_update_matches_sequential(env):
    """K scanned updates (one dispatch) match K sequential updates."""
    from blockpuzzle_tpu.learn import default_hypers

    ppo = small_ppo(env)
    hy = default_hypers(ppo.cfg)
    state_a = ppo.init(jax.random.key(11))
    state_b = ppo.init(jax.random.key(11))
    for _ in range(3):
        state_a, m_a = ppo.update_jit(state_a, hy)
    stack = {k: jnp.full((3,), v, jnp.float32) for k, v in hy.items()}
    state_b, m_b = ppo.multi_update_jit(state_b, stack)
    assert m_b["loss"].shape == (3,)
    assert int(state_b.update_count) == 3
    np.testing.assert_allclose(
        float(m_a["loss"]), float(m_b["loss"][-1]), rtol=1e-4
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        ),
        state_a.params,
        state_b.params,
    )


def test_ppo_mlp_torso_trains(env):
    """The pure-matmul torso variant runs and learns param updates."""
    ppo = small_ppo(env, torso="mlp")
    state = ppo.init(jax.random.key(12))
    p0 = jax.tree.map(np.array, state.params)
    assert "mlp_0" in state.params["params"]["Torso_0"]
    assert "Conv_0" not in state.params["params"]["Torso_0"]
    state, metrics = ppo.update_jit(state)
    assert np.isfinite(float(metrics["loss"]))
    diff = jax.tree.map(
        lambda a, b: float(np.abs(a - np.asarray(b)).max()), p0, state.params
    )
    assert max(jax.tree.leaves(diff)) > 0


def test_ppo_mlp_width_is_plumbed(env):
    """PPOConfig.mlp_width sizes the torso matmul (ROADMAP width sweep)."""
    ppo = small_ppo(env, torso="mlp", mlp_width=96)
    state = ppo.init(jax.random.key(14))
    kernel = state.params["params"]["Torso_0"]["mlp_0"]["kernel"]
    assert kernel.value.shape[-1] == 96  # Partitioned box around the array
    state, metrics = ppo.update_jit(state)
    assert np.isfinite(float(metrics["loss"]))


def test_dqn_mlp_width_is_plumbed(env):
    cfg = DQNConfig(
        num_envs=8, buffer_size=128, batch_size=8, collect_steps=2,
        min_buffer=4, hidden=16, channels=(4,), torso="mlp", mlp_width=48,
    )
    dqn = DQN(env, cfg)
    state = dqn.init(jax.random.key(15))
    kernel = state.params["params"]["Torso_0"]["mlp_0"]["kernel"]
    assert kernel.value.shape[-1] == 48
    state, m = dqn.iteration_jit(state)
    assert int(m["buffer_filled"]) == 16


def test_dqn_mlp_torso_iteration(env):
    cfg = DQNConfig(
        num_envs=8, buffer_size=128, batch_size=8, collect_steps=2,
        min_buffer=4, hidden=16, channels=(4,), torso="mlp",
    )
    dqn = DQN(env, cfg)
    state = dqn.init(jax.random.key(13))
    state, m = dqn.iteration_jit(state)
    assert int(m["buffer_filled"]) == 16


def test_dqn_iteration(env):
    cfg = DQNConfig(
        num_envs=16,
        buffer_size=512,
        batch_size=32,
        collect_steps=2,
        grad_steps=1,
        min_buffer=64,
        hidden=32,
        channels=(8,),
        eps_decay_iters=10,
    )
    dqn = DQN(env, cfg)
    state = dqn.init(jax.random.key(0))
    # first iterations fill the buffer without gradient steps
    state, m = dqn.iteration_jit(state)
    assert int(m["buffer_filled"]) == 32
    assert float(m["loss"]) == 0.0  # buffer below min at update decision
    p0 = jax.tree.map(np.array, state.params)  # host copy: state is donated
    for _ in range(3):
        state, m = dqn.iteration_jit(state)
    assert int(m["buffer_filled"]) > 32
    assert float(m["loss"]) > 0.0
    diff = jax.tree.map(
        lambda a, b: float(np.abs(a - np.asarray(b)).max()), p0, state.params
    )
    assert max(jax.tree.leaves(diff)) > 0
    assert float(m["epsilon"]) < 1.0


def test_dqn_replay_wraps(env):
    cfg = DQNConfig(
        num_envs=8, buffer_size=16, batch_size=8, collect_steps=3,
        grad_steps=0, min_buffer=8, hidden=16, channels=(4,),
    )
    dqn = DQN(env, cfg)
    state = dqn.init(jax.random.key(1))
    state, m = dqn.iteration_jit(state)  # writes 24 > 16: wraps
    assert int(state.replay.filled) == 16
    assert int(state.replay.cursor) == 8


def test_ppo_update_on_tenten_preset():
    """Multi-slot queue config exercises the S>1 learner/mask paths."""
    from blockpuzzle_tpu.config import tenten_config

    env3 = make_env(tenten_config())
    ppo = PPO(env3, PPOConfig(
        num_envs=8, rollout_len=4, num_epochs=1, num_minibatches=2,
        hidden=16, channels=(4,),
    ))
    state = ppo.init(jax.random.key(0))
    state, metrics = ppo.update_jit(state)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["illegal_action_rate"]) == 0.0  # masked policy


def test_dqn_runtime_hypers_match_static(env):
    """iteration(state, default_dqn_hypers(cfg, it)) == iteration(state)
    bit-for-bit (mirrors the PPO runtime-hypers equivalence test)."""
    from blockpuzzle_tpu.learn import default_dqn_hypers

    cfg = DQNConfig(
        num_envs=8, buffer_size=64, batch_size=8, collect_steps=2,
        min_buffer=4, hidden=16, channels=(4,),
    )
    dqn = DQN(env, cfg)
    s_static = dqn.init(jax.random.key(3))
    s_hyper = dqn.init(jax.random.key(3))
    it_static = jax.jit(dqn.iteration)
    it_hyper = jax.jit(lambda s, h: dqn.iteration(s, h))
    for it in range(3):
        s_static, m_static = it_static(s_static)
        s_hyper, m_hyper = it_hyper(s_hyper, default_dqn_hypers(cfg, it))
        for k in ("loss", "q_mean", "epsilon"):
            assert float(m_static[k]) == float(m_hyper[k]), (k, it)
    for a, b in zip(
        jax.tree.leaves(s_static.params), jax.tree.leaves(s_hyper.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dqn_runtime_lr_is_live(env):
    """lr=0 through hypers must freeze params (proves lr is runtime)."""
    from blockpuzzle_tpu.learn import default_dqn_hypers

    cfg = DQNConfig(
        num_envs=8, buffer_size=64, batch_size=8, collect_steps=2,
        min_buffer=4, hidden=16, channels=(4,),
    )
    dqn = DQN(env, cfg)
    state = dqn.init(jax.random.key(4))
    # warm the buffer first so the grad path actually runs
    state, _ = jax.jit(dqn.iteration)(state)
    p0 = jax.tree.map(np.array, state.params)
    h = dict(default_dqn_hypers(cfg, 1), lr=0.0)
    state, metrics = jax.jit(lambda s, hh: dqn.iteration(s, hh))(state, h)
    assert int(metrics["buffer_filled"]) > 0
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dqn_hypers_zero_decay_is_constant_eps_end():
    """eps_decay_iters=0 means no decay (was ZeroDivisionError)."""
    from blockpuzzle_tpu.learn import default_dqn_hypers

    cfg = DQNConfig(eps_decay_iters=0, eps_start=1.0, eps_end=0.07)
    for it in (0, 1, 100):
        assert default_dqn_hypers(cfg, it)["eps"] == pytest.approx(0.07)


def test_dqn_explore_only_picks_legal_actions(env):
    """The bits-argmax uniform-legal explorer (eps=1) must never emit an
    illegal action, including on all-zero random draws (the `| 1` tie
    guard)."""
    import jax
    import numpy as np

    from blockpuzzle_tpu.learn import DQN, DQNConfig

    dqn = DQN(env, DQNConfig(num_envs=32, buffer_size=128, batch_size=8,
                             collect_steps=1, min_buffer=8, hidden=32,
                             channels=(8,)))
    state = dqn.init(jax.random.key(3))
    board, queue, mask = dqn.observe(state.env_state)
    for i in range(4):
        a = dqn._act(state.params, board, queue, mask,
                     jax.random.key(100 + i), eps=1.0)
        picked = np.asarray(mask)[np.arange(mask.shape[0]), np.asarray(a)]
        assert picked.all()
