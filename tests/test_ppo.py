"""PPO learner tests: GAE vs numpy reference, KL early stop, and a
learnability smoke test on a synthetic bandit (the JAX analogue of SB3's
IdentityEnv fixtures, SURVEY §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from flax import linen as nn

from gennbv_tpu import spec
from gennbv_tpu.algo import gae, ppo
from gennbv_tpu.config import PPOConfig
from gennbv_tpu.models import distributions


def gae_np(rewards, values, dones, last_values, gamma, lam):
    t, n = rewards.shape
    adv = np.zeros((t, n))
    next_v = last_values
    next_adv = np.zeros(n)
    for i in reversed(range(t)):
        nt = 1.0 - dones[i]
        delta = rewards[i] + gamma * next_v * nt - values[i]
        next_adv = delta + gamma * lam * nt * next_adv
        adv[i] = next_adv
        next_v = values[i]
    return adv, adv + values


class TestGAE:
    def test_matches_numpy(self):
        rng = np.random.RandomState(0)
        t, n = 16, 4
        rewards = rng.randn(t, n).astype(np.float32)
        values = rng.randn(t, n).astype(np.float32)
        dones = (rng.rand(t, n) < 0.15).astype(np.float32)
        last_values = rng.randn(n).astype(np.float32)
        adv, ret = gae.compute_gae(
            jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
            jnp.asarray(last_values), 0.99, 0.95,
        )
        want_adv, want_ret = gae_np(rewards, values, dones, last_values, 0.99, 0.95)
        np.testing.assert_allclose(np.array(adv), want_adv, atol=1e-4)
        np.testing.assert_allclose(np.array(ret), want_ret, atol=1e-4)


class TinyPolicy(nn.Module):
    """Minimal actor-critic over a 4-dim obs for learner tests."""

    @nn.compact
    def __call__(self, obs, train: bool = False):
        h = nn.Dense(64)(obs)
        h = nn.relu(h)
        # a BatchNorm so the batch_stats plumbing is exercised
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        logits = nn.Dense(spec.NUM_LOGITS)(h)
        value = nn.Dense(1)(h)[..., 0]
        from gennbv_tpu.models.policy import PolicyOutput
        return PolicyOutput(logits=logits, value=value)


def make_ts(model, rng, obs_dim, cfg):
    variables = model.init(rng, jnp.zeros((1, obs_dim)), train=False)
    tx = ppo.make_optimizer(cfg)
    ts = ppo.PPOTrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )
    return ts, tx


class TestPPOUpdate:
    def _rollout_bandit(self, model, ts, rng, n=512):
        """One-step bandit: reward 1 iff action x-component == target(obs)."""
        obs_rng, act_rng = jax.random.split(rng)
        targets = jax.random.randint(obs_rng, (n,), 0, 4)
        obs = jax.nn.one_hot(targets, 4)
        out = model.apply(
            {"params": ts.params, "batch_stats": ts.batch_stats}, obs, train=False
        )
        actions = distributions.sample(out.logits, act_rng)
        logp = distributions.log_prob(out.logits, actions)
        rewards = (actions[:, 0] == targets).astype(jnp.float32)
        adv = rewards - out.value
        returns = rewards
        return obs, actions, logp, out.value, adv, returns, rewards

    def test_bandit_learns(self):
        cfg = PPOConfig(
            batch_size=128, n_epochs=4, learning_rate=3e-3, target_kl=None,
            policy_loss_mult=1.0, clip_range_vf=None,
        )
        model = TinyPolicy()
        rng = jax.random.PRNGKey(0)
        ts, tx = make_ts(model, rng, 4, cfg)

        upd = jax.jit(
            lambda ts, o, a, lp, v, ad, re, r: ppo.update(
                model, tx, cfg, ts, o, a, lp, v, ad, re, r
            )
        )
        mean_r0 = None
        for i in range(30):
            rng, r1, r2 = jax.random.split(rng, 3)
            obs, actions, logp, values, adv, returns, rewards = self._rollout_bandit(
                model, ts, r1
            )
            if mean_r0 is None:
                mean_r0 = float(rewards.mean())
            ts, metrics = upd(ts, obs, actions, logp, values, adv, returns, r2)
        rng, r1 = jax.random.split(rng)
        *_, rewards = self._rollout_bandit(model, ts, r1)
        final = float(rewards.mean())
        assert final > 0.8, f"bandit not learned: {mean_r0} -> {final}"
        assert final > mean_r0 + 0.3

    def test_kl_early_stop_halts_updates(self):
        cfg = PPOConfig(batch_size=64, n_epochs=4, target_kl=1e-9,
                        learning_rate=1e-2, policy_loss_mult=10.0)
        model = TinyPolicy()
        rng = jax.random.PRNGKey(1)
        ts, tx = make_ts(model, rng, 4, cfg)
        rng, r1, r2 = jax.random.split(rng, 3)
        obs, actions, logp, values, adv, returns, _ = self._rollout_bandit(model, ts, r1, n=256)
        # perturb old log-probs so the very first minibatch KL is large
        logp = logp + 1.0
        ts2, metrics = ppo.update(model, tx, cfg, ts, obs, actions, logp, values,
                                  adv, returns, r2)
        assert float(metrics.n_minibatches_done) == 0.0
        # params unchanged
        for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(ts2.params)):
            np.testing.assert_array_equal(np.array(a), np.array(b))

    def test_entropy_floor_preserves_entropy(self):
        """With a hinge entropy floor near the max, repeated updates keep
        policy entropy higher than the reference loss does; without it the
        bandit objective peaks the policy."""
        def run(ent_floor):
            cfg = PPOConfig(batch_size=128, n_epochs=4, learning_rate=3e-3,
                            target_kl=None, policy_loss_mult=1.0,
                            clip_range_vf=None, ent_floor=ent_floor,
                            ent_floor_coef=1.0)
            model = TinyPolicy()
            rng = jax.random.PRNGKey(3)
            ts, tx = make_ts(model, rng, 4, cfg)
            upd = jax.jit(
                lambda ts, o, a, lp, v, ad, re, r: ppo.update(
                    model, tx, cfg, ts, o, a, lp, v, ad, re, r))
            for _ in range(15):
                rng, r1, r2 = jax.random.split(rng, 3)
                obs, actions, logp, values, adv, returns, _ = (
                    self._rollout_bandit(model, ts, r1))
                ts, metrics = upd(ts, obs, actions, logp, values, adv,
                                  returns, r2)
            return -float(metrics.entropy_loss)   # mean entropy

        ent_free = run(None)
        ent_floored = run(17.0)   # max entropy of the action space ~17.8
        assert ent_floored > ent_free + 0.5, (ent_free, ent_floored)

    def test_update_runs_all_minibatches_without_target_kl(self):
        cfg = PPOConfig(batch_size=64, n_epochs=3, target_kl=None)
        model = TinyPolicy()
        rng = jax.random.PRNGKey(2)
        ts, tx = make_ts(model, rng, 4, cfg)
        rng, r1, r2 = jax.random.split(rng, 3)
        obs, actions, logp, values, adv, returns, _ = self._rollout_bandit(model, ts, r1, n=256)
        ts2, metrics = ppo.update(model, tx, cfg, ts, obs, actions, logp, values,
                                  adv, returns, r2)
        assert float(metrics.n_minibatches_done) == 3 * (256 // 64)
        assert np.isfinite(float(metrics.policy_loss))
        assert np.isfinite(float(metrics.explained_variance))


def test_linear_lr_schedule():
    """Linear schedule anneals the effective step size toward 0; a bogus
    schedule name is rejected."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    import pytest
    from gennbv_tpu.algo import ppo
    from gennbv_tpu.config import PPOConfig

    cfg = PPOConfig(learning_rate=1e-3, lr_schedule="linear", n_epochs=1,
                    n_steps=4, batch_size=8, total_iters=10)
    tx = ppo.make_optimizer(cfg, num_envs=8)
    params = {"w": jnp.ones(4)}
    st = tx.init(params)
    g = {"w": jnp.ones(4)}
    u1, st = tx.update(g, st, params)
    sizes = [float(jnp.abs(u1["w"]).mean())]
    for _ in range(30):
        u, st = tx.update(g, st, params)
        sizes.append(float(jnp.abs(u["w"]).mean()))
    # Adam normalizes the magnitude, so the anneal shows up as decay to ~0
    assert sizes[-1] < sizes[0] * 0.3, sizes[::10]

    with pytest.raises(ValueError, match="lr_schedule"):
        ppo.make_optimizer(PPOConfig(lr_schedule="cosine"), 8)


class TestApplyModeParity:
    """apply_mode="cond" (lax.cond the optimizer apply) must be bitwise-
    identical to the shipped "select" form (three tree-sized jnp.where) —
    both in steady state and when the KL early stop triggers mid-scan."""

    def _run(self, apply_mode, target_kl, seed=7):
        import dataclasses
        cfg = PPOConfig(batch_size=64, n_epochs=3, learning_rate=1e-3,
                        target_kl=target_kl, policy_loss_mult=10.0,
                        apply_mode=apply_mode)
        model = TinyPolicy()
        rng = jax.random.PRNGKey(seed)
        ts, tx = make_ts(model, rng, 4, cfg)
        rng, r1, r2 = jax.random.split(rng, 3)
        obs_rng, act_rng = jax.random.split(r1)
        targets = jax.random.randint(obs_rng, (256,), 0, 4)
        obs = jax.nn.one_hot(targets, 4)
        out = model.apply({"params": ts.params,
                           "batch_stats": ts.batch_stats}, obs, train=False)
        actions = distributions.sample(out.logits, act_rng)
        logp = distributions.log_prob(out.logits, actions)
        rewards = (actions[:, 0] == targets).astype(jnp.float32)
        ts2, m = jax.jit(
            lambda ts, r: ppo.update(model, tx, cfg, ts, obs, actions, logp,
                                     out.value, rewards - out.value, rewards,
                                     r)
        )(ts, r2)
        return ts2, m

    def _assert_same(self, kl):
        ts_a, m_a = self._run("select", kl)
        ts_b, m_b = self._run("cond", kl)
        for x, y in zip(jax.tree.leaves((ts_a.params, ts_a.opt_state,
                                         ts_a.batch_stats)),
                        jax.tree.leaves((ts_b.params, ts_b.opt_state,
                                         ts_b.batch_stats))):
            np.testing.assert_array_equal(np.array(x), np.array(y))
        for x, y in zip(m_a, m_b):
            np.testing.assert_array_equal(np.array(x), np.array(y))

    def test_steady_state_bitwise_equal(self):
        self._assert_same(kl=0.5)   # never triggers: all minibatches apply

    def test_early_stop_bitwise_equal(self):
        # triggers after some minibatches (moderate threshold)
        ts_a, m_a = self._run("select", 1e-5)
        ts_b, m_b = self._run("cond", 1e-5)
        assert float(m_a.n_minibatches_done) < 12.0  # it really stopped
        np.testing.assert_array_equal(
            np.array(m_a.n_minibatches_done), np.array(m_b.n_minibatches_done))
        for x, y in zip(jax.tree.leaves(ts_a.params),
                        jax.tree.leaves(ts_b.params)):
            np.testing.assert_array_equal(np.array(x), np.array(y))

    def test_bad_mode_rejected(self):
        with pytest.raises(ValueError, match="apply_mode"):
            self._run("typo", 0.5)
