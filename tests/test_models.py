"""Model + distribution tests: shapes, posenc layout, init gains,
MultiCategorical correctness."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gennbv_tpu import spec
from gennbv_tpu.config import ModelConfig
from gennbv_tpu.models import distributions, init_policy
from gennbv_tpu.models.encoder import HybridEncoder, positional_encoding


class TestPositionalEncoding:
    def test_reference_layout(self):
        """Mirror of hybrid_encoder.py:56-67: bands [1, 2], interleaved as
        (p0*1, p0*2, p1*1, ...), then sin ++ cos."""
        pos = jnp.asarray(np.random.RandomState(0).randn(2, 3, 6).astype(np.float32))
        out = np.array(positional_encoding(pos, freqs=2))
        assert out.shape == (2, 3, 24)
        p = np.array(pos)
        scaled = np.stack([p * 1.0, p * 2.0], axis=-1).reshape(2, 3, 12)
        want = np.concatenate([np.sin(scaled), np.cos(scaled)], axis=-1)
        np.testing.assert_allclose(out, want, atol=1e-6)


class TestEncoderPolicy:
    def test_shapes_and_param_counts(self):
        model, variables = init_policy(ModelConfig(), jax.random.PRNGKey(0))
        obs = jnp.zeros((4, spec.OBS_DIM))
        out = model.apply(variables, obs, train=False)
        assert out.logits.shape == (4, spec.NUM_LOGITS)
        assert out.value.shape == (4,)
        p = variables["params"]
        enc = p["encoder"]
        # reference layer sizes (hybrid_encoder.py:31-54)
        assert enc["pose_fc1"]["kernel"].shape == (2400, 256)
        assert enc["pose_fc2"]["kernel"].shape == (256, 256)
        assert enc["grid_fc"]["kernel"].shape == (1024, 256)
        assert enc["fuse_fc"]["kernel"].shape == (512, 256)
        assert p["action_net"]["kernel"].shape == (256, 240)
        assert p["value_net"]["kernel"].shape == (256, 1)

    def test_state_rgb_slice_is_dead(self):
        """The encoder must ignore obs[:, 8600:] (hybrid_encoder.py:83)."""
        model, variables = init_policy(ModelConfig(), jax.random.PRNGKey(0))
        rng = np.random.RandomState(1)
        obs = rng.randn(3, spec.OBS_DIM).astype(np.float32)
        obs2 = obs.copy()
        obs2[:, spec.STATE_DIM + spec.GRID_DIM :] = 123.0
        o1 = model.apply(variables, jnp.asarray(obs), train=False)
        o2 = model.apply(variables, jnp.asarray(obs2), train=False)
        np.testing.assert_allclose(np.array(o1.logits), np.array(o2.logits))

    def test_batchnorm_train_eval_modes(self):
        model, variables = init_policy(ModelConfig(), jax.random.PRNGKey(0))
        obs = jnp.asarray(np.random.RandomState(2).randn(8, spec.OBS_DIM), jnp.float32)
        out_eval = model.apply(variables, obs, train=False)
        out_train, mutated = model.apply(variables, obs, train=True, mutable=["batch_stats"])
        # train mode must update running stats
        before = jax.tree.leaves(variables["batch_stats"])
        after = jax.tree.leaves(mutated["batch_stats"])
        changed = any(
            not np.allclose(np.array(a), np.array(b)) for a, b in zip(before, after)
        )
        assert changed


class TestMultiCategorical:
    def test_logprob_matches_manual(self):
        rng = np.random.RandomState(3)
        logits = jnp.asarray(rng.randn(5, spec.NUM_LOGITS).astype(np.float32))
        actions = jnp.asarray(
            np.stack([rng.randint(0, n, 5) for n in spec.NVEC], axis=-1), jnp.int32
        )
        got = np.array(distributions.log_prob(logits, actions))
        # manual
        want = np.zeros(5)
        off = 0
        ln = np.array(logits)
        for i, n in enumerate(spec.NVEC):
            comp = ln[:, off : off + n]
            lsm = comp - np.log(np.exp(comp - comp.max(-1, keepdims=True)).sum(-1, keepdims=True)) - comp.max(-1, keepdims=True)
            want += lsm[np.arange(5), np.array(actions)[:, i]]
            off += n
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_entropy_uniform(self):
        logits = jnp.zeros((1, spec.NUM_LOGITS))
        ent = float(distributions.entropy(logits)[0])
        want = sum(np.log(n) for n in spec.NVEC)
        assert ent == pytest.approx(want, rel=1e-4)

    def test_sample_bounds_and_mode(self):
        rng = np.random.RandomState(4)
        logits = jnp.asarray(rng.randn(64, spec.NUM_LOGITS).astype(np.float32))
        a = np.array(distributions.sample(logits, jax.random.PRNGKey(0)))
        assert (a >= 0).all()
        assert (a < np.array(spec.NVEC)[None]).all()
        assert (a[:, 3] == 0).all()  # roll component has a single choice
        m = np.array(distributions.mode(logits))
        assert (m < np.array(spec.NVEC)[None]).all()

    def test_sample_distribution_skew(self):
        logits = np.zeros((1, spec.NUM_LOGITS), np.float32)
        logits[0, 0] = 10.0  # heavily favour x-index 0 (p ~ e^10/(e^10+80) = 0.996)
        draws = np.array(
            distributions.sample(
                jnp.tile(jnp.asarray(logits), (2000, 1)), jax.random.PRNGKey(1)
            )
        )
        assert (draws[:, 0] == 0).mean() > 0.9


def test_nature_cnn_and_cnn_policy():
    import jax
    import jax.numpy as jnp
    from gennbv_tpu.models.torso import CnnPolicy, MlpTorso, NatureCNN

    imgs = jnp.zeros((2, 84, 84, 4))
    cnn = NatureCNN(features_dim=128)
    p = cnn.init(jax.random.PRNGKey(0), imgs)["params"]
    out = cnn.apply({"params": p}, imgs)
    assert out.shape == (2, 128)

    pol = CnnPolicy(num_logits=6, features_dim=64, net_arch=(32,))
    v = pol.init(jax.random.PRNGKey(1), imgs)
    o = pol.apply(v, imgs)
    assert o.logits.shape == (2, 6) and o.value.shape == (2,)

    # net_arch=[] identity passthrough (MlpExtractor semantics)
    t = MlpTorso(())
    x = jnp.ones((3, 7))
    pt = t.init(jax.random.PRNGKey(2), x)
    assert (t.apply(pt, x) == x).all()
