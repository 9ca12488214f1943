"""LossGenerator parity tests against hand-written numpy formulas
(reference: /root/reference/python/dglke/models/pytorch/loss.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dglke_tpu.models.loss import LossGenerator, regularization


def _softplus(x):
    return np.logaddexp(0.0, x)


def _logsigmoid(x):
    return -_softplus(-x)


RNG = np.random.RandomState(0)
POS = RNG.randn(6).astype(np.float32)
NEG = RNG.randn(6, 4).astype(np.float32)
W = np.abs(RNG.randn(6)).astype(np.float32) + 0.1


def test_logsigmoid_loss():
    gen = LossGenerator(loss_genre="Logsigmoid")
    loss, log = gen.get_total_loss(jnp.asarray(POS), jnp.asarray(NEG))
    pos_loss = np.mean(-_logsigmoid(POS))
    neg_loss = np.mean(np.mean(-_logsigmoid(-NEG), axis=-1))
    np.testing.assert_allclose(float(loss), (pos_loss + neg_loss) / 2,
                               rtol=1e-5)
    assert set(log) == {"pos_loss", "neg_loss", "loss"}


def test_self_adversarial():
    temp = 0.7
    gen = LossGenerator(loss_genre="Logsigmoid",
                        neg_adversarial_sampling=True,
                        adversarial_temperature=temp)
    loss, _ = gen.get_total_loss(jnp.asarray(POS), jnp.asarray(NEG))
    e = np.exp(NEG * temp - np.max(NEG * temp, axis=-1, keepdims=True))
    soft = e / e.sum(axis=-1, keepdims=True)
    neg_loss = np.mean(np.sum(soft * -_logsigmoid(-NEG), axis=-1))
    pos_loss = np.mean(-_logsigmoid(POS))
    np.testing.assert_allclose(float(loss), (pos_loss + neg_loss) / 2,
                               rtol=1e-5)


def test_hinge_loss():
    gen = LossGenerator(loss_genre="Hinge", margin=2.0)
    loss, _ = gen.get_total_loss(jnp.asarray(POS), jnp.asarray(NEG))
    pos_loss = np.mean(np.maximum(2.0 - POS, 0))
    neg_loss = np.mean(np.mean(np.maximum(2.0 + NEG, 0), axis=-1))
    np.testing.assert_allclose(float(loss), (pos_loss + neg_loss) / 2,
                               rtol=1e-5)


def test_logistic_loss():
    gen = LossGenerator(loss_genre="Logistic")
    loss, _ = gen.get_total_loss(jnp.asarray(POS), jnp.asarray(NEG))
    pos_loss = np.mean(_softplus(-POS))
    neg_loss = np.mean(np.mean(_softplus(NEG), axis=-1))
    np.testing.assert_allclose(float(loss), (pos_loss + neg_loss) / 2,
                               rtol=1e-5)


def test_bce_loss():
    gen = LossGenerator(loss_genre="BCE")
    loss, _ = gen.get_total_loss(jnp.asarray(POS), jnp.asarray(NEG))

    def sigmoid(x):
        return 1.0 / (1.0 + np.exp(-x))

    pos_loss = np.mean(-np.log(sigmoid(POS)))
    neg_loss = np.mean(np.mean(-np.log(1 - sigmoid(NEG)), axis=-1))
    np.testing.assert_allclose(float(loss), (pos_loss + neg_loss) / 2,
                               rtol=1e-4)


def test_bce_loss_stable_at_large_scores():
    """The naive 1-sigmoid form (the reference's BCELoss,
    pytorch/loss.py:31) saturates at |score| ~ 18 in fp32: inf loss on
    negatives, 0 * -inf = NaN on positives, NaN gradients that poison
    the table via Adagrad.  The log_sigmoid(-s) form must stay finite
    (same value where the reference is finite — covered by
    test_bce_loss above)."""
    import jax

    gen = LossGenerator(loss_genre="BCE")
    big_pos = jnp.asarray([25.0, 40.0])
    big_neg = jnp.asarray([[25.0, -40.0], [40.0, 30.0]])

    def total(p, n):
        loss, _ = gen.get_total_loss(p, n)
        return loss

    loss = total(big_pos, big_neg)
    assert np.isfinite(float(loss)), loss
    g = jax.grad(total, argnums=(0, 1))(big_pos, big_neg)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in g), g


def test_pairwise_loss():
    gen = LossGenerator(loss_genre="Hinge", margin=1.0, pairwise=True)
    loss, _ = gen.get_total_loss(jnp.asarray(POS), jnp.asarray(NEG))
    want = np.mean(np.maximum(1.0 - (POS[:, None] - NEG), 0))
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


def test_edge_weight():
    gen = LossGenerator(loss_genre="Logsigmoid")
    loss, _ = gen.get_total_loss(jnp.asarray(POS), jnp.asarray(NEG),
                                 jnp.asarray(W))
    pos_loss = np.mean(-_logsigmoid(POS) * W)
    neg_loss = np.mean(np.mean(-_logsigmoid(-NEG) * W[:, None], axis=-1))
    np.testing.assert_allclose(float(loss), (pos_loss + neg_loss) / 2,
                               rtol=1e-5)


def test_invalid_combinations():
    with pytest.raises(ValueError):
        LossGenerator(pairwise=True, neg_adversarial_sampling=True,
                      loss_genre="Hinge")
    with pytest.raises(ValueError):
        LossGenerator(pairwise=True, loss_genre="Logsigmoid")
    with pytest.raises(ValueError):
        LossGenerator(loss_genre="nope")


def test_regularization():
    xs = [jnp.asarray(POS.reshape(2, 3)), jnp.asarray(NEG)]
    got = float(regularization(1e-3, 3, xs))
    want = 1e-3 * (np.sum(np.abs(POS) ** 3) + np.sum(np.abs(NEG) ** 3))
    np.testing.assert_allclose(got, want, rtol=1e-5)
