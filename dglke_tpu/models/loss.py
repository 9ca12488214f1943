"""Loss subsystem: pointwise / pairwise criteria + LossGenerator.

Mirrors the reference semantics
(/root/reference/python/dglke/models/base_loss.py and pytorch/loss.py):

  * Hinge:      max(0, margin - l * score),   l in {-1, +1}
  * Logistic:   softplus(-l * score)
  * Logsigmoid: -logsigmoid(l * score)
  * BCE:        -(l*log(sigmoid(s)) + (1-l)*log(1-sigmoid(s))), l in {0, 1}

get_total_loss (loss.py:69-98):
  pairwise:  mean(L(pos - neg, +1) * w)
  pointwise: pos_loss = mean(L(pos, +1) * w)
             neg_loss = self-adversarial? sum(softmax(neg*T).stop_grad * Lneg, -1)
                        else mean(Lneg, -1);  then mean over batch
             loss = (pos_loss + neg_loss) / 2
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _criterion(genre: str, margin: float):
    if genre == "Hinge":
        return lambda score, label: jnp.maximum(margin - label * score, 0.0)
    if genre == "Logistic":
        return lambda score, label: jax.nn.softplus(-label * score)
    if genre == "Logsigmoid":
        return lambda score, label: -jax.nn.log_sigmoid(label * score)
    if genre == "BCE":
        # Stable form: log(1 - sigmoid(s)) == log_sigmoid(-s).  The
        # reference computes th.log(1 - th.sigmoid(score)) directly
        # (loss.py BCELoss), which saturates to -inf at score ~ 18 in
        # fp32 and NaN-poisons the positive arm (0 * -inf); documented
        # numerical fix, identical value where the reference is finite.
        return lambda score, label: -(
            label * jax.nn.log_sigmoid(score)
            + (1.0 - label) * jax.nn.log_sigmoid(-score)
        )
    raise ValueError(f"loss genre {genre} is not supported")


@dataclasses.dataclass(frozen=True)
class LossGenerator:
    loss_genre: str = "Logsigmoid"
    neg_adversarial_sampling: bool = False
    adversarial_temperature: float = 1.0
    pairwise: bool = False
    margin: float = 1.0

    def __post_init__(self):
        if self.pairwise and self.neg_adversarial_sampling:
            raise ValueError("pairwise loss is incompatible with adversarial negative sampling")
        if self.pairwise and self.loss_genre not in ("Logistic", "Hinge"):
            raise ValueError(
                f"{self.loss_genre} loss cannot be applied to pairwise loss")
        _criterion(self.loss_genre, self.margin)  # validate genre eagerly

    @property
    def neg_label(self) -> float:
        return 0.0 if self.loss_genre == "BCE" else -1.0

    def get_total_loss(self, pos_score: jnp.ndarray, neg_score: jnp.ndarray,
                       edge_weight=None):
        """pos_score: [B]; neg_score: [B, K] (chunk-flattened so that row i
        holds the scores of positive i against its chunk's K shared
        negatives); edge_weight: optional [B].

        Returns (loss scalar, log dict of scalars).
        """
        crit = _criterion(self.loss_genre, self.margin)
        log = {}
        if edge_weight is None:
            w = 1.0
        else:
            w = edge_weight.reshape(-1, 1)

        if self.pairwise:
            loss = jnp.mean(crit(pos_score[:, None] - neg_score, 1.0) * w)
            log["loss"] = loss
            return loss, log

        # DELIBERATE fix vs the reference: its positive term multiplies a
        # [B] loss by a [B,1] weight (pytorch/loss.py:82), broadcasting to
        # [B,B] so th.mean degenerates to mean(crit)*mean(w) — a uniform
        # global scale instead of per-edge weighting (its negative term
        # broadcasts correctly).  We weight each positive by its own edge.
        pos_loss = crit(pos_score, 1.0) * (w if edge_weight is None else w[:, 0])
        neg_loss = crit(neg_score, self.neg_label) * w

        if self.neg_adversarial_sampling:
            adv = jax.lax.stop_gradient(
                jax.nn.softmax(neg_score * self.adversarial_temperature,
                               axis=-1))
            neg_loss = jnp.sum(adv * neg_loss, axis=-1)
        else:
            neg_loss = jnp.mean(neg_loss, axis=-1)

        neg_loss = jnp.mean(neg_loss)
        pos_loss = jnp.mean(pos_loss)
        loss = (pos_loss + neg_loss) / 2.0
        log["pos_loss"] = pos_loss
        log["neg_loss"] = neg_loss
        log["loss"] = loss
        return loss, log


def regularization(coef: float, norm_ord: int, tensors):
    """coef * sum_i ||x_i||_p^p over the gathered (traced) rows, matching
    general_models.py:572-576 with norm = lambda x, p: x.norm(p)**p."""
    total = 0.0
    for x in tensors:
        total = total + jnp.sum(jnp.abs(x) ** norm_ord)
    return coef * total
