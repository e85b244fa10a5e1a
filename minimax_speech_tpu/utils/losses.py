"""Losses: label-smoothing CE, accuracy, DPO, GAN losses.

References: speech/cosyvoice/transformer/label_smoothing_loss.py:21-108,
speech/cosyvoice/utils/losses.py:6-57, speech/cosyvoice/utils/common.py
(th_accuracy).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE_ID = -1


def label_smoothing_ce(logits: jnp.ndarray, targets: jnp.ndarray,
                       smoothing: float = 0.0,
                       normalize_length: bool = True) -> jnp.ndarray:
    """KL(smoothed one-hot || softmax) summed, normalized by tokens or batch.

    logits: (B, T, V); targets: (B, T) with IGNORE_ID on padding.
    Matches LabelSmoothingLoss semantics (reference:
    label_smoothing_loss.py:63-108)."""
    v = logits.shape[-1]
    valid = targets != IGNORE_ID
    t_safe = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    confidence = 1.0 - smoothing
    low = smoothing / (v - 1)
    # KL(true || pred) = sum true*log true - sum true*logp; the reference
    # uses torch KLDivLoss which omits nothing — but with smoothing=0 the
    # entropy term is 0 and this reduces to CE.
    nll = -jnp.take_along_axis(logp, t_safe[..., None], axis=-1)[..., 0]
    if smoothing > 0:
        # KL form: conf*nll + low*sum_{j != t}(-logp_j) + entropy-of-true
        smooth_term = -jnp.sum(logp, axis=-1)
        ent = (confidence * jnp.log(jnp.maximum(confidence, 1e-20))
               + (v - 1) * low * jnp.log(jnp.maximum(low, 1e-20)))
        loss_tok = confidence * nll + low * (smooth_term - nll) + ent
    else:
        loss_tok = nll
    loss_tok = jnp.where(valid, loss_tok, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1) if normalize_length \
        else logits.shape[0]
    return jnp.sum(loss_tok) / denom


def accuracy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Fraction of correct argmax predictions over non-ignored positions
    (reference: utils/common.py th_accuracy)."""
    valid = targets != IGNORE_ID
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == targets) & valid
    return jnp.sum(correct) / jnp.maximum(jnp.sum(valid), 1)


def dpo_loss(chosen_logp: jnp.ndarray, rejected_logp: jnp.ndarray,
             ref_chosen_logp: jnp.ndarray, ref_rejected_logp: jnp.ndarray,
             beta: float = 0.01, label_smoothing: float = 0.0,
             ipo: bool = False):
    """Sigmoid (or IPO) DPO loss over sequence log-probs
    (reference: utils/losses.py:24-57). Returns (loss, chosen_reward,
    rejected_reward)."""
    chosen_ratio = chosen_logp - ref_chosen_logp
    rejected_ratio = rejected_logp - ref_rejected_logp
    diff = chosen_ratio - rejected_ratio
    if ipo:
        loss = jnp.mean((diff - 1.0 / (2 * beta)) ** 2)
    else:
        loss = jnp.mean(
            -jax.nn.log_sigmoid(beta * diff) * (1 - label_smoothing)
            - jax.nn.log_sigmoid(-beta * diff) * label_smoothing)
    return loss, beta * chosen_ratio, beta * rejected_ratio


# --- GAN losses (HiFT / DAC training) --------------------------------------

def discriminator_loss(real_outputs, fake_outputs):
    """LSGAN discriminator loss (reference: matcha/hifigan + dac loss.py)."""
    loss = 0.0
    for dr, df in zip(real_outputs, fake_outputs):
        loss = loss + jnp.mean((1.0 - dr) ** 2) + jnp.mean(df ** 2)
    return loss


def generator_adv_loss(fake_outputs):
    loss = 0.0
    for df in fake_outputs:
        loss = loss + jnp.mean((1.0 - df) ** 2)
    return loss


def feature_matching_loss(real_feats, fake_feats):
    loss = 0.0
    for fr, ff in zip(real_feats, fake_feats):
        for r, f in zip(fr, ff):
            loss = loss + jnp.mean(jnp.abs(r - f))
    return loss


def tpr_loss(real_outputs, fake_outputs, tau: float = 0.04):
    """Truncated pointwise relativistic loss (reference:
    cosyvoice/utils/losses.py:6-12).

    Per pair: L_rel = mean of ((dr-dg) - median(dr-dg))^2 over only the
    elements where dr - dg < median (the "generated beats real" subset),
    truncated from above at tau via tau - relu(tau - L_rel) so gradient
    flows when L_rel < tau and is clipped beyond."""
    loss = 0.0
    for dr, df in zip(real_outputs, fake_outputs):
        d = dr - df
        m_dg = jnp.median(d)
        mask = d < m_dg
        sq = (d - m_dg) ** 2
        l_rel = jnp.sum(jnp.where(mask, sq, 0.0)) / jnp.maximum(
            jnp.sum(mask), 1)
        loss = loss + (tau - jax.nn.relu(tau - l_rel))
    return loss


def kl_loss(mu: jnp.ndarray, logs: jnp.ndarray) -> jnp.ndarray:
    """VAE KL to standard normal per element (reference: dac-vae/loss.py:371)."""
    return jnp.mean(0.5 * (mu ** 2 + jnp.exp(2 * logs) - 2 * logs - 1.0))
