"""Shared matcher NLL losses, reference-exact.

Two clamp conventions coexist in the reference and both must be preserved:

  * LightGlue's ``NLLLoss``/``weight_loss`` (reference
    ``models/utils/losses.py:6-60``) clamps the negative counts of EACH side
    to >=1 separately before summing the denominators, and reports
    ``num_unmatchable = (num_neg0 + num_neg1) / 2``.
  * SuperGlue (reference ``gluefactory_nonfree/superglue.py:322-352``) and
    GlueStick (reference ``models/matchers/gluestick.py:378-416``) clamp the
    SUM ``neg0 + neg1`` to >=1 and report the clamped sum.

Both return per-sample ``(B,)`` vectors of the positive/negative NLL
components plus the matchable/unmatchable statistics the reference logs as
training-health signals.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["nll_components", "masked_row_norm"]


def nll_components(
    log_assignment,
    gt_assignment,
    gt_matches0,
    gt_matches1,
    per_side_clamp: bool,
):
    """NLL of a (B, M+1, N+1) log assignment against GT.

    Returns ``(nll_pos, nll_neg, num_matchable, num_unmatchable)``, all
    shape (B,).  ``per_side_clamp=True`` follows LightGlue's ``weight_loss``
    (reference ``losses.py:6-25``); ``False`` follows the SuperGlue /
    GlueStick formula (clamp the summed negative count).
    """
    gt = gt_assignment.astype(log_assignment.dtype)
    M, N = gt.shape[1], gt.shape[2]
    num_pos = jnp.maximum(gt.sum((-1, -2)), 1.0)
    nll_pos = -(log_assignment[:, :M, :N] * gt).sum((-1, -2)) / num_pos

    neg0 = (gt_matches0 == -1).astype(log_assignment.dtype)
    neg1 = (gt_matches1 == -1).astype(log_assignment.dtype)
    nll_neg0 = -(log_assignment[:, :M, N] * neg0).sum(-1)
    nll_neg1 = -(log_assignment[:, M, :N] * neg1).sum(-1)
    if per_side_clamp:
        num_neg0 = jnp.maximum(neg0.sum(-1), 1.0)
        num_neg1 = jnp.maximum(neg1.sum(-1), 1.0)
        nll_neg = (nll_neg0 + nll_neg1) / (num_neg0 + num_neg1)
        num_unmatchable = (num_neg0 + num_neg1) / 2.0
    else:
        num_unmatchable = jnp.maximum(neg0.sum(-1) + neg1.sum(-1), 1.0)
        nll_neg = (nll_neg0 + nll_neg1) / num_unmatchable
    return nll_pos, nll_neg, num_pos, num_unmatchable


def masked_row_norm(log_assignment, mask=None):
    """Mean total row probability mass of the non-dustbin rows: the
    reference's ``row_norm`` / ``sinkhorn_norm`` training-health diagnostic
    (``lightglue.py:595``, ``gluestick.py:408-411``:
    ``log_assignment.exp()[:, :-1].sum(2).mean(1)``).

    With padded keypoint sets the masked rows carry ~zero mass and would
    dilute the unmasked mean toward 0, so the mean is taken over real rows
    when a mask is given (equal to the reference value when nothing is
    padded)."""
    row_sums = jnp.exp(log_assignment[:, :-1].astype(jnp.float32)).sum(2)  # (B, M)
    if mask is None:
        return row_sums.mean(1)
    m = mask.astype(row_sums.dtype)
    return (row_sums * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
