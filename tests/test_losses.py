"""Loss stack golden tests vs independent torch formulations (torch CPU is
available in the image; these mirror the published loss definitions, they
are written fresh — see haff_tpu/model/losses.py docstrings)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from haff_tpu.model import losses as L


def torch_dice(inputs, targets, num_masks, scale=1000, eps=1e-6):
    inputs = torch.sigmoid(inputs).flatten(1, 2)
    targets = targets.flatten(1, 2)
    numerator = 2 * (inputs / scale * targets).sum(-1)
    denominator = (inputs / scale).sum(-1) + (targets / scale).sum(-1)
    loss = 1 - (numerator + eps) / (denominator + eps)
    return (loss.sum() / (num_masks + 1e-8)).item()


def torch_bce(inputs, targets, num_masks):
    loss = F.binary_cross_entropy_with_logits(inputs, targets,
                                              reduction="none")
    return (loss.flatten(1, 2).mean(1).sum() / (num_masks + 1e-8)).item()


def test_dice_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(3, 16, 16).astype(np.float32) * 3
    t = (rng.rand(3, 16, 16) > 0.7).astype(np.float32)
    ours = float(L.dice_loss(jnp.asarray(x), jnp.asarray(t), 3))
    ref = torch_dice(torch.tensor(x), torch.tensor(t), 3)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_bce_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(3, 16, 16).astype(np.float32) * 3
    t = (rng.rand(3, 16, 16) > 0.7).astype(np.float32)
    ours = float(L.sigmoid_ce_loss(jnp.asarray(x), jnp.asarray(t), 3))
    ref = torch_bce(torch.tensor(x), torch.tensor(t), 3)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_lm_loss_matches_torch():
    rng = np.random.RandomState(2)
    logits = rng.randn(2, 10, 50).astype(np.float32)
    labels = rng.randint(0, 50, (2, 10)).astype(np.int32)
    labels[0, :4] = -100
    ours = float(L.language_model_loss(jnp.asarray(logits),
                                       jnp.asarray(labels)))
    sl = torch.tensor(logits)[:, :-1].reshape(-1, 50)
    st = torch.tensor(labels.astype(np.int64))[:, 1:].reshape(-1)
    ref = F.cross_entropy(sl, st, ignore_index=-100).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_taxonomy_double_softmax_quirk():
    """CrossEntropyLoss over already-softmaxed probs with soft targets."""
    rng = np.random.RandomState(3)
    probs = np.abs(rng.rand(4, 4).astype(np.float32))
    probs /= probs.sum(-1, keepdims=True)
    gt = np.eye(4, dtype=np.float32)
    ours = float(L.taxonomy_ce_loss(jnp.asarray(probs), jnp.asarray(gt)))
    ref = torch.nn.CrossEntropyLoss()(torch.tensor(probs),
                                      torch.tensor(gt)).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_taxonomy_logit_ce_matches_ce_on_logits():
    """logit_ce=True computes -sum(t*log(softmax(z))) from the PROBS the
    head returns — value AND gradient w.r.t. the pre-softmax logits must
    match torch CrossEntropyLoss on z directly (the single-softmax path
    that breaks the double-softmax gradient trap)."""
    rng = np.random.RandomState(7)
    z = rng.randn(5, 4).astype(np.float32) * 3.0
    gt = np.eye(4, dtype=np.float32)[rng.randint(0, 4, size=5)]

    def loss_from_logits(zj):
        probs = jax.nn.softmax(zj, -1)
        return L.taxonomy_ce_loss(probs, jnp.asarray(gt), logit_ce=True)

    ours, ours_grad = jax.value_and_grad(loss_from_logits)(jnp.asarray(z))
    zt = torch.tensor(z, requires_grad=True)
    ref = torch.nn.CrossEntropyLoss()(zt, torch.tensor(gt))
    ref.backward()
    np.testing.assert_allclose(float(ours), ref.item(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_grad),
                               zt.grad.numpy(), atol=1e-5)


def test_taxonomy_logit_ce_gradient_not_trapped():
    """With a saturated head (one class near prob 1), the double-softmax
    Jacobian vanishes while the logit CE keeps a healthy softmax(z)-t
    gradient — the round-4 left-class collapse mechanism."""
    z = jnp.asarray([[8.0, 0.0, 0.0, 0.0]], jnp.float32)  # saturated wrong
    gt = jnp.asarray([[0.0, 1.0, 0.0, 0.0]], jnp.float32)

    def g(logit_ce):
        def f(zj):
            return L.taxonomy_ce_loss(jax.nn.softmax(zj, -1), gt,
                                      logit_ce=logit_ce)
        return np.abs(np.asarray(jax.grad(f)(z))).max()

    assert g(True) > 0.9          # ~|softmax - t| at the target class
    assert g(False) < g(True) / 10  # double softmax: vanishing signal


def test_taxonomy_gating_weights():
    """left gate = tax0 + tax2 + tax3; right gate = tax1 + tax2 + tax3
    (reference LISA.py:359-372): a right-hand-only sample (tax=[0,1,0,0])
    zeroes the left prediction entirely -> left losses see empty masks."""
    rng = np.random.RandomState(4)
    pred = jnp.asarray(rng.randn(1, 8, 8).astype(np.float32))
    gt_zero = jnp.zeros((1, 8, 8))
    tax_right_only = jnp.asarray(np.array([[0, 1, 0, 0]], np.float32))
    bce, dice = L.bimanual_mask_losses(
        pred, pred, gt_zero, gt_zero, tax_right_only)
    # gated-left pred is all-zero logits vs zero gt -> bce = log(2) per px
    # for left; right is ungated so differs. Just check finiteness + gate:
    bce2, dice2 = L.bimanual_mask_losses(
        pred * 100, pred, gt_zero, gt_zero, tax_right_only)
    # scaling LEFT pred by 100 changes nothing (left gate is 0)...
    w_left_bce_delta = float(bce2 - bce)
    np.testing.assert_allclose(w_left_bce_delta, 0.0, atol=1e-6)
