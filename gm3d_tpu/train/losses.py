"""Loss functions for pretraining (Point-MAE Chamfer, GM3D dual-objective,
learning-loss) and fine-tuning (CE with optional smoothing)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from gm3d_tpu.models.pointmae import take_groups
from gm3d_tpu.ops.chamfer import chamfer_group, chamfer_l1, chamfer_l2


def pointmae_reconstruction_loss(rebuild: jax.Array, gt: jax.Array, loss_type: str = "cdl2"):
    """Scalar reconstruction loss over all masked patches
    (``models/Point_MAE.py:423-426``; type from config ``model.loss``:
    cdl1 / cdl2 / emd — emd existed only as an uninstalled extension in the
    reference, SURVEY.md §2.3)."""
    batch, num_mask, group_size, _ = rebuild.shape
    a = rebuild.reshape(batch * num_mask, group_size, 3).astype(jnp.float32)
    b = gt.reshape(batch * num_mask, group_size, 3).astype(jnp.float32)
    if loss_type == "cdl1":
        return chamfer_l1(a, b)
    if loss_type == "emd":
        from gm3d_tpu.ops.emd import emd_loss

        return jnp.mean(emd_loss(a, b))
    return chamfer_l2(a, b)


def gm3d_feature_loss(
    pred_masked: jax.Array,
    teacher_feats: jax.Array,
    mask_idx: jax.Array,
    point_target: jax.Array,
    point_reco: jax.Array,
) -> Dict[str, jax.Array]:
    """GM3D feature-mode loss (``...feature_besed.py:976-1003`` forward_loss).

    pred_masked:   (B, M, D) student decoder features at masked slots
    teacher_feats: (B, G, D) frozen-teacher encoder features (full cloud)
    mask_idx:      (B, M) masked group indices (original order)
    point_target:  (B, G, S, 3) teacher-decoded patches from teacher features
    point_reco:    (B, M, S, 3) teacher-decoded patches from student features
                   (STOP-GRADIENTED by the caller: the reference computes this
                   branch under torch.no_grad(),
                   ``engine_pretrain_Classifier_SVM.py:141-147``, so the
                   Chamfer term shapes the loss value / matrix but NOT the
                   reconstruction gradient)
    """
    target = take_groups(teacher_feats, mask_idx)  # (B, M, D)
    pred_n = pred_masked.astype(jnp.float32)
    pred_n = pred_n / jnp.maximum(jnp.linalg.norm(pred_n, axis=-1, keepdims=True), 1e-12)
    targ_n = target.astype(jnp.float32)
    targ_n = targ_n / jnp.maximum(jnp.linalg.norm(targ_n, axis=-1, keepdims=True), 1e-12)
    loss_mse = jnp.sum((pred_n - targ_n) ** 2, axis=-1)  # (B, M)

    pt_masked = take_groups(point_target, mask_idx).astype(jnp.float32)  # (B, M, S, 3)
    loss_chamfer = chamfer_group(point_reco.astype(jnp.float32), pt_masked)  # (B, M)

    matrix = loss_mse + loss_chamfer
    return {
        "MSE_mean": jnp.mean(loss_mse),
        "Chamfer_mean": jnp.mean(loss_chamfer),
        "matrix": matrix,
    }


def gm3d_usual_loss(
    rebuild_masked: jax.Array, neighborhood: jax.Array, mask_idx: jax.Array
) -> Dict[str, jax.Array]:
    """GM3D usual-mode loss: per-group Chamfer only, MSE zeroed
    (``models_mae_learn_loss_Classifier_SVM.py:967-982``).

    rebuild_masked: (B, M, 3*S) coordinate predictions at masked slots.
    neighborhood:   (B, G, S, 3) center-normalised ground-truth patches.
    """
    batch, num_mask, _ = rebuild_masked.shape
    group_size = neighborhood.shape[2]
    pred = rebuild_masked.reshape(batch, num_mask, group_size, 3).astype(jnp.float32)
    gt = take_groups(neighborhood, mask_idx).astype(jnp.float32)
    loss_chamfer = chamfer_group(pred, gt)
    return {
        "MSE_mean": jnp.zeros(()),
        "Chamfer_mean": jnp.mean(loss_chamfer),
        "matrix": loss_chamfer,
    }


def gm3d_separated_loss(
    pred_masked: jax.Array,
    teacher_feats: jax.Array,
    mask_idx: jax.Array,
    rebuild_masked: jax.Array,
    neighborhood: jax.Array,
) -> Dict[str, jax.Array]:
    """Separated-engine loss composition (the "MLP IN Model" ``forward_loss``
    call, ``engine_pretrain_Classifier_SVM.py:462-469``): normalized feature
    MSE vs the frozen teacher PLUS per-group Chamfer between the student's
    OWN rebuilt coordinates (``outs['point_pred']``) and the ground-truth
    neighborhood. Unlike the shared path, the teacher decoder replay is NOT
    used and the Chamfer term is inside the grad path (not no_grad), so it
    back-propagates into the coordinate head / decoder / encoder.

    pred_masked:    (B, M, D) student decoder features at masked slots
    teacher_feats:  (B, G, D) frozen-teacher features (stop-gradient by caller)
    rebuild_masked: (B, M, 3*S) student coordinate predictions at masked slots
    neighborhood:   (B, G, S, 3) center-normalised ground-truth patches
    """
    target = take_groups(teacher_feats, mask_idx)
    pred_n = pred_masked.astype(jnp.float32)
    pred_n = pred_n / jnp.maximum(jnp.linalg.norm(pred_n, axis=-1, keepdims=True), 1e-12)
    targ_n = target.astype(jnp.float32)
    targ_n = targ_n / jnp.maximum(jnp.linalg.norm(targ_n, axis=-1, keepdims=True), 1e-12)
    loss_mse = jnp.sum((pred_n - targ_n) ** 2, axis=-1)  # (B, M)

    batch, num_mask, _ = rebuild_masked.shape
    group_size = neighborhood.shape[2]
    pred = rebuild_masked.reshape(batch, num_mask, group_size, 3).astype(jnp.float32)
    gt = take_groups(neighborhood, mask_idx).astype(jnp.float32)
    loss_chamfer = chamfer_group(pred, gt)  # (B, M)

    matrix = loss_mse + loss_chamfer
    return {
        "MSE_mean": jnp.mean(loss_mse),
        "Chamfer_mean": jnp.mean(loss_chamfer),
        "matrix": matrix,
    }


def relative_learning_loss(loss_pred: jax.Array, loss_target: jax.Array) -> jax.Array:
    """Pairwise relative loss-ordering BCE
    (``...feature_besed.py:1111-1130`` forward_learning_loss, relative=True —
    the reference default ``--relative``).

    loss_pred, loss_target: (B, M) at masked slots.
    """
    pred = loss_pred.astype(jnp.float32)
    target = loss_target.astype(jnp.float32)
    pos = (target[:, :, None] > target[:, None, :]).astype(jnp.float32)
    neg = (target[:, :, None] < target[:, None, :]).astype(jnp.float32)
    diff = pred[:, :, None] - pred[:, None, :]
    sig = jax.nn.sigmoid(diff)
    loss = -pos * jnp.log(sig + 1e-6) - neg * jnp.log(1.0 - sig + 1e-6)
    valid = jnp.maximum(jnp.sum(pos + neg), 1.0)
    return jnp.sum(loss) / valid


def mse_learning_loss(loss_pred: jax.Array, loss_target: jax.Array) -> jax.Array:
    """Per-row-normalised MSE variant (``...feature_besed.py:1132-1140``)."""
    target = loss_target.astype(jnp.float32)
    mean = jnp.mean(target, axis=1, keepdims=True)
    # torch.Tensor.var defaults to the UNBIASED estimator (correction=1)
    var = jnp.var(target, axis=1, keepdims=True, ddof=1)
    target = (target - mean) / jnp.sqrt(var + 1e-6)
    return jnp.mean((loss_pred.astype(jnp.float32) - target) ** 2)


def classification_loss(
    logits: jax.Array, labels: jax.Array, smoothing: float = 0.0
) -> Tuple[jax.Array, jax.Array]:
    """CE loss + accuracy (``models/Point_MAE.py:505-509`` get_loss_acc)."""
    num_classes = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, num_classes)
    if smoothing > 0.0:
        one_hot = one_hot * (1.0 - smoothing) + smoothing / num_classes
    loss = jnp.mean(optax.softmax_cross_entropy(logits.astype(jnp.float32), one_hot))
    acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32)) * 100.0
    return loss, acc
