"""Losses for all training stages.

Parity target: mmsr/models/losses.py and loss_utils.py. Pixel losses keep
the weighted/masked reduction semantics (@masked_loss, loss_utils.py:58-96);
GANLoss covers vanilla/lsgan/wgan/hinge (losses.py:275-363);
GradientPenaltyLoss is the WGAN-GP interpolate + grad-norm penalty
(losses.py:366-428) expressed with jax.grad (grad-of-grad works because
every op in the discriminator is twice-differentiable); PerceptualLoss
supports l1/l2/fro criteria incl. the fro variant used by the stage-3 GAN
config (stage3_restoration_gan.yml:91-99).
"""
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import LOSS_REGISTRY
from .archs.vgg_arch import VGGFeatureExtractor

_REDUCTIONS = ('none', 'mean', 'sum')


def _reduce(loss, weight, reduction):
    """Weighted masked reduction (loss_utils.py:26-55): with an elementwise
    weight, 'mean' divides by the weight sum (masked mean)."""
    if weight is not None:
        loss = loss * weight
    if reduction == 'none':
        return loss
    if reduction == 'sum':
        return jnp.sum(loss)
    if reduction == 'mean':
        if weight is None:
            return jnp.mean(loss)
        return jnp.sum(loss) / jnp.maximum(jnp.sum(weight), 1e-12)
    raise ValueError(f'invalid reduction {reduction}')


def l1_loss(pred, target, weight=None, reduction='mean', loss_weight=1.0):
    return loss_weight * _reduce(jnp.abs(pred - target), weight, reduction)


def mse_loss(pred, target, weight=None, reduction='mean', loss_weight=1.0):
    return loss_weight * _reduce((pred - target)**2, weight, reduction)


def charbonnier_loss(pred, target, weight=None, reduction='mean',
                     loss_weight=1.0, eps=1e-12):
    return loss_weight * _reduce(
        jnp.sqrt((pred - target)**2 + eps), weight, reduction)


class _PixelLoss:
    """Callable matching the reference's loss-class interface
    (losses.py:31-122)."""

    _fn = None

    def __init__(self, loss_weight=1.0, reduction='mean', **kwargs):
        if reduction not in _REDUCTIONS:
            raise ValueError(f'Unsupported reduction mode: {reduction}. '
                             f'Supported ones are: {list(_REDUCTIONS)}')
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.kwargs = kwargs

    def __call__(self, pred, target, weight=None):
        return type(self)._fn(pred, target, weight=weight,
                              reduction=self.reduction,
                              loss_weight=self.loss_weight, **self.kwargs)


@LOSS_REGISTRY.register
class L1Loss(_PixelLoss):
    _fn = staticmethod(l1_loss)


@LOSS_REGISTRY.register
class MSELoss(_PixelLoss):
    _fn = staticmethod(mse_loss)


@LOSS_REGISTRY.register
class CharbonnierLoss(_PixelLoss):
    _fn = staticmethod(charbonnier_loss)

    def __init__(self, loss_weight=1.0, reduction='mean', eps=1e-12):
        super().__init__(loss_weight, reduction, eps=eps)


@LOSS_REGISTRY.register
class MaskedTVLoss(L1Loss):
    """Masked total-variation loss (losses.py:125-138)."""

    def __init__(self, loss_weight=1.0):
        super().__init__(loss_weight=loss_weight)

    def __call__(self, pred, mask=None):
        y_diff = super().__call__(pred[:, :-1, :, :], pred[:, 1:, :, :],
                                  weight=None if mask is None
                                  else mask[:, :-1, :, :])
        x_diff = super().__call__(pred[:, :, :-1, :], pred[:, :, 1:, :],
                                  weight=None if mask is None
                                  else mask[:, :, :-1, :])
        return x_diff + y_diff


def gan_loss(pred, target_is_real, gan_type='wgan', real_label_val=1.0,
             fake_label_val=0.0, loss_weight=1.0, is_disc=False):
    """GAN loss (losses.py:275-363). loss_weight only scales the
    generator-side loss, exactly as the reference does (:362-363)."""
    if gan_type == 'wgan':
        loss = -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    elif gan_type == 'vanilla':
        target = jnp.full_like(
            pred, real_label_val if target_is_real else fake_label_val)
        loss = jnp.mean(
            jnp.maximum(pred, 0) - pred * target +
            jnp.log1p(jnp.exp(-jnp.abs(pred))))
    elif gan_type == 'lsgan':
        target = jnp.full_like(
            pred, real_label_val if target_is_real else fake_label_val)
        loss = jnp.mean((pred - target)**2)
    elif gan_type == 'hinge':
        if is_disc:
            pred = -pred if target_is_real else pred
            loss = jnp.mean(jax.nn.relu(1 + pred))
        else:
            loss = -jnp.mean(pred)
    else:
        raise NotImplementedError(f'GAN type {gan_type} is not implemented.')
    return loss if is_disc else loss * loss_weight


@LOSS_REGISTRY.register
class GANLoss:

    def __init__(self, gan_type, real_label_val=1.0, fake_label_val=0.0,
                 loss_weight=1.0):
        self.gan_type = gan_type
        self.real_label_val = real_label_val
        self.fake_label_val = fake_label_val
        self.loss_weight = loss_weight

    def __call__(self, pred, target_is_real, is_disc=False):
        return gan_loss(pred, target_is_real, self.gan_type,
                        self.real_label_val, self.fake_label_val,
                        self.loss_weight, is_disc)


def gradient_penalty_loss(disc_fn, real_data, fake_data, key,
                          loss_weight=1.0, alpha=None):
    """WGAN-GP (losses.py:366-400): random per-sample interpolation, grad
    of D wrt input, (||grad||_2 - 1)^2 penalty.

    Args:
        disc_fn: params-free callable x -> score (close over D params).
        key: PRNG key for the interpolation coefficients.
        alpha: optional explicit (B, 1, 1, 1) interpolation coefficients
            overriding the key-derived draw (training-parity tests pin
            identical alphas against the reference's torch.rand).
    """
    b = real_data.shape[0]
    if alpha is None:
        alpha = jax.random.uniform(key, (b, 1, 1, 1), real_data.dtype)
    interpolates = alpha * real_data + (1. - alpha) * fake_data

    def disc_sum(x):
        return jnp.sum(disc_fn(x))

    gradients = jax.grad(disc_sum)(interpolates)
    grad_norm = jnp.sqrt(
        jnp.sum(gradients.reshape(b, -1)**2, axis=1) + 1e-24)
    return loss_weight * jnp.mean((grad_norm - 1.)**2)


@LOSS_REGISTRY.register
class GradientPenaltyLoss:

    def __init__(self, loss_weight=1.0):
        self.loss_weight = loss_weight

    def __call__(self, disc_fn, real_data, fake_data, key):
        return gradient_penalty_loss(disc_fn, real_data, fake_data, key,
                                     self.loss_weight)


def gram_matrix(feat, normalize=True):
    """(B, H, W, C) -> (B, C, C) Gram; normalized by c*h*w as the
    reference's PerceptualLoss does (losses.py:233-238)."""
    b, h, w, c = feat.shape
    flat = feat.reshape(b, h * w, c)
    gram = jnp.einsum('bnc,bnd->bcd', flat, flat)
    if normalize:
        gram = gram / (c * h * w)
    return gram


@LOSS_REGISTRY.register
class PerceptualLoss(nn.Module):
    """VGG feature loss (+ optional Gram style term), criteria l1/l2/fro
    (losses.py:141-238). A flax module: the frozen VGG parameters live in
    its variables; call returns (percep_loss, style_loss), either None
    when its weight is 0."""
    layer_weights: Dict[str, float]
    vgg_type: str = 'vgg19'
    use_input_norm: bool = True
    perceptual_weight: float = 1.0
    style_weight: float = 0.0
    norm_img: bool = False
    criterion: str = 'l1'
    dtype: Any = jnp.float32

    def _crit(self, a, b):
        if self.criterion == 'l1':
            return jnp.mean(jnp.abs(a - b))
        if self.criterion == 'l2':
            return jnp.mean((a - b)**2)
        if self.criterion == 'fro':
            # torch.norm(..., p='fro') over the whole tensor
            return jnp.sqrt(jnp.sum((a - b)**2))
        raise NotImplementedError(
            f'{self.criterion} criterion has not been supported.')

    @nn.compact
    def __call__(self, x, gt):
        if self.norm_img:
            x = (x + 1.) * 0.5
            gt = (gt + 1.) * 0.5
        vgg = VGGFeatureExtractor(
            layer_name_list=list(self.layer_weights.keys()),
            vgg_type=self.vgg_type, use_input_norm=self.use_input_norm,
            dtype=self.dtype, name='vgg')
        x_features = vgg(x)
        gt_features = jax.tree.map(jax.lax.stop_gradient, vgg(gt))

        percep_loss = None
        if self.perceptual_weight > 0:
            percep_loss = 0.
            for k, w in self.layer_weights.items():
                percep_loss += self._crit(x_features[k], gt_features[k]) * w
            percep_loss = percep_loss * self.perceptual_weight

        style_loss = None
        if self.style_weight > 0:
            style_loss = 0.
            for k, w in self.layer_weights.items():
                style_loss += self._crit(
                    gram_matrix(x_features[k]),
                    gram_matrix(gt_features[k])) * w
            style_loss = style_loss * self.style_weight

        return percep_loss, style_loss


@LOSS_REGISTRY.register
class PerceptualLossMultiInputs(PerceptualLoss):
    """Perceptual loss over (B, N, H, W, C) stacks of images, summed over
    N (losses.py:241-272)."""

    @nn.compact
    def __call__(self, x, gt):
        assert x.shape == gt.shape, (
            'The sizes of input and GT should be the same.')
        total_percep, total_style = 0., 0.
        for i in range(x.shape[1]):
            percep, style = super().__call__(x[:, i], gt[:, i])
            total_percep = (None if percep is None
                            else total_percep + percep)
            total_style = None if style is None else total_style + style
        return total_percep, total_style


@LOSS_REGISTRY.register
class TextureLoss(nn.Module):
    """SRNTT Gram texture loss over relu1/2/3 (losses.py:431-533).
    Shipped configs keep it off; provided for capability parity."""
    use_weights: bool = False
    loss_weight: float = 1.0
    vgg_type: str = 'vgg19'
    layer_weights: Dict[str, float] = None
    use_input_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, maps, weights=None):
        layer_weights = self.layer_weights or {
            'relu1_1': 1.0, 'relu2_1': 1.0, 'relu3_1': 1.0}
        input_size = x.shape[2]
        vgg = VGGFeatureExtractor(
            layer_name_list=list(layer_weights.keys()),
            vgg_type=self.vgg_type, use_input_norm=self.use_input_norm,
            dtype=self.dtype, name='vgg')
        x_features = vgg(x)

        div_nums = {'relu3_1': 256, 'relu2_1': 512, 'relu1_1': 1024}
        losses = 0.
        for k in x_features:
            xf, mf = x_features[k], maps[k]
            if self.use_weights and weights is not None:
                w = jnp.pad(weights[k], ((0, 0), (1, 1), (1, 1), (0, 0)),
                            mode='edge')
                coeff = jax.nn.sigmoid(w * (-20.) + .65)
                mf = mf * coeff
                xf = xf * coeff
            g_x = gram_matrix(xf, normalize=False)
            g_m = gram_matrix(mf, normalize=False)
            losses += jnp.sqrt(jnp.sum((g_x - g_m)**2)) / 4. / (
                (input_size * input_size * div_nums[k])**2)
        return losses / 3. * self.loss_weight


@LOSS_REGISTRY.register
class MapLoss(nn.Module):
    """L1/L2/fro between swapped features and GT VGG features
    (losses.py:536-595)."""
    vgg_type: str = 'vgg19'
    map_weight: float = 1.0
    criterion: str = 'l1'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, swapped_features, gt):
        vgg = VGGFeatureExtractor(
            layer_name_list=['relu3_1', 'relu2_1', 'relu1_1'],
            vgg_type=self.vgg_type, dtype=self.dtype, name='vgg')
        gt_features = jax.tree.map(jax.lax.stop_gradient,
                                   vgg(jax.lax.stop_gradient(gt)))
        map_loss = 0.
        for k in gt_features:
            diff = swapped_features[k] - gt_features[k]
            if self.criterion == 'l1':
                map_loss += jnp.mean(jnp.abs(diff))
            elif self.criterion == 'l2':
                map_loss += jnp.mean(diff**2)
            elif self.criterion == 'fro':
                map_loss += jnp.sqrt(jnp.sum(diff**2))
            else:
                raise NotImplementedError(self.criterion)
        return map_loss * self.map_weight
