"""Architecture building blocks (flax.linen, NHWC).

Parity targets in the reference: arch_util.py — ResidualBlockNoBN (:80-136),
make_layer (:64-77), default_init_weights (:37-61), srntt_init_weights
(:12-34), Upsample (:139-159), pixel_unshuffle (:271-287). Blocks are
channels-last and rely on XLA fusion rather than hand-scheduling.
"""
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


def kaiming_scaled_init(scale=0.1):
    """kaiming_normal(fan_in) * scale — the reference's residual-block
    weight init (default_init_weights, arch_util.py:37-61)."""
    base = nn.initializers.variance_scaling(2.0, 'fan_in', 'normal')

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale

    return init


def srntt_normal_init(gain=0.02):
    """normal(0, gain) — srntt_init_weights (arch_util.py:12-34)."""
    return nn.initializers.normal(stddev=gain)


class SpectralNormConv(nn.Module):
    """3x3 conv with torch-style spectral normalization
    (torch.nn.utils.spectral_norm; the reference's sn option on
    ResidualBlockNoBN, arch_util.py:110-136): kernel / sigma_max, with
    sigma estimated by ``n_power_iterations`` of power iteration on a
    persisted left-singular vector u. u lives in the 'spectral_stats'
    collection — training steps must pass it in ``mutable`` to persist
    the iteration (torch updates u in train mode only); the stage-3
    model threads every non-param collection of net_d automatically
    (RefRestorationModel._d_state_keys). When
    ``sn_bias`` the bias is normalized by its exact sigma ||b||_2 (the
    fixed point torch's (O, 1)-matrix power iteration reaches after one
    step)."""
    features: int
    kernel_init: Callable = kaiming_scaled_init(0.1)
    n_power_iterations: int = 1
    sn_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param('kernel', self.kernel_init,
                            (3, 3, cin, self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))

        # torch flattens (O, I*kh*kw); any fixed permutation of the
        # flattened axis leaves the singular values unchanged
        w_mat = kernel.reshape(-1, self.features).T      # (O, I*9)
        u_var = self.variable(
            'spectral_stats', 'u',
            lambda: _l2_normalize(jax.random.normal(
                self.make_rng('params') if self.is_initializing()
                else jax.random.PRNGKey(0), (self.features,))))
        v_var = self.variable(
            'spectral_stats', 'v',
            lambda: _l2_normalize(w_mat.T @ u_var.value))
        # torch semantics: power iteration only when training
        # (do_power_iteration = module.training); eval reuses the stored
        # (u, v) without touching them. Mutability of spectral_stats is
        # the flax analog of module.training here — an eval
        # apply(variables, x) without mutable=['spectral_stats'] must
        # neither iterate nor write (it would crash on the write).
        u, v = u_var.value, v_var.value
        if self.is_initializing() or \
                self.is_mutable_collection('spectral_stats'):
            # start from the STORED pair so n_power_iterations=0 reuses
            # it exactly as torch's spectral_norm does
            for _ in range(self.n_power_iterations):
                v = _l2_normalize(w_mat.T @ u)
                u = _l2_normalize(w_mat @ v)
            if not self.is_initializing():
                u_var.value = jax.lax.stop_gradient(u)
                v_var.value = jax.lax.stop_gradient(v)
        sigma = u @ (w_mat @ v)
        kernel = kernel / jax.lax.stop_gradient(sigma)
        if self.sn_bias:
            bias = bias / jax.lax.stop_gradient(
                jnp.linalg.norm(bias) + 1e-12)

        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
            ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return out + bias.astype(self.dtype)


def _l2_normalize(x, eps=1e-12):
    return x / (jnp.linalg.norm(x) + eps)


def valid_mask(x, valid_shape):
    """{0,1} mask of the valid (unpadded) region of a bucket-padded NHWC
    tensor: 1 where (row < vh, col < vw), 0 in the zero-pad bands.

    Supports the eval bucket-padding invariance protocol: the reference
    evaluates every image at its exact shape (torch recompiles nothing),
    while this framework pads eval shapes up to a bucket so XLA compiles
    once per bucket. Multiplying each conv's output by this mask makes
    the padded computation produce EXACTLY the exact-shape values on the
    valid crop: the zero bands then behave like the implicit SAME-pad
    zeros of the exact-shape run at every layer (a conv's bias would
    otherwise make the pad region nonzero and bleed back into the valid
    region's receptive fields).

    Args:
        x: (B, H, W, C) tensor the mask is for (shape/dtype source).
        valid_shape: (vh, vw) — python ints, scalar arrays, or (B,)
            arrays (per-image valid sizes within a bucketed batch).
    Returns:
        (B or 1, H, W, 1) mask in x.dtype.
    """
    vh, vw = valid_shape
    h, w = x.shape[1], x.shape[2]
    row = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2)
    vh = jnp.reshape(jnp.asarray(vh, jnp.int32), (-1, 1, 1, 1))
    vw = jnp.reshape(jnp.asarray(vw, jnp.int32), (-1, 1, 1, 1))
    return ((row < vh) & (col < vw)).astype(x.dtype)


def halve_valid(valid_shape):
    """valid_shape after a stride-2 pooling (sizes stay integral: the
    bucket protocol only pads shapes whose valid sizes are even at every
    pooled level — HR valid sizes are multiples of 4)."""
    if valid_shape is None:
        return None
    vh, vw = valid_shape
    return vh // 2, vw // 2


def scale_valid(valid_shape, factor):
    """valid_shape after an integer x``factor`` upsample."""
    if valid_shape is None:
        return None
    vh, vw = valid_shape
    return vh * factor, vw * factor


class ResidualBlockNoBN(nn.Module):
    """Conv-ReLU-Conv residual block without BN (arch_util.py:80-136),
    including the reference's spectral-norm option (:110-136; unused by
    shipped configs).

    ``kernel_init`` is exposed because the reference's init depends on
    context: standalone blocks use kaiming*0.1, but blocks inside
    RestorationNet are re-initialized to normal(0, 0.02) by
    srntt_init_weights (ref_restoration_arch.py:39).
    """
    nf: int = 64
    res_scale: float = 1.0
    kernel_init: Callable = kaiming_scaled_init(0.1)
    sn: bool = False
    n_power_iterations: int = 1
    sn_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        if self.sn:
            def conv(name):
                return SpectralNormConv(
                    features=self.nf, kernel_init=self.kernel_init,
                    n_power_iterations=self.n_power_iterations,
                    sn_bias=self.sn_bias, dtype=self.dtype, name=name)
        else:
            def conv(name):
                return nn.Conv(self.nf, (3, 3), padding=1,
                               kernel_init=self.kernel_init,
                               bias_init=nn.initializers.zeros,
                               dtype=self.dtype, name=name)
        identity = x
        out = conv('conv1')(x)
        if mask is not None:
            out = out * mask
        out = nn.relu(out)
        out = conv('conv2')(out)
        if mask is not None:
            out = out * mask
        return identity + out * self.res_scale


class _ResBlockScanBody(nn.Module):
    """scan body: carry = (activation, valid mask or None), no per-step
    inputs. The mask rides the carry unchanged so the single compiled
    block body can apply it after each conv (bucket-padding invariance,
    see ``valid_mask``)."""
    nf: int
    kernel_init: Callable
    dtype: Any

    @nn.compact
    def __call__(self, carry, _):
        x, mask = carry
        out = ResidualBlockNoBN(nf=self.nf, kernel_init=self.kernel_init,
                                dtype=self.dtype, name='block')(x, mask)
        return (out, mask), None


class ResBlockStack(nn.Module):
    """n sequential ResidualBlockNoBN (make_layer, arch_util.py:64-77).

    Uses nn.scan over stacked parameters: one compiled block body instead
    of 16 unrolled ones — faster XLA compiles, identical math. Params are
    stacked on a leading (n_blocks,) axis (torch ``body.{i}.conv{j}``
    weights import by stacking along axis 0).

    ``unroll`` (lax.scan unroll factor, passed through nn.scan) trades
    compile time for runtime: the rolled loop's per-iteration barrier
    costs ~35% of trunk time at large spatial scales (measured on v5e at
    512x336x64 batch 16: rolled 194 ms vs fully-unrolled 125 ms net of
    tunnel overhead). Param structure is IDENTICAL for any unroll value
    (checkpoints interchange freely); serving configs set
    ``trunk_unroll`` on the network to unroll fully.

    ``unroll='auto'`` (the default) resolves per backend: full unroll on
    XLA:CPU, rolled scan elsewhere. Reason (measured 2026-08-20 on the
    1-core CPU host, 64x64x64 batch 2): XLA:CPU executes the conv
    BACKWARD inside a while-loop body ~60x slower than the identical
    unrolled graph — 3.7 s vs 0.06 s per block, turning a 16-block
    trunk's backward into 58 s while its forward is 0.34 s. TPU keeps
    the rolled scan (compile-time win; runtime parity at train scales).
    The forward is bit-exact either way; gradients differ only by f32
    reassociation (~5e-5 abs — tests/test_archs.py pins equivalence).
    """
    nf: int = 64
    n_blocks: int = 16
    kernel_init: Callable = kaiming_scaled_init(0.1)
    dtype: Any = jnp.float32
    unroll: Any = 'auto'

    @nn.compact
    def __call__(self, x, mask=None):
        unroll = self.unroll
        if unroll == 'auto':
            unroll = (self.n_blocks
                      if jax.default_backend() == 'cpu' else 1)
        scan = nn.scan(
            _ResBlockScanBody,
            variable_axes={'params': 0},
            split_rngs={'params': True},
            length=self.n_blocks,
            unroll=min(unroll, self.n_blocks),
        )
        (out, _mask), _ = scan(nf=self.nf, kernel_init=self.kernel_init,
                               dtype=self.dtype, name='blocks')((x, mask),
                                                                None)
        return out


def lrelu(x, slope=0.1):
    return nn.leaky_relu(x, negative_slope=slope)


# depth-to-space lives in ops/resize.py (single implementation; it
# carries the TPU-layout rationale and the pixel_unshuffle inverse)
from ...ops.resize import pixel_shuffle  # noqa: E402


class ResidualBlockWithBN(nn.Module):
    """Conv-BN-ReLU-Conv-BN residual block (arch_util.py:162-188)."""
    nf: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        identity = x
        bn_kwargs = dict(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)
        out = nn.Conv(self.nf, (3, 3), padding=1,
                      kernel_init=kaiming_scaled_init(1.0),
                      bias_init=nn.initializers.zeros, dtype=self.dtype,
                      name='conv1')(x)
        out = nn.BatchNorm(name='bn1', **bn_kwargs)(out)
        out = nn.relu(out)
        out = nn.Conv(self.nf, (3, 3), padding=1,
                      kernel_init=kaiming_scaled_init(1.0),
                      bias_init=nn.initializers.zeros, dtype=self.dtype,
                      name='conv2')(out)
        out = nn.BatchNorm(name='bn2', **bn_kwargs)(out)
        return identity + out


class Upsample(nn.Module):
    """PixelShuffle upsampler for scales 2^n and 3
    (arch_util.Upsample :139-159)."""
    scale: int
    nf: int
    kernel_init: Callable = srntt_normal_init()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import math as _math
        scale = self.scale
        if (scale & (scale - 1)) == 0:  # 2^n
            for i in range(int(_math.log2(scale))):
                x = nn.Conv(4 * self.nf, (3, 3), padding=1,
                            kernel_init=self.kernel_init,
                            bias_init=nn.initializers.zeros,
                            dtype=self.dtype, name=f'conv{i}')(x)
                x = pixel_shuffle(x, 2)
        elif scale == 3:
            x = nn.Conv(9 * self.nf, (3, 3), padding=1,
                        kernel_init=self.kernel_init,
                        bias_init=nn.initializers.zeros, dtype=self.dtype,
                        name='conv0')(x)
            x = pixel_shuffle(x, 3)
        else:
            raise ValueError(f'scale {scale} is not supported. '
                             'Supported scales: 2^n and 3.')
        return x


class UpsampleShuffle(nn.Module):
    """conv(nf -> 4nf) + PixelShuffle(2) + LeakyReLU tail stage
    (the tail_small/tail_medium pattern, ref_restoration_arch.py:93-95)."""
    nf: int
    kernel_init: Callable = srntt_normal_init()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.nf * 4, (3, 3), padding=1,
                    kernel_init=self.kernel_init,
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name='conv')(x)
        x = pixel_shuffle(x, 2)
        return lrelu(x)
