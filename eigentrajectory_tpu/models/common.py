"""Shared Flax building blocks for the predictor zoo.

The reference predictors are 2022-era PyTorch modules; their training dynamics
depend on torch's default initializers (kaiming_uniform(a=sqrt(5)) for
Linear/Conv, U(+-1/sqrt(fan_in)) bias) and NCHW conv semantics. These blocks
reproduce that behaviour in Flax so the rebuilt models train to the same
quality, plus a ped-validity-masked BatchNorm that keeps padded slots from
polluting statistics (padding discipline, SURVEY §7 hard part 1).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _torch_uniform(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_w_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).

    Flax Dense kernels are (in, out); fan_in = shape[0].
    """
    bound = 1.0 / jnp.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_b_init_for(fan_in: int):
    return _torch_uniform(float(1.0 / (fan_in ** 0.5)))


class TorchLinear(nn.Module):
    """nn.Linear with torch default init."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_linear_w_init, (fan_in, self.features))
        y = x @ kernel
        if self.use_bias:
            bias = self.param("bias", torch_linear_b_init_for(fan_in), (self.features,))
            y = y + bias
        return y


class TorchConv2d(nn.Module):
    """torch.nn.Conv2d equivalent: NCHW layout, OIHW kernels, torch init.

    kernel_size/stride/padding/dilation follow torch conventions (ints or
    (h, w) tuples; padding is symmetric zero-pad per spatial dim).
    """

    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        fan_in = self.in_channels * kh * kw
        bound = 1.0 / (fan_in ** 0.5)
        kernel = self.param(
            "kernel", _torch_uniform(bound), (self.out_channels, self.in_channels, kh, kw)
        )
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=self.stride,
            padding=[(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
            rhs_dilation=self.dilation,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        if self.use_bias:
            bias = self.param("bias", _torch_uniform(bound), (self.out_channels,))
            y = y + bias[None, :, None, None]
        return y


class PReLU(nn.Module):
    """torch.nn.PReLU with a single shared slope (default num_parameters=1)."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", lambda k, s: jnp.full(s, self.init), (1,))
        return jnp.where(x >= 0, x, alpha * x)


class MaskedBatchNorm2d(nn.Module):
    """BatchNorm2d over NCHW with a validity mask on the last (ped) axis.

    Matches torch semantics: normalize with biased batch variance while
    training, track running stats (unbiased variance) with momentum 0.1, use
    running stats at eval (torch BatchNorm2d defaults). Masked slots are
    excluded from the statistics; callers re-zero them afterwards.

    Running-stat updates are returned through the 'batch_stats' mutable
    collection; the trainer averages per-scene updates across the vmapped
    scene axis (the reference updates per-scene sequentially, trainer.py:125 —
    equal in expectation).
    """

    num_features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = False):
        # x: (N, C, H, W); mask: (W,) bool over the ped axis or None.
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(self.num_features))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(self.num_features))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if mask is None:
                cnt = x.shape[0] * x.shape[2] * x.shape[3]
                mean = jnp.mean(x, axis=(0, 2, 3))
                var = jnp.mean((x - mean[None, :, None, None]) ** 2, axis=(0, 2, 3))
            else:
                m = mask.astype(x.dtype)[None, None, None, :]
                cnt = x.shape[0] * x.shape[2] * jnp.maximum(m.sum(), 1.0)
                mean = jnp.sum(x * m, axis=(0, 2, 3)) / cnt
                var = jnp.sum(((x - mean[None, :, None, None]) ** 2) * m, axis=(0, 2, 3)) / cnt
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        scale = self.param("scale", nn.initializers.ones, (self.num_features,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_features,))
        inv = jax.lax.rsqrt(var + self.eps)
        return (x - mean[None, :, None, None]) * inv[None, :, None, None] * scale[
            None, :, None, None
        ] + bias[None, :, None, None]


class TorchMLP(nn.Module):
    """PECNet/LB-EBM style MLP (baseline/pecnet/model.py:9-39): Linear stack
    with activation between layers; optional terminal sigmoid; dropout after
    hidden activations when enabled."""

    hidden: Sequence[int]
    out_features: int
    activation: str = "relu"
    discrim: bool = False
    dropout: float = -1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = nn.relu if self.activation == "relu" else nn.sigmoid
        dims = list(self.hidden) + [self.out_features]
        for i, d in enumerate(dims):
            x = TorchLinear(d, name=f"layer_{i}")(x)
            if i != len(dims) - 1:
                x = act(x)
                if self.dropout != -1:
                    rate = min(0.1, self.dropout / 3) if i == 1 else self.dropout
                    x = nn.Dropout(rate, deterministic=not train)(x)
            elif self.discrim:
                x = nn.sigmoid(x)
        return x


def zero_invalid(x: jnp.ndarray, valid: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Zero features at invalid ped slots along `axis` (padding discipline:
    every V-mixing op must see zeros at padded slots, exactly like the
    reference's zero-pad at its ragged edge)."""
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]
    return x * valid.astype(x.dtype).reshape(shape)
