"""ResNet-18 classifier in flax (trained from scratch — the reference uses
torchvision resnet18 with weights=None,
/root/reference/classifier_experiment_example.py:475).

Standard He-initialized BasicBlock ResNet; NHWC; BatchNorm with running
stats.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

__all__ = ["ResNet18", "ResNet"]


def _max_pool_3x3_s2_p1(x):
    """3x3 stride-2 pad-1 max pool as 9 shifted strided slices + elementwise
    max — backward lowers to compare/selects instead of SelectAndScatter
    (pathologically slow to compile on this TPU toolchain)."""
    b, h, w, c = x.shape
    neg = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) \
        else jnp.iinfo(x.dtype).min
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    oh, ow = (h + 1) // 2, (w + 1) // 2
    out = None
    for di in range(3):
        for dj in range(3):
            s = xp[:, di : di + 2 * oh - 1 : 2, dj : dj + 2 * ow - 1 : 2, :]
            out = s if out is None else jnp.maximum(out, s)
    return out


class BasicBlock(nn.Module):
    filters: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        residual = x
        y = nn.Conv(self.filters, (3, 3), self.strides, padding=1,
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32, name="bn2")(y)

        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1), self.strides,
                               use_bias=False, dtype=self.dtype,
                               param_dtype=jnp.float32,
                               name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, dtype=jnp.float32,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    num_classes: int
    width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True, return_features=False):
        x = nn.Conv(self.width, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x.astype(self.dtype))
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = _max_pool_3x3_s2_p1(x)

        for i, n_blocks in enumerate(self.stage_sizes):
            for j in range(n_blocks):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                x = BasicBlock(self.width * 2**i, strides, dtype=self.dtype,
                               name=f"layer{i + 1}_block{j}")(x, train=train)

        feats = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        logits = nn.Dense(self.num_classes, param_dtype=jnp.float32,
                          name="fc")(feats)
        if return_features:
            return logits, feats
        return logits


def ResNet18(num_classes: int, dtype=jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), num_classes=num_classes,
                  dtype=dtype)
