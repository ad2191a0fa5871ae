"""InceptionV3 pool-2048 feature extractor for FID, in flax.

Replaces the reference's dependence on the `pytorch-fid` wheel
(/root/reference/denoising_diffusion_pytorch/fid_evaluation.py:8,45): the
torchvision InceptionV3 topology with the pytorch-fid evaluation patches —
average pools use count_include_pad=False (FIDInceptionA/C/E_1) and the last
InceptionE uses a MAX pool in its pool branch (FIDInceptionE_2).

Weight parity: `load_torch_inception_weights` imports a torchvision/pytorch-
fid state dict (conv OIHW → HWIO, BatchNorm running stats folded as given) so
FID numbers are comparable with the reference protocol. Zero-egress note:
without a weight file the extractor runs with random init — fine for
exercising the pipeline, NOT a calibrated FID.

Input contract: [B, H, W, 3] in [0, 1]; resized to 299×299 and scaled to
[-1, 1] internally (pytorch-fid's normalize_input).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

__all__ = ["InceptionV3Features", "load_torch_inception_weights"]


class BasicConv2d(nn.Module):
    out_channels: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: Any = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_channels, self.kernel_size,
                    strides=self.strides, padding=self.padding,
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=jnp.float32, param_dtype=jnp.float32,
                         name="bn")(x)
        return nn.relu(x)


def _avg_pool_nopad(x, window=(3, 3), strides=(1, 1)):
    """avg_pool(3x3 s1 p1) with count_include_pad=False."""
    return nn.avg_pool(x, window, strides=strides, padding=((1, 1), (1, 1)),
                       count_include_pad=False)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), dtype=self.dtype, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, dtype=self.dtype,
                         name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=self.dtype,
                         name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=self.dtype,
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=self.dtype,
                         name="branch3x3dbl_3")(b3)
        bp = _avg_pool_nopad(x)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=self.dtype,
                         name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), dtype=self.dtype,
                         name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=self.dtype,
                         name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, dtype=self.dtype,
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), dtype=self.dtype,
                         name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=self.dtype, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         dtype=self.dtype, name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         dtype=self.dtype, name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=self.dtype,
                         name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         dtype=self.dtype, name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         dtype=self.dtype, name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         dtype=self.dtype, name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         dtype=self.dtype, name="branch7x7dbl_5")(bd)
        bp = _avg_pool_nopad(x)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), dtype=self.dtype,
                         name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=self.dtype,
                         name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         dtype=self.dtype, name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         dtype=self.dtype, name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), dtype=self.dtype,
                         name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # "avg" (E_1) or "max" (E_2, pytorch-fid patch)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), dtype=self.dtype, name="branch1x1")(x)

        b3 = BasicConv2d(384, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                          dtype=self.dtype, name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                          dtype=self.dtype, name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)

        bd = BasicConv2d(448, (1, 1), dtype=self.dtype,
                         name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, dtype=self.dtype,
                         name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                          dtype=self.dtype, name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                          dtype=self.dtype, name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)

        if self.pool_mode == "max":
            bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                             padding=((1, 1), (1, 1)))
        else:
            bp = _avg_pool_nopad(x)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Pool-2048 FID features. Input [B, H, W, 3] in [0, 1]."""

    dtype: Dtype = jnp.float32
    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        if self.resize_input:
            x = jax.image.resize(x, (b, 299, 299, 3), method="bilinear")
        if self.normalize_input:
            x = x * 2.0 - 1.0
        x = x.astype(self.dtype)

        x = BasicConv2d(32, (3, 3), strides=(2, 2), dtype=self.dtype,
                        name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), dtype=self.dtype, name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, dtype=self.dtype,
                        name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), dtype=self.dtype, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), dtype=self.dtype, name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        x = InceptionA(32, dtype=self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5d")(x)
        x = InceptionB(dtype=self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=self.dtype, name="Mixed_6e")(x)
        x = InceptionD(dtype=self.dtype, name="Mixed_7a")(x)
        x = InceptionE("avg", dtype=self.dtype, name="Mixed_7b")(x)
        x = InceptionE("max", dtype=self.dtype, name="Mixed_7c")(x)

        # global average pool → 2048-d
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


def load_torch_inception_weights(state: Dict[str, np.ndarray]) -> Dict:
    """torchvision/pytorch-fid InceptionV3 state dict → flax variables
    ({'params': ..., 'batch_stats': ...})."""
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    for key, val in state.items():
        if key.startswith("fc.") or key.startswith("AuxLogits"):
            continue
        parts = key.split(".")
        *module_path, param_name = parts
        # torch: Mixed_5b.branch1x1.conv.weight / .bn.weight etc.
        flax_module = module_path  # same names
        v = np.asarray(val)
        if param_name == "weight" and module_path[-1] == "conv":
            put(params, flax_module + ["kernel"],
                jnp.asarray(v.transpose(2, 3, 1, 0)))
        elif module_path[-1] == "bn":
            if param_name == "weight":
                put(params, flax_module + ["scale"], jnp.asarray(v))
            elif param_name == "bias":
                put(params, flax_module + ["bias"], jnp.asarray(v))
            elif param_name == "running_mean":
                put(stats, flax_module + ["mean"], jnp.asarray(v))
            elif param_name == "running_var":
                put(stats, flax_module + ["var"], jnp.asarray(v))
    return {"params": params, "batch_stats": stats}
