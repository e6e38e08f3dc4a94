"""InceptionV3 feature extractor for FID/IS/sFID/P&R, in Flax.

The reference scores with the TF-Slim InceptionV3 ("inception-2015-12-05"),
loaded either as the StyleGAN3 torch pickle (reference: fid.py:38-43) or as
a TF1 graph (reference: evaluator.py). This is a from-scratch Flax
implementation of that network in its FID variant — including the three
pooling quirks that distinguish the TF graph from torchvision
(count_include_pad=False average pools in the A/C/E blocks and the max-pool
branch in the final E block) — so FID values are comparable with published
numbers. Weights port from the community-standard
``pt_inception-2015-12-05`` state dict via ``convert_inception``.

Outputs per batch of uint8 NCHW images (any resolution; resized to 299
bilinear, scaled to [-1, 1]):
  pool    (N, 2048)  — pool_3 features (FID, precision/recall)
  spatial (N, 2023)  — ADM's sFID features: TF node "mixed_6/conv:0"
                       (evaluator.py:36) = the ReLU'd 1x1-branch conv of
                       the third 17x17 InceptionC block (pytorch-fid name
                       Mixed_6d.branch1x1), first 7 channels, flattened in
                       the TF NHWC order (evaluator.py:205,641)
  logits  (N, 1008)  — classifier logits (Inception Score)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicConv(nn.Module):
    """conv(no bias) + frozen batchnorm(eps 1e-3) + relu."""

    features: int
    kernel: tuple[int, int]
    stride: int = 1
    padding: Any = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(
            self.features, self.kernel, strides=(self.stride, self.stride),
            padding=self.padding, use_bias=False, name="conv",
        )(x)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return nn.relu(x)


def _avg_pool_tf(x: jax.Array, window: int = 3) -> jax.Array:
    """3x3 stride-1 SAME avg pool with count_include_pad=False (TF style)."""
    ones = jnp.ones_like(x[..., :1])
    summed = nn.avg_pool(
        x, (window, window), strides=(1, 1), padding="SAME"
    ) * (window * window)
    counts = nn.avg_pool(
        ones, (window, window), strides=(1, 1), padding="SAME"
    ) * (window * window)
    return summed / counts


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=((2, 2), (2, 2)), name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_tf(x)
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x, return_branch1x1: bool = False):
        c7 = self.c7
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_tf(x)
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        out = jnp.concatenate([b1, b7, bd, bp], axis=-1)
        if return_branch1x1:
            return out, b1
        return out


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool: str  # 'avg' (Mixed_7b, count_include_pad=False) or 'max' (Mixed_7c)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool == "avg":
            bp = _avg_pool_tf(x)
        else:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """FID InceptionV3; input NHWC float in [-1, 1] at 299x299."""

    num_logits: int = 1008

    @nn.compact
    def __call__(self, x: jax.Array) -> dict[str, jax.Array]:
        x = BasicConv(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=((1, 1), (1, 1)), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        # ADM's sFID tap is TF node "mixed_6/conv:0" (evaluator.py:36,641):
        # the ReLU'd 1x1-branch conv of the THIRD 17x17 block — pytorch-fid
        # naming Mixed_6d.branch1x1 — sliced to its first 7 channels.
        x, branch1x1 = InceptionC(160, name="Mixed_6d")(x, return_branch1x1=True)
        spatial = branch1x1[..., :7]  # (N, 17, 17, 7)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        pool = x.mean(axis=(1, 2))  # global average pool -> (N, 2048)
        logits = nn.Dense(self.num_logits, name="fc")(pool)
        n = x.shape[0]
        return {
            "pool": pool,
            # ADM flattens the NHWC TF tensor directly (evaluator.py:205),
            # so keep (H, W, C) order — published mu_s/sigma_s stats index
            # features in this order.
            "spatial": spatial.reshape(n, -1),
            "logits": logits,
        }


def preprocess(images_uint8_nchw: jax.Array) -> jax.Array:
    """uint8 NCHW (any res) -> [-1,1] NHWC 299x299 (TF bilinear resize)."""
    x = images_uint8_nchw.astype(jnp.float32).transpose(0, 2, 3, 1)
    n, h, w, c = x.shape
    if (h, w) != (299, 299):
        x = jax.image.resize(x, (n, 299, 299, c), method="bilinear", antialias=False)
    return x / 127.5 - 1.0


def make_detector(params: Any, num_logits: int = 1008):
    """jitted uint8-NCHW -> feature-dict function."""
    model = InceptionV3(num_logits=num_logits)

    @jax.jit
    def detect(p, images_uint8):
        return model.apply({"params": p}, preprocess(images_uint8))

    return lambda images_uint8: detect(params, images_uint8)


def random_params(rng: jax.Array, num_logits: int = 1008) -> Any:
    """Randomly initialized detector params (machinery tests only)."""
    model = InceptionV3(num_logits=num_logits)
    return model.init(rng, jnp.zeros((1, 299, 299, 3)))["params"]


def convert_inception(state: dict[str, np.ndarray]) -> dict:
    """pytorch-fid ``pt_inception-2015-12-05`` state dict -> flax params.

    torch key layout: '<Block>.<branch>.conv.weight' plus bn
    '<Block>.<branch>.bn.{weight,bias,running_mean,running_var}' and
    'fc.{weight,bias}'.
    """
    params: dict[str, Any] = {}

    def put(path: list[str], leaf: str, val: np.ndarray) -> None:
        node = params
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = val

    for key, w in state.items():
        w = np.asarray(w, dtype=np.float32)
        if key in ("fc.weight",):
            put(["fc"], "kernel", w.T)
            continue
        if key == "fc.bias":
            put(["fc"], "bias", w)
            continue
        parts = key.split(".")
        # e.g. Mixed_5b.branch1x1.conv.weight / Conv2d_1a_3x3.bn.bias
        mod_path = parts[:-2]
        container = parts[-2]
        leaf_name = parts[-1]
        if container == "conv":
            assert leaf_name == "weight"
            put(mod_path + ["conv"], "kernel", w.transpose(2, 3, 1, 0))
        elif container == "bn":
            name = {
                "weight": "scale", "bias": "bias",
                "running_mean": "mean", "running_var": "var",
            }.get(leaf_name)
            if name is None:  # num_batches_tracked
                continue
            put(mod_path, name, w)
        else:
            raise KeyError(f"unhandled inception key '{key}'")
    return params
