"""Inception-v1 I3D backbone + TCN temporal head.

Capability target: the reference's InceptionI3d (pytorch_i3d_new.py:247-537)
wrapped by I3D_WSDDA (I3DWSDDA.py:5-45): feature endpoint Mixed_5c ->
AvgPool3d([2,7,7], stride 1) -> squeeze spatial -> 4-layer TCN(1024->512,
k=5, dropout .1) -> per-timestep 512-d features.

The reference computes TF-style 'SAME' padding dynamically per forward
(pytorch_i3d_new.py:87-110); shapes are static under jit so the identical
arithmetic runs at trace time (ops/conv.tf_same_pads) and folds into the HLO.

Channels-last: input (B, T, H, W, 3) at 224x224 -> I3DTCN output (B, T-1, 512)
for T=8 (the reference's (b, 7, 512), I3DWSDDA.py:44).

CRF heads (pytorch_i3d_new.py:161-244) are constructed only when
``use_crf=True`` in the reference and are off in every shipped config; they
are intentionally not reimplemented (dead code, SURVEY.md §2.3).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from jmt_tpu.ops.conv import (conv_nd, conv3d_s2d_hw, conv3d_stem_upsample2x,
                              max_pool, avg_pool, tf_same_pads)
from jmt_tpu.ops.norm import TorchBatchNorm
from jmt_tpu.ops.initializers import torch_linear_bias
from jmt_tpu.models.tcn import TemporalConvNet


class Unit3D(nn.Module):
    """Conv3d with TF-SAME padding [+ BN(eps 1e-3, momentum .01)] [+ ReLU]
    (pytorch_i3d_new.py:46-118).

    Setup-style with an explicit ``in_features`` so the kernel param is
    addressable by the parent: InceptionModule MERGES the three parallel
    1x1x1 branch convs over the same input into ONE conv (kernels
    concatenated along Cout at apply time) and runs each branch's
    ``epilogue`` (bias/BN/ReLU) on its split — identical numerics and an
    identical param tree, one pass over the input instead of three.
    """
    features: int
    in_features: int = 0  # required (static param shapes in setup)
    kernel: Sequence[int] = (1, 1, 1)
    strides: Sequence[int] = (1, 1, 1)
    use_batch_norm: bool = True
    use_bias: bool = False
    activation: bool = True
    # EXACT space-to-depth reformulation for spatial-stride-2 stems with
    # tiny Cin (ops/conv.conv3d_s2d_hw) — better MXU lane packing
    s2d_hw: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        import jax

        if self.in_features:
            fan_in = (self.in_features * self.kernel[0] * self.kernel[1]
                      * self.kernel[2])
            bound = 1.0 / fan_in ** 0.5

            def kernel_init(key, shape, dtype=jnp.float32):
                # torch Conv3d default: kaiming_uniform(a=sqrt(5))
                return jax.random.uniform(key, shape, dtype, -bound, bound)

            self.kernel_p = self.param(
                "kernel", kernel_init,
                (*self.kernel, self.in_features, self.features))
            if self.use_bias:
                self.bias_p = self.param("bias", torch_linear_bias(fan_in),
                                         (self.features,))
        if self.use_batch_norm:
            self.bn = TorchBatchNorm(momentum=0.01, epsilon=1e-3,
                                     dtype=self.dtype, name="bn")

    def _kernel(self, cin: int):
        assert self.in_features and cin == self.in_features, (
            cin, self.in_features,
            "Unit3D requires static in_features (setup-style params)")
        return self.kernel_p

    def epilogue(self, y: jnp.ndarray,
                 use_running_average: bool = True) -> jnp.ndarray:
        """bias + BN + ReLU on a precomputed conv output."""
        if self.use_bias:
            b = self.bias_p
            y = y + (b.astype(self.dtype) if self.dtype is not None else b)
        if self.use_batch_norm:
            y = self.bn(y, use_running_average)
        if self.activation:
            y = nn.relu(y)
        return y

    def __call__(self, x: jnp.ndarray,
                 use_running_average: bool = True) -> jnp.ndarray:
        k = self._kernel(x.shape[-1])
        pads = tf_same_pads(x.shape[1:4], self.kernel, self.strides)
        if self.dtype is not None:
            x, k = x.astype(self.dtype), k.astype(self.dtype)
        if (self.s2d_hw and tuple(self.strides) == (1, 2, 2)
                and x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0):
            y = conv3d_s2d_hw(x, k, pads)
        else:
            y = conv_nd(x, k, strides=self.strides, padding=pads)
        return self.epilogue(y, use_running_average)

    def upsampled2x(self, x: jnp.ndarray,
                    use_running_average: bool = True) -> jnp.ndarray:
        """EXACT `self(upsample2x_hw(x))` without materializing the 2x
        tensor (ops/conv.conv3d_stem_upsample2x). Stem-only: requires
        kernel (kt,7,7) and strides (1,2,2); output spatial size == input
        spatial size (the composite's net stride is 1)."""
        assert tuple(self.strides) == (1, 2, 2), self.strides
        k = self._kernel(x.shape[-1])
        t_pad = tf_same_pads((x.shape[1],), (self.kernel[0],), (1,))[0]
        y = conv3d_stem_upsample2x(x, k, t_pad, compute_dtype=self.dtype)
        return self.epilogue(y, use_running_average)


def max_pool_same(x: jnp.ndarray, kernel: Sequence[int],
                  strides: Sequence[int]) -> jnp.ndarray:
    """MaxPool3dSamePadding (pytorch_i3d_new.py:12-43), static pads."""
    pads = tf_same_pads(x.shape[1:4], kernel, strides)
    return max_pool(x, kernel, strides, pads)


class InceptionModule(nn.Module):
    """pytorch_i3d_new.py:121-158.

    TPU optimization (exact): the b0/b1a/b2a branches are all 1x1x1 convs
    over the SAME input — their kernels are concatenated along Cout into
    ONE conv (one GEMM, one pass over x instead of three; bigger Cout =
    better MXU utilization), then split and run through each branch's own
    bias/BN/ReLU epilogue. Identical numerics in eval AND train mode
    (per-channel BN stats are independent across the split), identical
    param/checkpoint tree. Measured: I3D 132 -> see STATUS.md.
    """
    in_channels: int
    out_channels: Sequence[int]  # [o0, o1, o2, o3, o4, o5]
    # run the whole module as ONE Pallas kernel (ops/inception_pallas) —
    # eval/frozen-BN only; exactness + the measured rationale live there
    fused: bool = False
    # seam absorption (applied in BOTH paths so semantics are identical
    # whichever branch runs): pool_in = (kernel, strides) of the
    # preceding MaxPool3dSamePadding, folded into this module; avg_tail =
    # apply the I3D feature tail AvgPool3d((2,H,W), valid) and return
    # (B, T-1, C) instead of the spatial map
    pool_in: Optional[tuple] = None
    avg_tail: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        o = self.out_channels
        c = self.in_channels
        kw = dict(dtype=self.dtype)
        self.b0 = Unit3D(o[0], c, (1, 1, 1), **kw)
        self.b1a = Unit3D(o[1], c, (1, 1, 1), **kw)
        self.b1b = Unit3D(o[2], o[1], (3, 3, 3), **kw)
        self.b2a = Unit3D(o[3], c, (1, 1, 1), **kw)
        self.b2b = Unit3D(o[4], o[3], (3, 3, 3), **kw)
        self.b3b = Unit3D(o[5], c, (1, 1, 1), **kw)

    def _folded_branch(self, name):
        u = getattr(self, name)
        return (u.kernel_p,
                u.bn.get_variable("params", "scale"),
                u.bn.get_variable("params", "bias"),
                u.bn.get_variable("batch_stats", "mean"),
                u.bn.get_variable("batch_stats", "var"))

    def _pool_absorbable(self, x) -> bool:
        """The Pallas kernel computes the absorbed pool only for the
        reference shapes (kernel (1|2|3,k,k), k in {2,3}, stride (1,2,2))
        on even pre-pool maps; anything else pools outside the kernel."""
        from jmt_tpu.ops.inception_pallas import _ABSORB_POOLS
        if self.pool_in is None or not _ABSORB_POOLS:
            return False
        (kt, kh, kw), st = self.pool_in
        return (tuple(st) == (1, 2, 2) and kh == kw and kh in (2, 3)
                and kt in (1, 2, 3)
                and x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0)

    def __call__(self, x, use_running_average=True):
        if (self.fused and use_running_average
                and not self.is_initializing()):
            from jmt_tpu.ops.inception_pallas import (
                fold_inception_weights, inception_module_fused)
            dt = self.dtype or x.dtype
            fw = fold_inception_weights(self._folded_branch, dt)
            absorb = self._pool_absorbable(x)
            if self.pool_in is not None and not absorb:
                x = max_pool_same(x, *self.pool_in)
            return inception_module_fused(
                x.astype(dt), fw, self.out_channels,
                pool_in=self.pool_in if absorb else None,
                avg_tail=self.avg_tail)
        if self.pool_in is not None:
            x = max_pool_same(x, *self.pool_in)
        o = self.out_channels
        k = jnp.concatenate([self.b0.kernel_p, self.b1a.kernel_p,
                             self.b2a.kernel_p], axis=-1)  # (1,1,1,C,o0+o1+o3)
        if self.dtype is not None:
            xk = x.astype(self.dtype)
            k = k.astype(self.dtype)
        else:
            xk = x
        y = conv_nd(xk, k, strides=(1, 1, 1),
                    padding=[(0, 0)] * 3)  # 1x1x1 SAME == VALID
        y0, y1, y2 = (y[..., :o[0]], y[..., o[0]:o[0] + o[1]],
                      y[..., o[0] + o[1]:])
        b0 = self.b0.epilogue(y0, use_running_average)
        b1 = self.b1b(self.b1a.epilogue(y1, use_running_average),
                      use_running_average)
        b2 = self.b2b(self.b2a.epilogue(y2, use_running_average),
                      use_running_average)
        b3 = max_pool_same(x, (3, 3, 3), (1, 1, 1))
        b3 = self.b3b(b3, use_running_average)
        out = jnp.concatenate([b0, b1, b2, b3], axis=-1)
        if self.avg_tail:
            out = avg_pool(out, (2, out.shape[2], out.shape[3]), (1, 1, 1))
            out = out.squeeze(3).squeeze(2)  # (B, T-1, C), as the kernel
        return out


# (endpoint name, inception channel spec) in forward order; pools inline.
_I3D_STAGES: Tuple = (
    ("Conv3d_1a_7x7", None),
    ("MaxPool3d_2a_3x3", ((1, 3, 3), (1, 2, 2))),
    ("Conv3d_2b_1x1", None),
    ("Conv3d_2c_3x3", None),
    ("MaxPool3d_3a_3x3", ((1, 3, 3), (1, 2, 2))),
    ("Mixed_3b", (64, 96, 128, 16, 32, 32)),
    ("Mixed_3c", (128, 128, 192, 32, 96, 64)),
    ("MaxPool3d_4a_3x3", ((3, 3, 3), (1, 2, 2))),
    ("Mixed_4b", (192, 96, 208, 16, 48, 64)),
    ("Mixed_4c", (160, 112, 224, 24, 64, 64)),
    ("Mixed_4d", (128, 128, 256, 24, 64, 64)),
    ("Mixed_4e", (112, 144, 288, 32, 64, 64)),
    ("Mixed_4f", (256, 160, 320, 32, 128, 128)),
    ("MaxPool3d_5a_2x2", ((2, 2, 2), (1, 2, 2))),
    ("Mixed_5b", (256, 160, 320, 32, 128, 128)),
    ("Mixed_5c", (384, 192, 384, 48, 128, 128)),
)


class InceptionI3d(nn.Module):
    """pytorch_i3d_new.py:247-537, feature path (final_endpoint='Logits',
    use_crf=False — every shipped reference config)."""
    num_classes: int = 400
    fused_inception: bool = False
    # stage-granular remat: checkpoint each inception module / stem conv
    # (finetune memory knob; irrelevant to the frozen/fused path)
    remat_stages: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True,
                 features_only: bool = True,
                 stem_upsample2x: bool = False) -> jnp.ndarray:
        """x: (B, T, H, W, 3). features_only -> avg-pooled features
        (B, T-1, 1, 1, 1024) squeezed to (B, T-1, 1024) by the caller via
        extract-features semantics (pytorch_i3d_new.py:532-537).

        stem_upsample2x: treat x as the HALF-resolution input and compute
        the stem as the exact fold of (2x bilinear upsample ∘ conv) — the
        reference's resize_clips_for_i3d + Conv3d_1a_7x7 composite — so
        the 2x tensor is never materialized (ops/conv.conv3d_stem_upsample2x).
        """
        Mod = (nn.remat(InceptionModule, static_argnums=(2,))
               if self.remat_stages else InceptionModule)
        U3 = (nn.remat(Unit3D, static_argnums=(2,))
              if self.remat_stages else Unit3D)
        stem = U3(64, 3, (7, 7, 7), (1, 2, 2), s2d_hw=True,
                  dtype=self.dtype, name="Conv3d_1a_7x7")
        if stem_upsample2x:
            h = stem.upsampled2x(x, use_running_average)
        else:
            h = stem(x, use_running_average)
        cin = 64
        stages = _I3D_STAGES[1:]
        # seam absorption: a MaxPool immediately preceding a Mixed module
        # is folded into that module (pool_in), and the tail
        # AvgPool3d([2,H,W]) (pytorch_i3d_new.py:415-416; the 7x7 window
        # is the FULL spatial extent at the reference's 224px input) is
        # folded into Mixed_5c (avg_tail) — identical ops either way on
        # the XLA path, and the Pallas fused path computes them inside
        # the module kernels so the pooled/pre-tail tensors never hit HBM
        pending_pool = None
        for idx, (name, spec) in enumerate(stages):
            if name.startswith("MaxPool"):
                if (idx + 1 < len(stages)
                        and stages[idx + 1][0].startswith("Mixed")):
                    pending_pool = spec
                else:
                    h = max_pool_same(h, *spec)
            elif name.startswith("Mixed"):
                last = name == "Mixed_5c"
                h = Mod(cin, spec, fused=self.fused_inception,
                        pool_in=pending_pool, avg_tail=last,
                        dtype=self.dtype, name=name)(
                    h, use_running_average)
                pending_pool = None
                # module output channels: o0 + o2 + o4 + o5
                cin = spec[0] + spec[2] + spec[4] + spec[5]
            else:
                feats = {"Conv3d_2b_1x1": (64, (1, 1, 1)),
                         "Conv3d_2c_3x3": (192, (3, 3, 3))}[name]
                h = U3(feats[0], cin, feats[1], dtype=self.dtype,
                       name=name)(h, use_running_average)
                cin = feats[0]
        h = h[:, :, None, None, :]  # (B, T-1, 1, 1, 1024) contract
        if features_only:
            return h  # (B, T-1, 1, 1, 1024)
        # Logits head (dropout omitted at inference; Unit3D 1x1x1 linear)
        logits = Unit3D(self.num_classes, 1024, (1, 1, 1),
                        use_batch_norm=False, use_bias=True,
                        activation=False, dtype=self.dtype,
                        name="logits")(h, use_running_average)
        return logits.squeeze(3).squeeze(2)  # (B, T', classes)


class I3DTCN(nn.Module):
    """I3D_WSDDA equivalent: I3D features -> TCN -> (B, T', 512)
    (I3DWSDDA.py:40-45)."""
    fused_inception: bool = False
    remat_stages: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True,
                 deterministic: bool = True,
                 stem_upsample2x: bool = False) -> jnp.ndarray:
        feats = InceptionI3d(fused_inception=self.fused_inception,
                             remat_stages=self.remat_stages,
                             dtype=self.dtype, name="i3d")(
            x, use_running_average, features_only=True,
            stem_upsample2x=stem_upsample2x)
        feats = feats.squeeze(3).squeeze(2)  # (B, T', 1024)
        temp = TemporalConvNet((512, 512, 512, 512), kernel_size=5,
                               dropout=0.1, dtype=self.dtype,
                               name="temporal")(feats, deterministic)
        return temp  # (B, T', 512) — already time-major like the reference's
        # .transpose(1, 2) output (I3DWSDDA.py:44) since we are channels-last
