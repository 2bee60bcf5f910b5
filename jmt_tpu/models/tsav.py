"""Two-stream aural-visual backbone container.

Capability target: TwoStreamAuralVisualModel (tsav.py:119-222) — holds the
optional audio ResNet-18, vision R(2+1)D (with MAX/AVG/FLATTEN feature
reduce, tsav.py:196-207) and vision I3D+TCN backbones and emits per-clip
512-d features for each enabled backbone.

TPU-first redesign of the hot path: the reference loops over batch items in
Python, feeding each (16, ...) pseudo-batch through the container
(train.py:136-148) — a GPU-underutilizing serialization. Here the
(B, S, ...) batch is flattened to (B*S, ...) and every backbone runs ONCE
per step on the full clip batch; XLA tiles the big convs onto the MXU.

Also replaces resize_clips_for_i3d (utils/utils.py:293-300): the reference's
trilinear interpolate with align_corners=False over (C=3->3, 112->224,
112->224) is an identity along C, i.e. per-frame bilinear half-pixel-center
resize == jax.image.resize(method='linear').
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from jmt_tpu.models.common import Linear
from jmt_tpu.models.resnet18 import ResNet18
from jmt_tpu.models.video_resnet import VideoResNet
from jmt_tpu.models.i3d import I3DTCN


def resize_clips_for_i3d(clips: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """clips: (N, T, H, W, C) -> (N, T, size, size, C), bilinear
    half-pixel-centers (parity with F.interpolate trilinear
    align_corners=False through the reference's permute trick).
    Identity when the clips are already at `size` (the native-resolution
    I3D option, model_params.i3d_input_size=112)."""
    n, t, h, w, c = clips.shape
    if h == size and w == size:
        return clips
    return jax.image.resize(clips, (n, t, size, size, c), method="linear")


class TwoStreamBackbones(nn.Module):
    vision_backbones: Sequence[str] = ("R2D1",)   # subset of {R2D1, I3D}
    audio_backbones: Sequence[str] = ("ResNet18",)  # subset of {ResNet18, wavLM}
    r2d1_arch: str = "r2plus1d"                     # r2plus1d | r3d | mc3
    r2d1_reduce: str = "MAX"                        # MAX | AVG | FLATTEN
    # backbones being finetuned: their BN uses batch stats when train=True
    # (the reference's model.eval() + selective .train(True), train.py:27-42)
    finetune: Sequence[str] = ()
    # finetune with BN in eval mode (running stats; grads still flow to
    # conv weights and BN scale/bias). NOT reference parity — opt-in via
    # model_params.finetune_bn="frozen". Standard finetune practice at
    # small per-device batches, and it removes the train-BN batch-stat
    # reductions that dominate the measured I3D backward (STATUS.md:
    # I3D bwd runs ~3.7x its fwd in train-BN mode)
    finetune_bn_frozen: bool = False
    # rematerialize backbone activations in the backward pass
    # (jax.checkpoint): trades ~1 extra forward for O(depth) less HBM —
    # enables full-finetune at batch sizes the activations wouldn't fit
    remat: bool = False
    # "backbone" = one checkpoint around each whole backbone;
    # "stage" = per-residual-block / per-inception-module checkpoints
    # (finer recompute/memory tradeoff — cfg.remat_granularity)
    remat_granularity: str = "backbone"
    # I3D input resolution: 224 = reference parity (112px clips upsampled
    # 2x, utils/utils.py:293-300); 112 = TPU-native option that skips the
    # information-free upsample (~4x fewer I3D FLOPs; NOT reference-parity
    # — opt in via model_params.i3d_input_size, see tests for the
    # feature-drift bound)
    i3d_input_size: int = 224
    # whole-inception-module Pallas kernel (ops/inception_pallas) — exact
    # frozen-BN path; resolved from config 'auto' by the caller
    i3d_fused_inception: bool = False
    # stream the I3D trunk over clip chunks of this size (nn.scan with
    # broadcast params): bounds the stem-output activation footprint —
    # the measured HBM hog that OOMs B>=12 on v5e — at O(chunk) instead
    # of O(B*S). 0 = off. Applied only when the I3D BN is in eval mode
    # (frozen or eval — chunked batch stats would diverge); ops per chunk
    # are identical to the unchunked path, so eval numerics are exact.
    i3d_chunk: int = 0
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        assert self.r2d1_reduce in ("MAX", "AVG", "FLATTEN"), self.r2d1_reduce
        VR, I3, RN = VideoResNet, I3DTCN, ResNet18
        stage_remat = self.remat and self.remat_granularity == "stage"
        if self.remat and not stage_remat:
            # static_argnums count the module itself as arg 0; the boolean
            # mode flags must be STATIC and passed POSITIONALLY at the call
            # sites below
            VR = nn.remat(VideoResNet, static_argnums=(2, 3))
            I3 = nn.remat(I3DTCN, static_argnums=(2, 3, 4))
            RN = nn.remat(ResNet18, static_argnums=(2,))
        if self.remat and stage_remat:
            RN = nn.remat(ResNet18, static_argnums=(2,))  # small: whole
        if "R2D1" in self.vision_backbones:
            self.vision_r2d1 = VR(arch=self.r2d1_arch,
                                  remat_blocks=stage_remat,
                                  dtype=self.dtype)
            if self.r2d1_reduce == "FLATTEN":
                self.vision_r2d1_fc = Linear(512, dtype=self.dtype)
        if "I3D" in self.vision_backbones:
            self.vision_i3d = I3(fused_inception=self.i3d_fused_inception,
                                 remat_stages=stage_remat,
                                 dtype=self.dtype)
        if "ResNet18" in self.audio_backbones:
            self.audio_resnet18 = RN(in_channels=1, dtype=self.dtype)

    def __call__(self, audio_spec: Optional[jnp.ndarray],
                 clips: Optional[jnp.ndarray],
                 train: bool = False,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """audio_spec: (B, S, 64, W, 1) log-mel; clips: (B, S, T, 112, 112, 3).

        Returns per-backbone features, each (B, S, 512). wavLM features are
        precomputed and injected by the data pipeline, not computed here
        (parity with train.py:150-171). `train` flips BN to batch stats ONLY
        for backbones listed in `finetune` (frozen ones stay in eval mode,
        matching train.py:27-42).
        """
        feats: Dict[str, jnp.ndarray] = {}

        def ura(name: str) -> bool:
            if self.finetune_bn_frozen:
                return True
            return not (train and name in self.finetune)

        if "ResNet18" in self.audio_backbones:
            b, s = audio_spec.shape[:2]
            flat = audio_spec.reshape(b * s, *audio_spec.shape[2:])
            f = self.audio_resnet18(flat, ura("ResNet18"))
            feats["audio_resnet18"] = f.reshape(b, s, 512)

        if "R2D1" in self.vision_backbones:
            b, s = clips.shape[:2]
            flat = clips.reshape(b * s, *clips.shape[2:])
            fmap = self.vision_r2d1(flat, ura("R2D1"),
                                    True)  # features_only; positional so
            # nn.remat's static_argnums can see it  # (N, T', H', W', 512)
            n = fmap.shape[0]
            if self.r2d1_reduce == "MAX":
                f = jnp.max(fmap.reshape(n, -1, 512), axis=1)
            elif self.r2d1_reduce == "AVG":
                f = jnp.mean(fmap.reshape(n, -1, 512), axis=1)
            else:  # FLATTEN: (T', H', W', C) order; the fc converter permutes
                # reference weights to match (torch_io.r2d1_flatten_fc_params)
                f = self.vision_r2d1_fc(fmap.reshape(n, -1))
            feats["vision_r2d1"] = f.reshape(b, s, 512)

        if "I3D" in self.vision_backbones:
            b, s = clips.shape[:2]
            flat = clips.reshape(b * s, *clips.shape[2:])

            def i3d_trunk(mdl, x):
                if (mdl.i3d_input_size == 2 * x.shape[2]
                        and mdl.i3d_input_size == 2 * x.shape[3]):
                    # exact fold of the 2x upsample into the stem conv:
                    # never materializes the 224² tensor, 1.96x fewer stem
                    # MACs (ops/conv.conv3d_stem_upsample2x); positional
                    # args so nn.remat's static_argnums see the mode flags
                    return mdl.vision_i3d(x, ura("I3D"), deterministic,
                                          True)  # (N, T', 512)
                resized = resize_clips_for_i3d(x, mdl.i3d_input_size)
                return mdl.vision_i3d(resized, ura("I3D"),
                                      deterministic, False)

            n, ck = flat.shape[0], self.i3d_chunk
            if ck > 0 and n > ck and n % ck and not self.is_initializing():
                # a chunk that does not divide B*S silently disabling the
                # memory knob is exactly the OOM-with-no-hint failure mode
                import warnings
                warnings.warn(
                    f"i3d_chunk={ck} does not divide the flat clip count "
                    f"{n} — chunk streaming DISABLED; pick a divisor "
                    f"(e.g. B=12,S=16 -> 96; B=16 -> 128)", RuntimeWarning)
            if (ck > 0 and n > ck and n % ck == 0 and ura("I3D")
                    and not self.is_initializing()):
                # stream the trunk over n//ck chunks; dropout rngs split
                # per chunk (fresh masks — a train-mode-only statistical
                # difference; eval is deterministic and exact)
                scan = nn.scan(
                    lambda mdl, carry, xc: (carry, i3d_trunk(mdl, xc)),
                    variable_broadcast=["params", "batch_stats"],
                    split_rngs={"params": False, "dropout": True},
                    in_axes=0, out_axes=0)
                _, tfeat = scan(self, (),
                                flat.reshape(n // ck, ck, *flat.shape[1:]))
                tfeat = tfeat.reshape(n, *tfeat.shape[2:])
            else:
                tfeat = i3d_trunk(self, flat)
            f = jnp.max(tfeat, axis=1)  # max over time (tsav.py:216)
            feats["vision_i3d"] = f.reshape(b, s, 512)

        return feats
