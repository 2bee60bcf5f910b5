"""jmt_tpu — TPU-native Joint Multimodal Transformer framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
PoloWlg/Joint-Multimodal-Transformer-6th-ABAW (CVPRw-2024, arXiv 2403.10488):
continuous valence/arousal regression on Affwild2 from video (R(2+1)D-18,
I3D+TCN) and audio (ResNet-18 log-mel, WavLM features), fused by a joint
multimodal transformer with cross-attention, trained with a CCC loss.

Layering (clean, unlike the reference's flat layout):

    core      config / logging / rng / checkpoint / experiment lifecycle
    ops       numerics: CCC, smoothing, attention, convs, mel — incl. Pallas
    models    backbones + fusion stacks (flax.linen)
    data      windowing geometry, decode, transforms, static bucketing
    train     jitted train/eval steps, optimizers, schedules
    parallel  device mesh + shardings (pjit/GSPMD data parallel)
    eval      per-video stitching, smoothing, challenge writers

Everything on the compute path is jittable with static shapes; batch axes are
sharded over a `jax.sharding.Mesh` data axis (the TPU-native replacement for
the reference's single-process ``nn.DataParallel``, tools.py:16).
"""

__version__ = "0.1.0"
