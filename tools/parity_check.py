"""End-to-end CCC parity harness: jmt_tpu vs the reference, same weights,
same data.

The north-star check (BASELINE.json): predictions within 1e-3 CCC of
locally generated reference outputs. This script builds the same model in
BOTH frameworks (reference torch modules imported read-only from
/root/reference; weights copied torch->flax via models.torch_io), pushes
identical synthetic windows through both full pipelines — normalization,
R(2+1)D features, wavLM fc, JMT fusion, per-video stitching, smoothing —
and reports the prediction deltas and the CCC between the two frameworks'
stitched outputs.

Config: R2D1 vision + wavLM audio (every component torch-importable in
this image; torchvision — needed for the reference audio ResNet — is not
installed). Run:  PYTHONPATH=. python tools/parity_check.py
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

if jax.default_backend() not in ("cpu", "tpu"):
    pass  # axon counts as tpu


def main(img_size: int = 48, length: int = 450) -> dict:
    import jax.numpy as jnp
    import torch
    from reference_loader import load_reference_models
    from jmt_tpu.data.synthetic import synthetic_dataset
    from jmt_tpu.data.datasets import collate
    from jmt_tpu.data.transforms import preprocess_clips
    from jmt_tpu.models.video_resnet import VideoResNet
    from jmt_tpu.models import TwoTransformers, FcLayer
    from jmt_tpu.models import torch_io
    from jmt_tpu.eval.stitch import Stitcher

    ref = load_reference_models()
    torch.manual_seed(0)

    # ---- same weights in both frameworks
    t_r2d1 = ref.video_resnet.r2plus1d_18(pretrained=False)
    t_fc = ref.fc_layer.FcLayer(768, 512)
    t_fusion = ref.two_transformers.Two_transformers(
        0.0, 0.0, 1, 1, "TRANSFORMER", "SELF_ATTEN")
    for m in (t_r2d1, t_fc, t_fusion):
        m.eval()

    vr_tree = torch_io.video_resnet_vars(t_r2d1.state_dict(), "r2plus1d")
    fc_params = torch_io.fc_layer_params(t_fc.state_dict())
    fu_params = torch_io.two_transformers_params(
        t_fusion.state_dict(), 1, "TRANSFORMER", "SELF_ATTEN")

    j_r2d1 = VideoResNet(arch="r2plus1d")
    j_fc = FcLayer(512)
    j_fusion = TwoTransformers(joint_modalities="TRANSFORMER",
                               output_format="SELF_ATTEN")

    # ---- same data: synthetic eval windows + synthetic wavLM features
    ds = synthetic_dataset("val", n_videos=1, length=length,
                           img_size=img_size)
    rng = np.random.default_rng(42)

    st_j = Stitcher(with_labels=True)
    preds_t_v, preds_t_a = {}, {}

    for i in range(len(ds)):
        batch = collate([ds[i]])
        wavlm = rng.normal(size=(1, 16, 768)).astype(np.float32)

        # --- jmt_tpu pipeline
        clips = preprocess_clips(
            jnp.asarray(batch.clips).reshape(16, 8, img_size, img_size, 3))
        fmap = j_r2d1.apply(vr_tree, clips, features_only=True)
        vis = jnp.max(fmap.reshape(16, -1, 512), axis=1)[None]  # (1,16,512)
        aud = j_fc.apply({"params": fc_params}, jnp.asarray(wavlm))
        jv, ja = j_fusion.apply({"params": fu_params}, aud, vis)
        st_j.add_batch(np.asarray(jv), np.asarray(ja), batch.anchors,
                       batch.videos, batch.lengths, batch.labels_v,
                       batch.labels_a)

        # --- reference pipeline (torch, per its own semantics)
        with torch.no_grad():
            c = torch.from_numpy(
                batch.clips[0].astype(np.float32) / 255.0)
            mean = torch.tensor([0.43216, 0.394666, 0.37645])
            std = torch.tensor([0.22803, 0.22145, 0.216989])
            c = (c - mean) / std                      # (16,8,H,W,3)
            c = c.permute(0, 4, 1, 2, 3).contiguous()  # (16,3,8,H,W)
            t_r2d1(c)
            ft = t_r2d1.spatial_fts.reshape(16, 512, -1).max(dim=2)[0]
            t_vis = ft[None]
            t_aud = t_fc(torch.from_numpy(wavlm))
            tv, ta = t_fusion(t_aud, t_vis)
        vid = batch.videos[0]
        if vid not in preds_t_v:
            preds_t_v[vid] = np.zeros(batch.lengths[0])
            preds_t_a[vid] = np.zeros(batch.lengths[0])
        for j in range(16):
            fid = int(batch.anchors[0][j])
            if fid <= batch.lengths[0] and batch.labels_v[0][j] != -5.0:
                preds_t_v[vid][fid - 1] = float(tv[0][j])
                preds_t_a[vid][fid - 1] = float(ta[0][j])

    # --- compare stitched + smoothed traces
    from scipy.ndimage import uniform_filter1d as uf
    from jmt_tpu.ops.ccc import ccc_metric

    sv_j, sa_j = st_j.smoothed()
    vid = list(sv_j)[0]
    sv_t = uf(np.clip(preds_t_v[vid], -1, 1), 20, mode="constant")
    sa_t = uf(np.clip(preds_t_a[vid], -1, 1), 50, mode="constant")

    dv = float(np.abs(sv_j[vid] - sv_t).max())
    da = float(np.abs(sa_j[vid] - sa_t).max())
    ccc_vv = float(ccc_metric(jnp.asarray(sv_j[vid]), jnp.asarray(sv_t)))
    ccc_aa = float(ccc_metric(jnp.asarray(sa_j[vid]), jnp.asarray(sa_t)))
    result = {
        "max_abs_pred_delta_valence": dv,
        "max_abs_pred_delta_arousal": da,
        "cross_framework_ccc_valence": ccc_vv,
        "cross_framework_ccc_arousal": ccc_aa,
        "ccc_parity_delta": max(1 - ccc_vv, 1 - ccc_aa),
        "windows": len(ds),
    }
    print(json.dumps(result))
    # The binding criterion is the absolute prediction delta: with UNTRAINED
    # random weights the output traces are near-constant (std ~1e-3), so the
    # cross-framework CCC is ill-conditioned — fp32-level deltas of 1.7e-4
    # read as several 1e-3 of CCC. With trained weights (signal std ~0.3)
    # the same deltas map to CCC deltas well under 1e-3.
    assert result["max_abs_pred_delta_valence"] < 1e-3, result
    assert result["max_abs_pred_delta_arousal"] < 1e-3, result
    return result


def flagship(img_size: int = 112, length: int = 450,
             stride: int = 8) -> dict:
    """FLAGSHIP-config cross-framework parity: R2D1+I3D(+TCN) vision with
    intra-modal transformer fusion, ResNet18+wavLM audio with intra-modal
    transformer fusion, JMT w/ JR SELF_ATTEN — both frameworks end-to-end
    through stitching+smoothing (train.py:136-316 hot path).

    The reference AudioModel needs torchvision (absent in this image), so
    the torch side uses the torchvision-layout ResNet-18 twin from
    tests/test_backbone_parity (golden-verified there); torchaudio is also
    absent, so BOTH sides consume the same jmt_tpu log-mel spectrograms
    (the mel op itself has its own golden tests, tests/test_mel.py)."""
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F
    from reference_loader import load_reference_models
    from test_backbone_parity import _TorchResNet18
    from jmt_tpu.data.synthetic import synthetic_dataset
    from jmt_tpu.data.datasets import collate
    from jmt_tpu.data.transforms import preprocess_clips
    from jmt_tpu.models.video_resnet import VideoResNet
    from jmt_tpu.models.i3d import I3DTCN
    from jmt_tpu.models.resnet18 import ResNet18
    from jmt_tpu.models import TwoTransformers
    from jmt_tpu.models.intra_modal import IntraModalTransformerFusion
    from jmt_tpu.models import torch_io
    from jmt_tpu.ops.mel import log_mel
    from jmt_tpu.eval.stitch import Stitcher

    ref = load_reference_models()
    torch.manual_seed(0)

    # ---- torch components (reference modules; ResNet18 twin)
    t_r2d1 = ref.video_resnet.r2plus1d_18(pretrained=False)
    t_i3d = ref.I3DWSDDA.I3D_WSDDA(
        ref.pytorch_i3d_new.InceptionI3d(400, in_channels=3))
    t_resnet = _TorchResNet18(1)
    t_vfuse = ref.intra_modal_transformer_fusion.\
        Intra_modal_transformer_fusion(512, 1, 512, 1)
    t_afuse = ref.intra_modal_transformer_fusion.\
        Intra_modal_transformer_fusion(512, 1, 512, 1)
    t_fusion = ref.two_transformers.Two_transformers(
        0.0, 0.0, 1, 1, "TRANSFORMER", "SELF_ATTEN")
    mods = (t_r2d1, t_i3d, t_resnet, t_vfuse, t_afuse, t_fusion)
    for m in mods:
        m.eval()

    # ---- identical weights on the jax side
    vr_tree = torch_io.video_resnet_vars(t_r2d1.state_dict(), "r2plus1d")
    i3d_tree = torch_io.i3d_tcn_vars(t_i3d.state_dict())
    rn_tree = torch_io.resnet18_vars(t_resnet.state_dict())
    vf_params = torch_io.intra_modal_fusion_params(t_vfuse.state_dict(), 1)
    af_params = torch_io.intra_modal_fusion_params(t_afuse.state_dict(), 1)
    fu_params = torch_io.two_transformers_params(
        t_fusion.state_dict(), 1, "TRANSFORMER", "SELF_ATTEN")

    j_r2d1 = VideoResNet(arch="r2plus1d")
    j_i3d = I3DTCN()
    j_rn = ResNet18(in_channels=1)
    j_vfuse = IntraModalTransformerFusion()
    j_afuse = IntraModalTransformerFusion()
    j_fusion = TwoTransformers(joint_modalities="TRANSFORMER",
                               output_format="SELF_ATTEN")

    # stride>1 keeps the window count CPU-feasible (I3D at 224 in BOTH
    # frameworks per window); stitch/overlap semantics are unchanged
    ds = synthetic_dataset("val", n_videos=1, length=length,
                           img_size=img_size, stride=stride,
                           check_coverage=stride == 1)
    rng = np.random.default_rng(42)
    st_j = Stitcher(with_labels=True)
    preds_t_v, preds_t_a = {}, {}

    for i in range(len(ds)):
        batch = collate([ds[i]])
        wavlm = rng.normal(size=(1, 16, 768)).astype(np.float32)
        spec = np.asarray(log_mel(jnp.asarray(batch.audio[0]),
                                  batch_dims=1))   # (16, 64, 104)

        # --- jmt_tpu pipeline (channels-last)
        clips = preprocess_clips(jnp.asarray(batch.clips).reshape(
            16, 8, img_size, img_size, 3))
        fmap = j_r2d1.apply(vr_tree, clips, features_only=True)
        r2d1_f = jnp.max(fmap.reshape(16, -1, 512), axis=1)[None]
        from jmt_tpu.models.tsav import resize_clips_for_i3d
        i3d_t = j_i3d.apply(i3d_tree, resize_clips_for_i3d(clips))
        i3d_f = jnp.max(i3d_t, axis=1)[None]                 # (1,16,512)
        vis = j_vfuse.apply({"params": vf_params}, r2d1_f, i3d_f)
        rn_f = j_rn.apply(rn_tree, jnp.asarray(
            spec.transpose(0, 2, 1)[..., None]))[None]       # (1,16,512)
        aud = j_afuse.apply({"params": af_params}, rn_f,
                            jnp.asarray(wavlm))
        jv, ja = j_fusion.apply({"params": fu_params}, aud, vis)
        st_j.add_batch(np.asarray(jv), np.asarray(ja), batch.anchors,
                       batch.videos, batch.lengths, batch.labels_v,
                       batch.labels_a)

        # --- reference pipeline (torch, its own semantics throughout)
        with torch.no_grad():
            c = torch.from_numpy(batch.clips[0].astype(np.float32) / 255.0)
            mean = torch.tensor([0.43216, 0.394666, 0.37645])
            std = torch.tensor([0.22803, 0.22145, 0.216989])
            c = ((c - mean) / std).permute(0, 4, 1, 2, 3).contiguous()
            t_r2d1(c)
            t_r2 = t_r2d1.spatial_fts.reshape(16, 512, -1).max(dim=2)[0]
            # resize_clips_for_i3d (utils/utils.py:293-300)
            ci = c.permute(0, 2, 1, 3, 4)
            ci = F.interpolate(ci, size=(3, 224, 224), mode="trilinear",
                               align_corners=False).permute(0, 2, 1, 3, 4)
            t_i3 = t_i3d(ci).max(dim=1)[0]                   # (16, 512)
            t_vis = t_vfuse(t_r2[None], t_i3[None])
            t_rn = t_resnet(torch.from_numpy(spec)[:, None])  # (16,512)
            t_aud = t_afuse(t_rn[None], torch.from_numpy(wavlm))
            tv, ta = t_fusion(t_aud, t_vis)
        vid = batch.videos[0]
        if vid not in preds_t_v:
            preds_t_v[vid] = np.zeros(batch.lengths[0])
            preds_t_a[vid] = np.zeros(batch.lengths[0])
        for j in range(16):
            fid = int(batch.anchors[0][j])
            if fid <= batch.lengths[0] and batch.labels_v[0][j] != -5.0:
                preds_t_v[vid][fid - 1] = float(tv[0][j])
                preds_t_a[vid][fid - 1] = float(ta[0][j])

    from scipy.ndimage import uniform_filter1d as uf
    from jmt_tpu.ops.ccc import ccc_metric
    sv_j, sa_j = st_j.smoothed()
    vid = list(sv_j)[0]
    sv_t = uf(np.clip(preds_t_v[vid], -1, 1), 20, mode="constant")
    sa_t = uf(np.clip(preds_t_a[vid], -1, 1), 50, mode="constant")
    result = {
        "config": "FLAGSHIP R2D1+I3D/intra-tfm + ResNet18+wavLM/intra-tfm "
                  "-> JMT w/ JR SELF_ATTEN",
        "max_abs_pred_delta_valence":
            float(np.abs(sv_j[vid] - sv_t).max()),
        "max_abs_pred_delta_arousal":
            float(np.abs(sa_j[vid] - sa_t).max()),
        "cross_framework_ccc_valence":
            float(ccc_metric(jnp.asarray(sv_j[vid]), jnp.asarray(sv_t))),
        "cross_framework_ccc_arousal":
            float(ccc_metric(jnp.asarray(sa_j[vid]), jnp.asarray(sa_t))),
        "windows": len(ds),
    }
    print(json.dumps(result))
    assert result["max_abs_pred_delta_valence"] < 1e-3, result
    assert result["max_abs_pred_delta_arousal"] < 1e-3, result
    return result


def grad_parity() -> dict:
    """ONE-training-step GRADIENT parity on the fusion stack: identical
    weights/inputs, CCC loss (train.py:303-311 flattening), compare
    d(loss)/d(params) across frameworks (cosine + max abs delta). The
    torch grads are mapped through the SAME converter as the weights
    (transposition is linear, so torch_io applies to grad trees too).

    Runs in FLOAT64: at random init the fusion outputs are near-constant,
    so the CCC loss is catastrophically ill-conditioned (1/std terms with
    std ~ 1e-3) — fp32 forward noise of ~2e-5 reads as grad cosine ~0.99.
    An MSE-loss control at fp32 gives cosine 0.9999999 / max delta 1e-7
    (the network backward itself is bit-faithful); fp64 removes the
    conditioning artifact and proves the CCC backward is semantically
    exact too."""
    import jax.numpy as jnp
    import torch
    from reference_loader import load_reference_models
    from jmt_tpu.models import TwoTransformers
    from jmt_tpu.models import torch_io
    from jmt_tpu.ops.ccc import ccc_loss

    import jax as _jax
    _jax.config.update("jax_enable_x64", True)

    ref = load_reference_models()
    torch.manual_seed(0)
    t_fusion = ref.two_transformers.Two_transformers(
        0.0, 0.0, 1, 1, "TRANSFORMER", "SELF_ATTEN").double()
    t_fusion.train()
    fu_params = torch_io.two_transformers_params(
        t_fusion.state_dict(), 1, "TRANSFORMER", "SELF_ATTEN")
    j_fusion = TwoTransformers(joint_modalities="TRANSFORMER",
                               output_format="SELF_ATTEN")

    rng = np.random.default_rng(7)
    aud = rng.normal(size=(2, 8, 512))
    vis = rng.normal(size=(2, 8, 512))
    lv = rng.uniform(-1, 1, 16)
    la = rng.uniform(-1, 1, 16)

    # --- torch backward (reference CCCLoss semantics, losses/loss.py:18-32)
    def t_ccc_loss(x, y, eps=1e-8):
        x, y = x.reshape(-1), y.reshape(-1)
        vx, vy = x - x.mean(), y - y.mean()
        rho = (vx * vy).sum() / (
            torch.sqrt((vx ** 2).sum()) * torch.sqrt((vy ** 2).sum()) + eps)
        ccc = (2 * rho * x.std() * y.std()
               / (x.std() ** 2 + y.std() ** 2 + (x.mean() - y.mean()) ** 2))
        return 1.0 - ccc

    tv, ta = t_fusion(torch.from_numpy(aud), torch.from_numpy(vis))
    t_loss = (t_ccc_loss(tv, torch.from_numpy(lv))
              + t_ccc_loss(ta, torch.from_numpy(la)))
    t_loss.backward()
    grad_sd = {k: p.grad if p.grad is not None else torch.zeros_like(p)
               for k, p in t_fusion.named_parameters()}
    t_grads = torch_io.two_transformers_params(
        grad_sd, 1, "TRANSFORMER", "SELF_ATTEN")

    # --- jax grad
    import jax as _jax

    def loss_fn(p):
        v, a = j_fusion.apply({"params": p}, jnp.asarray(aud),
                              jnp.asarray(vis))
        return (ccc_loss(v.reshape(-1), jnp.asarray(lv))
                + ccc_loss(a.reshape(-1), jnp.asarray(la)))

    j_loss, j_grads = _jax.value_and_grad(loss_fn)(
        _jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), fu_params))

    want = np.concatenate([np.asarray(x).ravel()
                           for x in _jax.tree.leaves(t_grads)])
    got = np.concatenate([np.asarray(x).ravel()
                          for x in _jax.tree.leaves(j_grads)])
    assert want.shape == got.shape, (want.shape, got.shape)
    cos = float(np.dot(want, got)
                / (np.linalg.norm(want) * np.linalg.norm(got) + 1e-30))
    result = {
        "config": "grad parity: fusion stack, one CCC-loss backward, fp64",
        "loss_torch": float(t_loss), "loss_jax": float(j_loss),
        "grad_cosine": cos,
        "grad_max_abs_delta": float(np.abs(want - got).max()),
        "grad_norm": float(np.linalg.norm(want)),
    }
    print(json.dumps(result))
    # measured: loss delta 3e-8, cosine 1-2e-12, max grad delta 3.4e-7
    assert abs(result["loss_torch"] - result["loss_jax"]) < 1e-6, result
    assert cos > 0.999999, result
    assert result["grad_max_abs_delta"] < 1e-5, result
    return result


if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "base"):
        main()
    if which in ("all", "flagship"):
        flagship()
    # last: grad_parity flips jax_enable_x64 for the whole process
    if which in ("all", "grad"):
        grad_parity()
