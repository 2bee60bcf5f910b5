"""Importing reference-format .pt checkpoints end-to-end, and the
test-split previous-audio quirk."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def test_import_reference_fusion_pt(tmp_path):
    """torch.save'd Two_transformers state dict (the reference's
    SavedWeights/fusion_w.pt format, main.py:105-177) loads and produces
    identical outputs."""
    from reference_loader import load_reference_models
    from jmt_tpu.core.checkpoint import import_reference_torch_checkpoint
    from jmt_tpu.models import TwoTransformers
    ref_models = load_reference_models()
    ref = ref_models.two_transformers.Two_transformers(
        0.0, 0.0, 1, 1, "TRANSFORMER", "SELF_ATTEN")
    ref.eval()
    pt = str(tmp_path / "fusion_w.pt")
    torch.save(ref.state_dict(), pt)

    params = import_reference_torch_checkpoint(
        pt, "fusion", num_layers=1, joint_modalities="TRANSFORMER",
        output_format="SELF_ATTEN")
    rng = np.random.default_rng(0)
    aud = rng.normal(size=(2, 4, 512)).astype(np.float32)
    vis = rng.normal(size=(2, 4, 512)).astype(np.float32)
    with torch.no_grad():
        want_v, want_a = ref(torch.from_numpy(aud), torch.from_numpy(vis))
    got_v, got_a = TwoTransformers(joint_modalities="TRANSFORMER",
                                   output_format="SELF_ATTEN").apply(
        {"params": params}, jnp.asarray(aud), jnp.asarray(vis))
    np.testing.assert_allclose(np.asarray(got_v), want_v.numpy(), atol=2e-5)


def test_import_reference_tcn_i3d_style_pt(tmp_path):
    """DataParallel-prefixed .t7-style {'net': state_dict} payload
    (tsav.py:104-114) imports through the same entry point."""
    from reference_loader import load_reference_models
    from jmt_tpu.core.checkpoint import import_reference_torch_checkpoint
    from jmt_tpu.models.i3d import I3DTCN
    ref_models = load_reference_models()
    torch.manual_seed(0)
    i3d = ref_models.pytorch_i3d_new.InceptionI3d(400, in_channels=3)
    wsdda = ref_models.I3DWSDDA.I3D_WSDDA(i3d)
    sd = {f"module.{k}": v for k, v in wsdda.state_dict().items()}
    pt = str(tmp_path / "i3d.t7")
    torch.save({"net": sd}, pt)
    tree = import_reference_torch_checkpoint(pt, "i3d_tcn")
    # tree restores into the flax module without shape errors
    mod = I3DTCN()
    x = jnp.zeros((1, 8, 224, 224, 3))
    out = mod.apply(tree, x)
    assert out.shape == (1, 7, 512)


def test_test_split_previous_audio_quirk(tmp_path):
    from jmt_tpu.data.datasets import VideoRecord, WindowedDataset
    from jmt_tpu.data.audio_io import write_wav
    length = 450
    wav_dir = tmp_path / "wavs" / "v0"
    rng = np.random.default_rng(0)
    # first eval window (end=481) anchors are 1, 33, 65, ..., 481
    for anchor in range(1, 482, 32):
        if anchor == 65:
            # near-empty wav: 50 samples (clip index 2)
            write_wav(str(wav_dir / f"{anchor}.wav"),
                      np.ones(50, np.float32) * 0.5)
        else:
            write_wav(str(wav_dir / f"{anchor}.wav"),
                      rng.normal(size=22050).astype(np.float32) * 0.1)
    rec = VideoRecord(
        name="v0", image_paths=[f"missing/{i}.jpg"
                                for i in range(1, length + 1)],
        labels_v=np.zeros(length, np.float32),
        labels_a=np.zeros(length, np.float32),
        frame_ids=np.arange(1, length + 1), length=length,
        wav_dir=str(wav_dir))
    ds = WindowedDataset([rec], "test", use_native=False)
    s = ds[0]
    # anchor 96 is clip index 2: reused clip 1's audio, not 50 samples
    np.testing.assert_array_equal(s.audio[2], s.audio[1])
    assert s.audio[2].any()
    # val split does NOT have the quirk: pads the tiny wav instead
    ds_val = WindowedDataset([rec], "val", use_native=False)
    sv = ds_val[0]
    assert not np.array_equal(sv.audio[2], sv.audio[1])
    assert np.count_nonzero(sv.audio[2]) == 50
