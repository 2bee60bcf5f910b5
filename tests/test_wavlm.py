"""WavLM inference path vs the torch implementation (transformers).

Random-init tiny config: every submodule (feature encoder + GroupNorm,
feature projection, weight-normed positional conv, gated-relative-
position-bias attention, post-LN MLP) must match the torch forward.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from jmt_tpu.models.wavlm import (WavLMConfig, wavlm_apply,
                                  wavlm_params_from_torch,
                                  relative_position_buckets)


def _tiny_hf_config():
    from transformers import WavLMConfig as HFConfig
    return HFConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=48,
        conv_dim=(12, 12, 16), conv_stride=(4, 2, 2), conv_kernel=(6, 3, 3),
        num_feat_extract_layers=3,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        num_buckets=14, max_bucket_distance=50,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        layerdrop=0.0, do_stable_layer_norm=False,
        feat_extract_norm="group")


@pytest.mark.slow
def test_wavlm_matches_torch():
    import torch
    from transformers import WavLMModel
    torch.manual_seed(0)
    hf_cfg = _tiny_hf_config()
    tm = WavLMModel(hf_cfg).eval()

    cfg = WavLMConfig.from_hf(hf_cfg)
    params = wavlm_params_from_torch(tm.state_dict(), cfg)

    rng = np.random.default_rng(0)
    wav = rng.normal(size=(2, 800)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(wav)).last_hidden_state.numpy()

    out = np.asarray(wavlm_apply(params, jnp.asarray(wav), cfg))
    assert out.shape == ref.shape == (2, cfg.n_frames(800),
                                      cfg.hidden_size)
    delta = np.max(np.abs(out - ref)) / np.max(np.abs(ref))
    assert delta < 1e-5, delta


@pytest.mark.slow
def test_wavlm_conv_bias_variant():
    import torch
    from transformers import WavLMModel
    torch.manual_seed(1)
    hf_cfg = _tiny_hf_config()
    hf_cfg.conv_bias = True
    tm = WavLMModel(hf_cfg).eval()
    cfg = WavLMConfig.from_hf(hf_cfg)
    params = wavlm_params_from_torch(tm.state_dict(), cfg)
    wav = np.random.default_rng(1).normal(size=(1, 500)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(wav)).last_hidden_state.numpy()
    out = np.asarray(wavlm_apply(params, jnp.asarray(wav), cfg))
    delta = np.max(np.abs(out - ref)) / np.max(np.abs(ref))
    assert delta < 1e-5, delta


def test_bucket_matrix_matches_torch_formula():
    # cross-check the host-side bucket builder against the torch one
    import torch
    import math

    def torch_buckets(T, num_buckets, max_distance):
        ctx = torch.arange(T)[:, None]
        mem = torch.arange(T)[None, :]
        rel = mem - ctx
        nb = num_buckets // 2
        out = (rel > 0).long() * nb
        rel = rel.abs()
        max_exact = nb // 2
        is_small = rel < max_exact
        large = (torch.log(rel.float() / max_exact)
                 / math.log(max_distance / max_exact) * (nb - max_exact))
        large = (max_exact + large).long().clamp(max=nb - 1)
        out += torch.where(is_small, rel, large)
        return out.numpy()

    for T, nb, md in ((7, 14, 50), (64, 320, 800), (199, 320, 800)):
        ours = relative_position_buckets(T, nb, md)
        ref = torch_buckets(T, nb, md)
        assert (ours == ref).all(), (T, nb, md)
    # buckets must stay in range (embedding table bound)
    assert relative_position_buckets(2048, 320, 800).max() < 320
