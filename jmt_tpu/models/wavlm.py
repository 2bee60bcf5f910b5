"""WavLM feature encoder — TPU-native inference path.

Capability context: the reference pipeline CONSUMES precomputed 768-d
per-frame WavLM features (train.py:150-171; the exploder
create_wavlm_audio_feat.py only reshuffles a CSV that some external tool
produced — the WavLM model itself is not in the reference repo, SURVEY.md
§2.1). This module closes that external dependency: given a WavLM torch
checkpoint (e.g. microsoft/wavlm-base-plus, the standard choice for
Affwild2 pipelines), features are computed on-device by a jitted JAX
graph, so the whole audio path runs inside the framework.

Inference-only by design (feature extraction): no masking, no dropout,
no layerdrop, no adapter. Architecture per the public WavLM paper
(arXiv 2110.13900) and validated numerically against the torch
implementation shipped in `transformers` (tests/test_wavlm.py, random
weights, <=1e-5):

  wav (B, L)
  -> feature encoder: 7 conv1d (512ch; k=10,3,3,3,3,2,2; s=5,2,2,2,2,2,2),
     layer 0 followed by per-channel GroupNorm(512 groups), all GELU
  -> feature projection: LayerNorm -> Linear 512->768
  -> transformer encoder (12 layers, post-LN):
     * positional conv embedding: grouped conv1d k=128 g=16 (weight-normed
       in torch; the converter folds g*v/||v|| into one kernel), SAME pad
       with one trailing column dropped (even k), GELU, residual add,
       then LayerNorm
     * per layer: self-attention with GATED RELATIVE POSITION BIAS —
       a T5-style bucketed bias (320 buckets, max distance 800) computed
       once in layer 0 and shared, scaled per (batch, head, query) by a
       sigmoid gate projected from the layer input — then post-LN MLP
       (768->3072 GELU ->768).

Params are a plain pytree (converted from a torch state dict by
`wavlm_params_from_torch`); apply is functional — this model is an
offline/streaming feature extractor, not part of the trained model tree.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class WavLMConfig:
    """Subset of the HF WavLMConfig that the inference path needs.
    Defaults = wavlm-base / base-plus."""
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Sequence[int] = (512,) * 7
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_bucket_distance: int = 800
    layer_norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def frame_stride(self) -> int:
        """Input samples per output frame (320 for the base configs)."""
        out = 1
        for s in self.conv_stride:
            out *= s
        return out

    @property
    def receptive_field(self) -> int:
        """Input samples seen by one output frame (400 for base)."""
        r = 1
        for k, s in zip(reversed(self.conv_kernel),
                        reversed(self.conv_stride)):
            r = (r - 1) * s + k
        return r

    def n_frames(self, n_samples: int) -> int:
        """Output frames for an input of n_samples (VALID convs)."""
        t = n_samples
        for k, s in zip(self.conv_kernel, self.conv_stride):
            t = (t - k) // s + 1
        return t

    @classmethod
    def from_hf(cls, hf_cfg) -> "WavLMConfig":
        assert not getattr(hf_cfg, "do_stable_layer_norm", False), \
            "stable-LN (large) variant not implemented"
        assert hf_cfg.feat_extract_norm == "group", hf_cfg.feat_extract_norm
        return cls(
            hidden_size=hf_cfg.hidden_size,
            num_hidden_layers=hf_cfg.num_hidden_layers,
            num_attention_heads=hf_cfg.num_attention_heads,
            intermediate_size=hf_cfg.intermediate_size,
            conv_dim=tuple(hf_cfg.conv_dim),
            conv_stride=tuple(hf_cfg.conv_stride),
            conv_kernel=tuple(hf_cfg.conv_kernel),
            num_conv_pos_embeddings=hf_cfg.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=(
                hf_cfg.num_conv_pos_embedding_groups),
            num_buckets=hf_cfg.num_buckets,
            max_bucket_distance=hf_cfg.max_bucket_distance,
            layer_norm_eps=hf_cfg.layer_norm_eps)


def _ln(x, p, eps):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _conv1d(x, kernel, stride=1, groups=1, padding="VALID"):
    """x: (B, T, C); kernel: (K, Cin/groups, Cout)."""
    return jax.lax.conv_general_dilated(
        x, kernel, (stride,), padding,
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups)


def relative_position_buckets(T: int, num_buckets: int,
                              max_distance: int) -> np.ndarray:
    """T5-style bidirectional bucket matrix (T, T), built host-side at
    trace time (T is static)."""
    ctx = np.arange(T)[:, None]
    mem = np.arange(T)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1).astype(np.float64) / max_exact)
        / math.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(is_small, rel, large)
    return buckets


def wavlm_apply(params, wav: jnp.ndarray, cfg: WavLMConfig) -> jnp.ndarray:
    """wav: (B, L) float32 in [-1, 1] -> (B, T, hidden) features.

    NB: HF checkpoints expect zero-mean/unit-var normalized input
    (Wav2Vec2FeatureExtractor do_normalize) — the caller normalizes.
    """
    eps = cfg.layer_norm_eps
    x = wav[..., None]  # (B, L, 1)

    # ---- feature encoder
    fe = params["feature_encoder"]

    def fe_conv(x, i):
        x = _conv1d(x, fe[f"conv{i}"], stride=cfg.conv_stride[i])
        if f"conv{i}_bias" in fe:     # conv_bias=True variants
            x = x + fe[f"conv{i}_bias"]
        return x

    x = fe_conv(x, 0)
    # GroupNorm(groups == channels): per-channel normalize over time
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
    x = x * fe["gn_scale"] + fe["gn_bias"]
    x = _gelu(x)
    for i in range(1, len(cfg.conv_dim)):
        x = _gelu(fe_conv(x, i))

    # ---- feature projection
    fp = params["feature_projection"]
    x = _ln(x, fp["ln"], eps)
    x = x @ fp["proj_kernel"] + fp["proj_bias"]

    # ---- positional conv embedding (SAME pad, drop trailing col: even k)
    pc = params["pos_conv"]
    half = cfg.num_conv_pos_embeddings // 2
    xp = jnp.pad(x, ((0, 0), (half, half), (0, 0)))
    pos = _conv1d(xp, pc["kernel"],
                  groups=cfg.num_conv_pos_embedding_groups) + pc["bias"]
    pos = _gelu(pos[:, :-1] if cfg.num_conv_pos_embeddings % 2 == 0
                else pos)
    x = _ln(x + pos, params["encoder_ln"], eps)

    B, T, _ = x.shape
    H, dh = cfg.num_attention_heads, cfg.head_dim
    buckets = jnp.asarray(relative_position_buckets(
        T, cfg.num_buckets, cfg.max_bucket_distance))
    # (T, T, H) -> (H, T, T); computed once, shared by all layers
    position_bias = jnp.transpose(params["rel_attn_embed"][buckets],
                                  (2, 0, 1))

    for lp in params["layers"]:
        a = lp["attn"]
        # gate from the PRE-attention hidden states: (B, T, H, dh) heads
        g = x.reshape(B, T, H, dh)
        g = g @ a["gru_kernel"] + a["gru_bias"]           # (B, T, H, 8)
        g = g.reshape(B, T, H, 2, 4).sum(-1)              # (B, T, H, 2)
        g = jax.nn.sigmoid(g)
        gate_a, gate_b = g[..., 0], g[..., 1]             # (B, T, H)
        # gru_const: torch shape (1, H, 1, 1) -> (H,)
        gate = gate_a * (gate_b * a["gru_const"] - 1.0) + 2.0
        # gated bias: gate is per (batch, head, QUERY row)
        bias = (gate.transpose(0, 2, 1)[..., None]        # (B, H, T, 1)
                * position_bias[None])                    # (B, H, T, T)

        q = (x @ a["q_kernel"] + a["q_bias"]).reshape(B, T, H, dh)
        k = (x @ a["k_kernel"] + a["k_bias"]).reshape(B, T, H, dh)
        v = (x @ a["v_kernel"] + a["v_bias"]).reshape(B, T, H, dh)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(dh)
        probs = jax.nn.softmax(logits + bias, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, H * dh)
        o = o @ a["out_kernel"] + a["out_bias"]

        x = _ln(x + o, lp["ln1"], eps)
        h = _gelu(x @ lp["ff1_kernel"] + lp["ff1_bias"])
        h = h @ lp["ff2_kernel"] + lp["ff2_bias"]
        x = _ln(x + h, lp["ln2"], eps)
    return x


# ---------------------------------------------------------------------------
# torch -> JAX conversion
# ---------------------------------------------------------------------------

def _t(a):
    import torch
    if isinstance(a, torch.Tensor):
        a = a.detach().cpu().numpy()
    return np.asarray(a, dtype=np.float32)


def wavlm_params_from_torch(sd, cfg: WavLMConfig):
    """Convert a torch WavLMModel state dict (HF layout, optionally
    prefixed 'wavlm.') to the pytree wavlm_apply consumes.

    Conv1d kernels (O, I, K) -> (K, I, O); Linear (O, I) -> (I, O). The
    weight-normed positional conv is folded: W = g * v / ||v||_(dims!=2),
    matching torch weight_norm(dim=2) — exact for inference."""
    sd = {k[len("wavlm."):] if k.startswith("wavlm.") else k: v
          for k, v in sd.items()}

    def lin(prefix):
        return (_t(sd[prefix + ".weight"]).T, _t(sd[prefix + ".bias"]))

    def lnp(prefix):
        return {"scale": _t(sd[prefix + ".weight"]),
                "bias": _t(sd[prefix + ".bias"])}

    fe = {}
    for i in range(len(cfg.conv_dim)):
        w = _t(sd[f"feature_extractor.conv_layers.{i}.conv.weight"])
        fe[f"conv{i}"] = np.transpose(w, (2, 1, 0))
        bk = f"feature_extractor.conv_layers.{i}.conv.bias"
        if bk in sd:
            fe[f"conv{i}_bias"] = _t(sd[bk])
    fe["gn_scale"] = _t(
        sd["feature_extractor.conv_layers.0.layer_norm.weight"])
    fe["gn_bias"] = _t(
        sd["feature_extractor.conv_layers.0.layer_norm.bias"])

    pk, pb = lin("feature_projection.projection")
    fp = {"ln": lnp("feature_projection.layer_norm"),
          "proj_kernel": pk, "proj_bias": pb}

    # weight-normed pos conv: both the new parametrizations layout
    # (original0/original1) and the legacy weight_g/weight_v layout
    base = "encoder.pos_conv_embed.conv"
    if base + ".parametrizations.weight.original0" in sd:
        g = _t(sd[base + ".parametrizations.weight.original0"])
        v = _t(sd[base + ".parametrizations.weight.original1"])
    elif base + ".weight_g" in sd:
        g = _t(sd[base + ".weight_g"])
        v = _t(sd[base + ".weight_v"])
    else:  # already-folded plain weight
        g = None
        v = _t(sd[base + ".weight"])
    if g is not None:
        norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
        v = g * v / norm  # (O, I/g, K), norm over dims != 2
    pos = {"kernel": np.transpose(v, (2, 1, 0)),
           "bias": _t(sd[base + ".bias"])}

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layers.{i}"
        qk, qb = lin(p + ".attention.q_proj")
        kk, kb = lin(p + ".attention.k_proj")
        vk, vb = lin(p + ".attention.v_proj")
        ok, ob = lin(p + ".attention.out_proj")
        gk, gb = lin(p + ".attention.gru_rel_pos_linear")
        f1k, f1b = lin(p + ".feed_forward.intermediate_dense")
        f2k, f2b = lin(p + ".feed_forward.output_dense")
        layers.append({
            "attn": {
                "q_kernel": qk, "q_bias": qb, "k_kernel": kk, "k_bias": kb,
                "v_kernel": vk, "v_bias": vb, "out_kernel": ok,
                "out_bias": ob, "gru_kernel": gk, "gru_bias": gb,
                "gru_const": _t(
                    sd[p + ".attention.gru_rel_pos_const"]).reshape(-1),
            },
            "ln1": lnp(p + ".layer_norm"),
            "ff1_kernel": f1k, "ff1_bias": f1b,
            "ff2_kernel": f2k, "ff2_bias": f2b,
            "ln2": lnp(p + ".final_layer_norm"),
        })

    return {
        "feature_encoder": fe,
        "feature_projection": fp,
        "pos_conv": pos,
        "encoder_ln": lnp("encoder.layer_norm"),
        "rel_attn_embed": _t(sd["encoder.layers.0.attention"
                                ".rel_attn_embed.weight"]),
        "layers": layers,
    }
