"""Whole-inception-module Pallas TPU kernel.

Capability target: InceptionModule (reference pytorch_i3d_new.py:121-158) —
four parallel branches over one input (1x1 conv | 1x1->3x3x3 | 1x1->3x3x3 |
maxpool3x3x3->1x1), each conv followed by BN(eps 1e-3)+ReLU, outputs
concatenated on channels.

Why a whole-module kernel: XLA runs the I3D inception body at ~33% of the
bf16 roofline and resists PIECEWISE exact rewrites — three independent
measured negative results in round 2 (separable pools, block-diag conv
merges, a fused pool+1x1 Pallas kernel that won isolated but lost in
context because the custom-call boundary broke XLA's module-wide fusion;
STATUS.md r2 perf log). The remaining waste is structural: branch
intermediates and the pool round-trip through HBM, reduce_window pathology
at C=512, tiny-Cin convs. The only boundary where a custom call does NOT
break fusion is the module edge, where concat materializes the tensor
anyway. So: one kernel per module, input tile resident in VMEM across all
four branches, outputs written into the concat layout in place.

Design (v5e, 16 MB VMEM):
* grid (N, H/ht): one batch item x one H-tile per step. The input arrives
  UNPADDED; overlapping halo tiles are read with clamped `pl.Element`
  indexing (in-bounds) and the zero-padded working tile is assembled in a
  persistent VMEM scratch — no XLA pad op between chained modules (an
  extra HBM pass that measurably hurt in-context).
* all tensors live in merged-row 2.5-D form (T+2, (ht+2)*W2, C): a 3x3x3
  tap at (dt,dh,dw) is the STATIC slice [dt:dt+T, dh*W2+dw :+ ht*W2] —
  out-of-row wraparound reads land in the zero pad columns, so every tap
  is one slice + one MXU GEMM (K=branch channels, f32 accumulation), no
  im2col materialization.
* the three 1x1 branch convs (b0/b1a/b2a) are ONE GEMM over the halo tile
  (kernels pre-concatenated); BN is pre-folded into kernel+bias (frozen /
  eval BN: y = conv(x)*s + t, s = gamma/sqrt(var+eps), t = beta - mean*s),
  so every epilogue is relu(acc + bias).
* the pool branch is a 26-op shifted-max tree over the same resident tile
  (zero pad == the reference's F.pad(0) MaxPool3dSamePadding semantics,
  exact for the module's post-ReLU nonnegative inputs), then one GEMM.

The kernel is an inference/frozen-backbone path (BN running stats, no
dropout in inception): the model falls back to the unfused XLA path when
training BN or when grads must flow to its params. Numerics: identical
operation set to the XLA path, f32 accumulators; differs from it only by
float reassociation (tap order), validated to ~1e-5 rel in f32 and f64
~1e-12 in tests/test_inception_pallas.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fused_default_enabled() -> bool:
    """Resolve the model-level 'auto' setting: currently always False.

    Measured (v5e-1, bf16, 128 clips): the fused kernel wins the ISOLATED
    inception trunk (62.6 ms vs 67.9 XLA, all modules incl. Mixed_5) but
    LOSES inside the full I3D backbone and flagship, in every seam
    configuration tried:

        config                    i3d backbone   flagship
        XLA path                  105.7-105.9    150.7-151.2 ms
        fused (bare kernel)       112.1          156.4
        fused + avg-tail absorb   112.6          156.7
        fused + pool+tail absorb  122.5          162.7

    The avg-tail epilogue (Mixed_5c -> tail avgpool inside the kernel,
    98x smaller HBM output) is perf-NEUTRAL — so the Mixed_5c->tail seam
    was not the cost. Pool-prologue absorption LOSES ~10 ms: staying
    under the 16 MB scoped-VMEM limit with the pre-pool scratch + the
    2x-wide double-buffered input block forces fine H tiles (3b ht 4->2,
    4b 7->2, 5b 7->1; ht=4 at pooled-28 is 19.4 MB, AOT-measured) and
    grid granularity costs more than the absorbed seam saves. Remaining
    in-model deficit is the stem->Mixed_3b entry boundary plus XLA's
    cross-op scheduling/DMA overlap that a custom-call edge breaks —
    the same structural effect as round 2's fused pool+1x1 negative
    result, now confirmed across four configurations. The kernel remains
    opt-in (i3d_fused_inception=True, avg-tail absorbed, pools not).
    CPU never fuses (interpret-mode Pallas is test-only)."""
    try:
        return (_FUSED_AUTO_ON_TPU
                and jax.devices()[0].platform in ("tpu", "axon"))
    except Exception:
        return False


# model-level 'auto' gate; flip when the seam-absorbing kernel variants
# (pool prologue / avgpool epilogue) beat the XLA path END-TO-END
_FUSED_AUTO_ON_TPU = False

# pool-prologue gate for the fused path (models/i3d._pool_absorbable).
# MEASURED OFF (v5e-1, 128 clips): absorbing the pools forces fine H
# tiles to stay under the 16 MB scoped-VMEM limit (pooled modules carry
# the pre-pool scratch + a 2x-wide double-buffered input block; ht=4 at
# pooled-28 = 19.4 MB AOT-measured), and the finer grids cost more than
# the absorbed seam saves: i3d backbone fused 122.5 ms with pools
# absorbed vs 112.1 bare vs 105.7 XLA. avg_tail absorption (no tile
# change, 98x smaller output) is kept unconditionally.
_ABSORB_POOLS = False

# Mosaic scoped-VMEM limit override (MB). None = compiler default (16 MB —
# the limit every tile-size decision above was measured against; v5e has
# 128 MB physical VMEM). Raising it unlocks coarser H tiles (fewer grid
# steps, fatter GEMMs) and makes the pool-absorbed variants fit at the
# bare tile sizes; sweepable on-chip via tools/vmem_sweep.py.
_VMEM_LIMIT_MB = None

# sweep hook: (H, pooled: bool) -> ht override for the in-model path
# (inception_module_fused's auto tile table), settable per-experiment
_HT_TABLE: dict = {}


class FoldedInception(NamedTuple):
    """BN-folded weights for one inception module (biases f32)."""
    k1: jnp.ndarray    # (C, o0+o1+o3) merged b0|b1a|b2a 1x1 kernels
    b1: jnp.ndarray    # (o0+o1+o3,)
    kb1: jnp.ndarray   # (27, o1, o2) b1b 3x3x3 taps, t-major (dt,dh,dw)
    bb1: jnp.ndarray   # (o2,)
    kb2: jnp.ndarray   # (27, o3, o4) b2b taps
    bb2: jnp.ndarray   # (o4,)
    k3: jnp.ndarray    # (C, o5) b3b 1x1 kernel
    b3: jnp.ndarray    # (o5,)


def fold_bn(kernel: jnp.ndarray, gamma, beta, mean, var,
            eps: float = 1e-3):
    """conv+BN(running stats) == conv(k*s) + (beta - mean*s)."""
    s = gamma / jnp.sqrt(var + eps)
    return kernel * s, (beta - mean * s).astype(jnp.float32)


_TAPS = tuple((dt, dh, dw) for dt in range(3) for dh in range(3)
              for dw in range(3))

# test hook: force interpreter-mode pallas (CPU exactness tests of the
# model-integrated fused path, where the call site passes no flag)
_FORCE_INTERPRET = False


def _kernel(x_ref, k1_ref, b1_ref, kb1_ref, bb1_ref, kb2_ref, bb2_ref,
            k3_ref, b3_ref, out_ref, xs_ref, *scratch, T, ht, W, W2, n_h,
            spec, acc_dtype, pool=None, avg_tail=False):
    o0, o1, o2, o3, o4, o5 = spec
    i = pl.program_id(0)
    j = pl.program_id(1)

    # ---- assemble the zero-padded halo tile in persistent VMEM scratch.
    # x arrives UNPADDED (no XLA pad op between modules — measured to
    # matter in-context); the block is the clamped halo row range and the
    # T/H/W zero borders live only here. The scratch is zeroed once; core
    # writes below never touch the border cells, and the two j-dependent
    # halo rows are fixed up per step.
    @pl.when((i == 0) & (j == 0))
    def _init():
        xs_ref[...] = jnp.zeros_like(xs_ref)

    if pool is not None:
        # ---- POOL PROLOGUE (seam absorption): x is the PRE-pool tensor;
        # the preceding MaxPool3dSamePadding(kernel=(ks_t,ks,ks),
        # stride=(1,2,2)) is computed here during halo assembly, so the
        # pooled tensor never exists in HBM and the pool's XLA<->Pallas
        # seam disappears. Zero-pad == the reference's F.pad(0) semantics
        # (inputs are post-ReLU nonnegative).
        ks_t, ks = pool
        ps_ref = scratch[0]
        Hpre, Wpre = 2 * ht * n_h, 2 * W
        # clamped pre-pool block: rows [sc, sc+Bh); ps row r <-> pre row
        # s0 + r - 3 with s0 = 2*(j*ht-1) the unclamped halo start
        Bh = min(2 * ht + 2 + ks, Hpre)
        assert n_h == 1 or Bh == 2 * ht + 2 + ks, (
            "capped pre block only supported single-tile")

        @pl.when((i == 0) & (j == 0))
        def _init_ps():
            ps_ref[...] = jnp.zeros_like(ps_ref)

        # dst0 = (sc - s0) + 3: first tile 5, interior 3, last 2ht+5-Bh
        dst0 = jnp.where(j == 0, 5,
                         jnp.where(j == n_h - 1, 2 * ht + 5 - Bh, 3))
        ps_ref[1:T + 1, pl.ds(dst0, Bh), :Wpre, :] = x_ref[0]

        # stale-row protection: zero the consumer rows ([3, 2ht+4+ks])
        # not covered by this step's write
        zrow = jnp.zeros((T, 1, Wpre, ps_ref.shape[-1]), ps_ref.dtype)

        @pl.when(j == 0)
        def _zero_top_pre():      # pre rows -2, -1 (pooled halo row -1)
            ps_ref[1:T + 1, 3:5, :Wpre, :] = jnp.concatenate(
                [zrow, zrow], axis=1)

        if n_h > 1:
            @pl.when(j == n_h - 1)
            def _zero_bot_pre():  # pre rows >= Hpre (right SAME pad)
                for rr in range(2 * ht + 5, 2 * ht + 5 + ks):
                    ps_ref[1:T + 1, rr, :Wpre, :] = zrow[:, 0]
        else:
            for rr in range(5 + Bh, 2 * ht + 5 + ks):
                ps_ref[1:T + 1, rr, :Wpre, :] = zrow[:, 0]

        # pooled halo tile row-by-row: T-max (stride-1 SAME), H-max
        # (static rows 2*r_h+3+dh), then W-max via the (Wp/2, 2) sublane
        # split (stride-2 columns). Pad rows/cols come out zero naturally.
        Wp2p = ps_ref.shape[2]
        for r_h in range(ht + 2):
            mrow = None
            for dh in range(ks):
                row = 2 * r_h + 3 + dh
                if ks_t == 1:
                    s = ps_ref[1:T + 1, row, :, :]
                elif ks_t == 2:
                    s = jnp.maximum(ps_ref[1:T + 1, row, :, :],
                                    ps_ref[2:T + 2, row, :, :])
                else:
                    s = jnp.maximum(
                        jnp.maximum(ps_ref[0:T, row, :, :],
                                    ps_ref[1:T + 1, row, :, :]),
                        ps_ref[2:T + 2, row, :, :])
                mrow = s if mrow is None else jnp.maximum(mrow, s)
            r4 = mrow.reshape(T, Wp2p // 2, 2, -1)
            ev, od = r4[:, :, 0, :], r4[:, :, 1, :]
            pw = jnp.maximum(ev[:, :W, :], od[:, :W, :])
            if ks == 3:
                pw = jnp.maximum(pw, ev[:, 1:W + 1, :])
            if r_h == 0:
                # xs row 0 at j==0 is the following conv's zero-pad halo
                # row, NOT pooled row -1: for ks==3 the pool window of
                # "row -1" would reach real pre row 0 and leak data
                pw = jnp.where(j == 0, jnp.zeros_like(pw), pw)
            xs_ref[1:T + 1, r_h, 1:W + 1, :] = pw
    elif n_h == 1:
        xs_ref[1:T + 1, 1:ht + 1, 1:W + 1, :] = x_ref[0]
    else:
        # block start was clamp(j*ht-1, 0, H-ht-2): delta = true-start -
        # clamped-start in {-1 (j=0), 0 (interior), +1 (j=last)}
        delta = jnp.where(j == 0, -1, jnp.where(j == n_h - 1, 1, 0))
        dst0 = jnp.where(delta < 0, 1, 0)
        src0 = jnp.where(delta > 0, 1, 0)
        xs_ref[1:T + 1, pl.ds(dst0, ht + 1), 1:W + 1, :] = (
            x_ref[0, :, pl.ds(src0, ht + 1), :, :])

        @pl.when((j > 0) & (j < n_h - 1))
        def _interior_last_row():
            xs_ref[1:T + 1, ht + 1, 1:W + 1, :] = x_ref[0, :, ht + 1, :, :]

        @pl.when(j == 0)
        def _zero_top():   # stale real rows from the previous item's tiles
            xs_ref[1:T + 1, 0, 1:W + 1, :] = jnp.zeros(
                (T, W, xs_ref.shape[-1]), xs_ref.dtype)

        @pl.when(j == n_h - 1)
        def _zero_bottom():
            xs_ref[1:T + 1, ht + 1, 1:W + 1, :] = jnp.zeros(
                (T, W, xs_ref.shape[-1]), xs_ref.dtype)

    M2 = (ht + 2) * W2           # merged rows per T-slab of the halo tile
    Mt = ht * W2                 # merged rows per output T-slab (junk cols)
    # the scratch carries ONE extra zero H row (ht+3 total): tap slices
    # reach M2+2 (last row's dw=2 wrap) and the reads past M2 land in the
    # permanently-zero extra row — no value copy needed
    M2p = (ht + 3) * W2
    X3 = xs_ref[...].reshape(T + 2, M2p, -1)

    # ---- merged 1x1 GEMM over the full halo tile (b0 | b1a | b2a).
    # Result drops to the working dtype right after the f32 bias add — the
    # XLA path also runs branch bodies in bf16, and keeping y f32 was the
    # allocation that pushed the 28x28 modules over the 16 MB VMEM limit.
    C = X3.shape[-1]
    y = jnp.dot(X3.reshape((T + 2) * M2p, C), k1_ref[...],
                preferred_element_type=acc_dtype)
    y = (y + b1_ref[...].astype(acc_dtype)).astype(xs_ref.dtype)
    y = y.reshape(T + 2, M2p, -1)

    def core(v):  # (T, Mt, o) merged rows -> (T, ht, W, o)
        return v.reshape(T, ht, W2, -1)[:, :, :W, :]

    def emit(c0, c1, cb):
        """Write a branch's core tensor (T, ht, W, o) into out channels
        [c0, c1). avg_tail (seam absorption): instead of the spatial map,
        write AvgPool3d((2, H, W), stride 1, valid) of it — (T-1, o) per
        item — so the module's HBM output is 98x smaller and the
        Mixed_5c->tail XLA boundary disappears (pytorch_i3d_new.py:415)."""
        if not avg_tail:
            out_ref[:, :, :, c0:c1] = cb.astype(out_ref.dtype)
            return
        s = cb.astype(jnp.float32).sum(axis=(1, 2))     # (T, o)
        s = (s[:-1] + s[1:]) * (1.0 / (2 * ht * W))
        out_ref[:, c0:c1] = s.astype(out_ref.dtype)

    # b0: epilogue on the core slice only ("tap (1,1,1)": rows r+1, cols c+1)
    b0v = jax.nn.relu(y[1:T + 1, W2 + 1: W2 + 1 + Mt, :o0])
    emit(0, o0, core(b0v))

    # halo-validity mask: a branch-a activation at a PAD position must be 0
    # (relu(bias) otherwise — zero-pad SAME-conv semantics). W pads/junk and
    # T pads are static; H pads exist only on the outermost tiles (j-dep).
    m_iota = jax.lax.broadcasted_iota(jnp.int32, (T + 2, M2p, 1), 1)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (T + 2, M2p, 1), 0)
    r, c = m_iota // W2, m_iota % W2
    valid = ((c >= 1) & (c <= W) & (t_iota >= 1) & (t_iota <= T)
             & ((r >= 1) | (j > 0)) & ((r <= ht) | (j < n_h - 1)))

    def conv3_branch(a, kt_ref, bias_ref, oc):
        # taps grouped by dt: ONE K=9*ci GEMM per temporal tap instead of
        # 27 K=ci GEMMs — small-K MXU dispatches were the kernel's
        # bottleneck (tap-loop version merely TIED XLA in-chain, ~7.3 ms
        # per mixed4 module vs a ~2.1 ms roofline; see STATUS r3 log)
        ci = a.shape[-1]
        # M-split keeps the im2col buffer bounded (~2.2 MB): split along T
        # whenever the row count is 28x28-sized (VMEM is within ~1 MB of
        # the 16 MB limit there)
        n_m = 2 if (T * Mt >= 1500 and T % 2 == 0) else 1
        mrows = T * Mt // n_m
        parts = []
        for mi in range(n_m):
            ts = slice(mi * (T // n_m), (mi + 1) * (T // n_m))
            acc = None
            for dt in range(3):
                cols = jnp.concatenate(
                    [a[dt:dt + T, dh * W2 + dw: dh * W2 + dw + Mt, :]
                     [ts].reshape(mrows, ci)
                     for dh in range(3) for dw in range(3)], axis=-1)
                kt = kt_ref[dt * 9:(dt + 1) * 9].reshape(9 * ci, oc)
                d = jnp.dot(cols, kt, preferred_element_type=acc_dtype)
                acc = d if acc is None else acc + d
            acc = acc + bias_ref[...].astype(acc_dtype)
            parts.append(jax.nn.relu(acc))
        out = (parts[0] if n_m == 1
               else jnp.concatenate(parts, axis=0))
        return core(out.reshape(T, Mt, oc))

    a1 = jnp.where(valid, jax.nn.relu(y[:, :, o0:o0 + o1]), 0
                   ).astype(xs_ref.dtype)
    emit(o0, o0 + o2, conv3_branch(a1, kb1_ref, bb1_ref, o2))

    a2 = jnp.where(valid, jax.nn.relu(y[:, :, o0 + o1:]), 0
                   ).astype(xs_ref.dtype)
    emit(o0 + o2, o0 + o2 + o4, conv3_branch(a2, kb2_ref, bb2_ref, o4))

    # ---- pool branch: shifted-max tree (separable: T, then H, then W)
    p = jnp.maximum(jnp.maximum(X3[0:T], X3[1:T + 1]), X3[2:T + 2])
    p = jnp.maximum(jnp.maximum(p[:, 0:Mt], p[:, W2:W2 + Mt]),
                    p[:, 2 * W2:2 * W2 + Mt])
    # W-shift max: out m reads p[m..m+2]; the 2 lost tail entries are junk
    # cols (proved: the last real out entry sits at Mt - (W2-W) - 1 < Mt-2)
    p = jnp.maximum(jnp.maximum(p[:, 0:Mt - 2], p[:, 1:Mt - 1]), p[:, 2:Mt])
    p = jnp.concatenate(
        [p, jnp.zeros((T, 2, p.shape[-1]), p.dtype)], axis=1)
    b3v = jnp.dot(p.reshape(T * Mt, C), k3_ref[...],
                  preferred_element_type=acc_dtype)
    b3v = jax.nn.relu(b3v + b3_ref[...].astype(acc_dtype)).reshape(T, Mt, o5)
    emit(o0 + o2 + o4, o0 + o2 + o4 + o5, core(b3v))


def inception_module_fused(x: jnp.ndarray, fw: FoldedInception,
                           out_channels: Sequence[int], *,
                           pool_in=None, avg_tail: bool = False,
                           ht: int = 0, interpret: bool = False,
                           acc_dtype=jnp.float32,
                           vmem_limit_mb=None) -> jnp.ndarray:
    """x: (N, T, H, W, C) NONNEGATIVE (post-ReLU/pool — required for the
    zero-pad == -inf-pad maxpool equivalence). Returns the module output
    (N, T, H, W, o0+o2+o4+o5), concat layout identical to the XLA path.

    Seam absorption (the measured reason the bare kernel loses in-model —
    see fused_default_enabled):
    * pool_in=(kernel, strides): x is the PRE-pool tensor and the module
      computes MaxPool3dSamePadding(kernel, strides) on the fly during
      halo assembly. Supported: kernel (1|2|3, k, k) with stride (1,2,2),
      k in {2,3} — exactly the reference's pool2a/3a/4a/5a shapes.
    * avg_tail: the output is AvgPool3d((2, H, W), stride 1, valid) of
      the module output, shape (N, T-1, co) — the I3D feature-path tail
      (pytorch_i3d_new.py:415-416) — so the (N,T,H,W,co) map never
      reaches HBM.
    """
    interpret = interpret or _FORCE_INTERPRET
    o = tuple(out_channels)
    if pool_in is not None:
        kern_, str_ = pool_in
        assert tuple(str_) == (1, 2, 2) and kern_[1] == kern_[2] \
            and kern_[1] in (2, 3) and kern_[0] in (1, 2, 3), pool_in
        ks_t, ks = int(kern_[0]), int(kern_[1])
        n, T, Hpre, Wpre, C = x.shape
        assert Hpre % 2 == 0 and Wpre % 2 == 0, x.shape
        H, W = Hpre // 2, Wpre // 2
    else:
        ks_t = ks = 0
        n, T, H, W, C = x.shape
    lim = vmem_limit_mb if vmem_limit_mb is not None else _VMEM_LIMIT_MB
    if not ht:
        ht = int(_HT_TABLE.get((H, pool_in is not None), 0))
    if not ht:
        # 28x28 maps sit ~1 MB over the 16 MB VMEM limit at ht=7 — use
        # finer tiles there; 14/7 run one-or-two 7-row tiles. Pooled
        # modules carry the pre-pool scratch too: finer tiles at 14x14
        # (ht=2) and 7x7 (ht=1, C=832 pre tile) to stay inside VMEM.
        if avg_tail:
            ht = H  # avg_tail needs the full map in one tile
        elif lim is not None and lim >= 32:
            # raised scoped-VMEM limit: coarse tiles (pooled-28 ht=4 was
            # 19.4 MB AOT-measured — fits at >=32; non-pooled-28 ht=7 was
            # ~17 MB). Sweepable finer via _HT_TABLE.
            ht = 7 if H % 7 == 0 else H
        elif pool_in is not None:
            # pooled modules carry the pre-pool scratch + a 2x-wide input
            # block: ht=4 at pooled-28 was 19.4 MB scoped vmem (>16 limit,
            # measured AOT); ht=2 (ht=1 at 7x7, where ks=2 allows it)
            ht = 1 if H == 7 else 2
        else:
            ht = 4 if (H > 14 and H % 4 == 0) else 7
    if H % ht:
        ht = H  # fall back to one tile
    n_h = H // ht
    # interior-tile clamp-free guarantee (see _kernel dst0 derivation)
    assert ks <= 2 * ht or n_h == 1, (ks, ht)
    if avg_tail:
        assert n_h == 1, "avg_tail requires a single H tile (H==ht)"
        assert T >= 2, T
    W2 = _round_up(W + 2, 16)
    co = o[0] + o[2] + o[4] + o[5]

    fw = FoldedInception(*[a if a.ndim > 1 else a.reshape(1, -1)
                           for a in fw])  # biases 2-D for TPU layout
    wspec = [pl.BlockSpec(a.shape, lambda i, j, nd=a.ndim: (0,) * nd,
                          memory_space=pltpu.VMEM)
             for a in (fw.k1, fw.b1, fw.kb1, fw.bb1, fw.kb2, fw.bb2,
                       fw.k3, fw.b3)]
    flops = 2 * n * T * H * W * (C * (o[0] + o[1] + o[3])       # 1x1s
                                 + 27 * o[1] * o[2]             # b1b
                                 + 27 * o[3] * o[4]             # b2b
                                 + C * o[5])                    # b3b
    kern = functools.partial(
        _kernel, T=T, ht=ht, W=W, W2=W2, n_h=n_h,
        spec=(o[0], o[1], o[2], o[3], o[4], o[5]), acc_dtype=acc_dtype,
        pool=(ks_t, ks) if pool_in is not None else None,
        avg_tail=avg_tail)

    scratch = [pltpu.VMEM((T + 2, ht + 3, W2, C), x.dtype)]
    if pool_in is not None:
        Bh = min(2 * ht + 2 + ks, 2 * H)
        Wp2p = _round_up(2 * W + 2, 16)
        scratch.append(
            pltpu.VMEM((T + 2, 2 * ht + 7 + ks, Wp2p, C), x.dtype))
        in_spec = pl.BlockSpec(
            (pl.Element(1), pl.Element(T), pl.Element(Bh),
             pl.Element(2 * W), pl.Element(C)),
            lambda i, j: (i, 0,
                          jnp.clip(2 * (j * ht - 1), 0, 2 * H - Bh), 0, 0),
            memory_space=pltpu.VMEM)
    else:
        bh = min(ht + 2, H)  # clamped halo block height (n_h==1: whole H)
        in_spec = pl.BlockSpec(
            # Mosaic: all dims of a spec must be Element if any is
            (pl.Element(1), pl.Element(T), pl.Element(bh),
             pl.Element(W), pl.Element(C)),
            lambda i, j: (i, 0, jnp.clip(j * ht - 1, 0, H - bh), 0, 0),
            memory_space=pltpu.VMEM)

    if avg_tail:
        out_spec = pl.BlockSpec((None, T - 1, co), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n, T - 1, co), x.dtype)
    else:
        out_spec = pl.BlockSpec((None, T, ht, W, co),
                                lambda i, j: (i, 0, j, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n, T, H, W, co), x.dtype)

    extra = {}
    if lim is not None and not interpret:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(lim) * 2**20)
    return pl.pallas_call(
        kern,
        grid=(n, n_h),
        in_specs=[in_spec, *wspec],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=(x.size + int(np.prod(
                out_shape.shape))) * x.dtype.itemsize, transcendentals=0),
        interpret=interpret,
        **extra,
    )(x, fw.k1, fw.b1, fw.kb1, fw.bb1, fw.kb2, fw.bb2, fw.k3, fw.b3)


def fold_inception_weights(get, dtype) -> FoldedInception:
    """Build FoldedInception from a getter: get(branch) ->
    (kernel (kt,kh,kw,ci,co), gamma, beta, mean, var)."""
    parts = {}
    for name in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b"):
        k, g, b, m, v = get(name)
        kf, bf = fold_bn(k, g, b, m, v)
        parts[name] = (kf.astype(dtype), bf)
    k1 = jnp.concatenate([parts["b0"][0].reshape(parts["b0"][0].shape[-2], -1),
                          parts["b1a"][0].reshape(
                              parts["b1a"][0].shape[-2], -1),
                          parts["b2a"][0].reshape(
                              parts["b2a"][0].shape[-2], -1)], axis=-1)
    b1 = jnp.concatenate([parts["b0"][1], parts["b1a"][1], parts["b2a"][1]])
    kb1 = parts["b1b"][0].reshape(27, *parts["b1b"][0].shape[-2:])
    kb2 = parts["b2b"][0].reshape(27, *parts["b2b"][0].shape[-2:])
    k3 = parts["b3b"][0].reshape(parts["b3b"][0].shape[-2], -1)
    return FoldedInception(k1, b1, kb1, parts["b1b"][1], kb2,
                           parts["b2b"][1], k3, parts["b3b"][1])
