"""CLI entry point — parse_input equivalent (parseit.py:561-827).

Usage:
    python -m jmt_tpu.cli --config config.json [--set key=value ...] \
        [--synthetic N_VIDEOS:LENGTH]

Overrides accept both dotted paths and the reference's prefix forms
(``opt__lr=1e-3``, ``train_params__loader_params__batch_size=8``). The
``--synthetic`` flag swaps in the in-memory data source (the reference's
smoke-run convention: take_n_videos 2 + max_epochs 1, README.MD:98-106,
without needing Affwild2 on disk).

Eval mode reloads ``final_config.yml`` from the experiment dir and runs
stitched validation / challenge-test inference from the saved state
(parity with parseit.py:660-663 + main.py:508-792 — minus the reference's
NameError on its eval path, parseit.py:762).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict

from jmt_tpu.core.config import Config, ExperimentDir, apply_overrides
from jmt_tpu.core.logging import init_logger


def _parse_value(v: str):
    try:
        return json.loads(v)
    except json.JSONDecodeError:
        return v


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="jmt_tpu trainer")
    p.add_argument("--config", default=None,
                   help="JSON/YAML config file (config_file.json schema)")
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   help="override: dotted path or reference prefix form")
    p.add_argument("--synthetic", default=None, metavar="N:LEN",
                   help="use the synthetic data source (e.g. 2:481)")
    p.add_argument("--mode", "--Mode", default=None,
                   choices=["Training", "Eval"])
    p.add_argument("--exp-dir", "--fd_exp", default=None,
                   help="Eval mode: experiment dir to reload (the "
                        "reference's --fd_exp, README.MD:188)")
    p.add_argument("--eval-split", "--eval_set", default="val",
                   choices=["val", "test"],
                   help="Eval mode: stitched validation or challenge-test "
                        "txt inference (test.py semantics; the reference's "
                        "--eval_set)")
    p.add_argument("--resume", action="store_true",
                   help="Training mode: restore the full train state from "
                        "the experiment dir and continue")
    p.add_argument("--eval-weights", default="auto",
                   choices=["auto", "components", "state"],
                   help="Eval mode: 'components' assembles the model from "
                        "per-component SavedWeights files (ours .msgpack or "
                        "reference .pt — main.py:508-609 parity, the BEST "
                        "epoch); 'state' restores the monolithic "
                        "train_state.msgpack (the FINAL state); 'auto' "
                        "prefers components when present")
    p.add_argument("--weights-dir", default=None,
                   help="Eval mode: directory holding the weight files "
                        "(defaults to <exp-dir>/SavedWeights; point it at a "
                        "reference SavedWeights dir to evaluate a "
                        "reference-trained model)")
    p.add_argument("--export-pt", default=None, metavar="WEIGHTS_DIR",
                   help="convert a SavedWeights dir of .msgpack components "
                        "to reference-format .pt state dicts (reverse "
                        "interop: the reference stack can then evaluate a "
                        "jmt_tpu-trained model, main.py:508-609) and exit")
    # Unknown --key value / --key=value flags become config overrides so a
    # reference main.py command line works VERBATIM (--opt__lr 0.0001,
    # --freeze_vision_R2D1 True, --train_params__batch_size 32, ...;
    # parseit.py:85-345 semantics). docs/MIGRATION.md documents the mapping.
    args, extra = p.parse_known_args(argv)
    passthrough = []
    i = 0
    while i < len(extra):
        tok = extra[i]
        if not tok.startswith("--"):
            raise SystemExit(f"unrecognized argument: {tok}")
        key = tok[2:]
        if "=" in key:
            passthrough.append(key)
            i += 1
        elif i + 1 < len(extra) and not extra[i + 1].startswith("--"):
            passthrough.append(f"{key}={extra[i + 1]}")
            i += 2
        else:
            raise SystemExit(f"flag {tok} needs a value")
    args.set = list(args.set) + passthrough
    return args


def build_config(args) -> Config:
    if args.mode == "Eval" and args.exp_dir:
        final = os.path.join(args.exp_dir, "final_config.yml")
        cfg = Config.from_file(final)
        cfg.Mode = "Eval"
        return cfg
    raw: Dict = {}
    if args.config:
        with open(args.config) as f:
            raw = (json.load(f) if args.config.endswith(".json")
                   else __import__("yaml").safe_load(f))
    overrides = {}
    for kv in args.set:
        k, _, v = kv.partition("=")
        overrides[k] = _parse_value(v)
    if args.mode:
        overrides["Mode"] = args.mode
    raw = apply_overrides(raw, overrides)
    return Config.from_dict(raw)


def make_datasets(cfg: Config, synthetic: str = None):
    if synthetic:
        from jmt_tpu.data.synthetic import (synthetic_dataset,
                                            synthetic_wavlm_store)
        parts = synthetic.split(":")
        n = int(parts[0])
        length = int(parts[1]) if len(parts) > 1 else 481
        img = int(parts[2]) if len(parts) > 2 else 112
        # no coverage check: smoke runs legitimately use stride overrides
        # that leave anchor gaps (the check guards REAL annotation trees)
        train = synthetic_dataset("train", n_videos=n, length=length,
                                  stride=cfg.train_params.stride,
                                  img_size=img, check_coverage=False)
        val = synthetic_dataset("val", n_videos=n, length=length,
                                stride=cfg.val_params.stride, img_size=img,
                                check_coverage=False)
        # deterministic in-memory 'precomputed' wavLM features so the
        # flagship config (wavLM audio backbone) smoke-drives too
        return train, val, None, synthetic_wavlm_store()
    from jmt_tpu.data.datasets import (load_video_records, WindowedDataset,
                                       WavlmFeatureStore)
    from jmt_tpu.data.windowing import TRAIN_SKIP_VIDS
    # 5-fold split convention (parseit.py:480-514) — fills empty labelpaths
    cfg.auto_set_label_paths()
    if not (cfg.train_params.labelpath and cfg.dataset_wavspath):
        raise SystemExit(
            "no dataset configured: set dataset_annotations/"
            "dataset_rootpath/dataset_wavspath/dataset_realtimestamps "
            "(+ wavlm_features for the wavLM backbone) in the config — "
            "see docs/MIGRATION.md §data prep — or pass --synthetic "
            "N:LEN[:IMG] for a no-data smoke run")
    train_recs = load_video_records(
        cfg.train_params.labelpath, cfg.dataset_wavspath,
        cfg.dataset_realtimestamps, skip=TRAIN_SKIP_VIDS,
        take_n_videos=cfg.train_params.take_n_videos)
    val_recs = load_video_records(
        cfg.val_params.labelpath, cfg.dataset_wavspath,
        cfg.dataset_realtimestamps,
        take_n_videos=cfg.val_params.take_n_videos)
    train = WindowedDataset(train_recs, "train",
                            stride=cfg.train_params.stride,
                            win_length=cfg.train_params.seq_length,
                            audio_samples=cfg.audio_samples)
    val = WindowedDataset(val_recs, "val", stride=cfg.val_params.stride,
                          win_length=cfg.val_params.seq_length,
                          audio_samples=cfg.audio_samples)
    test = None
    if cfg.test_params.labelpath and os.path.isdir(cfg.test_params.labelpath):
        test_recs = load_video_records(
            cfg.test_params.labelpath, cfg.dataset_wavspath,
            cfg.dataset_realtimestamps)
        test = WindowedDataset(test_recs, "test",
                               stride=cfg.test_params.stride,
                               win_length=cfg.test_params.seq_length,
                               check_coverage=False,
                               audio_samples=cfg.audio_samples)
    store = (WavlmFeatureStore(cfg.wavlm_features)
             if "wavLM" in cfg.model_params.l_audio_backbones else None)
    return train, val, test, store


def main(argv=None) -> int:
    args = parse_args(argv)
    if args.export_pt:
        from jmt_tpu.models.torch_export import export_reference_pt
        written = export_reference_pt(args.export_pt)
        print(json.dumps({"exported": sorted(written)}))
        return 0
    cfg = build_config(args)
    from jmt_tpu.core.compcache import enable_compilation_cache
    enable_compilation_cache(cfg.compilation_cache_dir or None)
    exp = ExperimentDir(cfg)
    # stdout backend gated on cfg.verbose (reference parseit.py:594-595)
    init_logger(exp.path if cfg.Mode == "Training" or args.exp_dir
                else None, stdout=cfg.verbose)
    train_ds, val_ds, test_ds, store = make_datasets(cfg, args.synthetic)

    from jmt_tpu.train.runner import Runner
    runner = Runner(cfg, train_ds, val_ds, wavlm_store=store,
                    test_ds=test_ds)
    if cfg.Mode == "Training":
        # auto-resume a preempted run: a preemption-restart loop re-issues
        # the IDENTICAL command, so when graceful_preemption left a train
        # state behind without passed.txt, pick it up even without --resume.
        # Gated on the preempted.txt sentinel (written ONLY by the graceful
        # exit path) so ordinary crashes — OOM, Ctrl-C, bad config — don't
        # silently resume a stale state; those need an explicit --resume.
        preempted_state = (cfg.graceful_preemption
                           and not exp.already_done()
                           and os.path.isfile(exp.preempted_marker)
                           and os.path.isfile(os.path.join(
                               exp.weights_dir, "train_state.msgpack")))
        if args.resume or preempted_state:
            runner.resume()
        perfs = runner.fit()
        print(json.dumps({"best": perfs.get("best", {})}, default=float))
        return 0
    # Eval mode: reload saved weights, re-validate or run challenge test.
    # 'components' = per-component best-epoch files (reference semantics,
    # main.py:508-609); 'state' = monolithic final train state.
    runner.initialize()
    from jmt_tpu.core import checkpoint as ckpt
    import glob
    wdir = args.weights_dir or exp.weights_dir
    # train_state.msgpack is the full-state file, not a component
    has_components = any(
        not p.endswith(ckpt.STATE_FILE)
        for p in glob.glob(os.path.join(wdir, "*.msgpack"))
        + glob.glob(os.path.join(wdir, "*.pt")))
    if args.eval_weights == "components" or (
            args.eval_weights == "auto" and has_components):
        runner.load_components(wdir)
    else:
        runner.state = ckpt.restore_train_state(wdir, runner.state)
    if args.eval_split == "test":
        out_dir = os.path.join(exp.path, "test_predictions")
        runner.test(out_dir, store_pkl=os.path.join(
            exp.path, "test-reevaluation.pkl"))
        print(json.dumps({"test_predictions_dir": out_dir}))
        return 0
    m = runner.validate(store_pkl=os.path.join(
        exp.path, "valid-reevaluation.pkl"))
    print(json.dumps({"valid_ccc_v": m.valid_ccc_v,
                      "valid_ccc_a": m.valid_ccc_a}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
