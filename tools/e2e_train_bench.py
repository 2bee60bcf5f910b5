"""ONE honest end-to-end number: host ingest + device step combined
(VERDICT r3 #6).

bench.py is device-resident (arrays pre-staged); ingest_bench.py measured
the host file pipeline alone (~520 clips/s/core python, native decoder
higher). Neither answers the production question the reference's own
dominant constraint poses (SURVEY §3.4): what does a training epoch
SUSTAIN when the chip is fed by the REAL file pipeline — per-video label
CSVs, JPEG frames, per-anchor WAVs — with PrefetchLoader overlap?

This drives Runner.train_epoch (the production code path: per-epoch
reseed, device preprocessing, jitted train step, metric gathers) on the
flagship-frozen config over a synthetic Affwild2-LAYOUT tree
(tools/ingest_bench.generate_tree — the exact file surface
dataset_new.py:71-99 trains from), on whatever backend is attached (the
real chip under axon; CPU otherwise), and prints:

  * sustained_clips_per_s  — wall-clock epoch rate, ingest + compute
  * device_only_clips_per_s — same step on pre-staged arrays (upper bound)
  * host_only_clips_per_s  — loader-only pass (no device work)
  * overlap_efficiency     — sustained / min(device, host): 1.0 means
    prefetch fully hides the slower side behind the bottleneck

Run:  PYTHONPATH=. python tools/e2e_train_bench.py [n_videos] [length]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ingest_bench import generate_tree  # noqa: E402  (same dir)


def main(n_videos=4, length=961, batch_size=8):
    from jmt_tpu.core.config import Config
    from jmt_tpu.core.compcache import enable_compilation_cache, ENV_VAR
    from jmt_tpu.data.datasets import load_video_records, WindowedDataset
    from jmt_tpu.data.loader import PrefetchLoader
    from jmt_tpu.data.synthetic import synthetic_wavlm_store
    from jmt_tpu.train.runner import Runner

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    enable_compilation_cache(os.environ.get(ENV_VAR)
                             or os.path.join(repo, ".xla_cache"))

    tree = generate_tree(n_videos, length)
    print(f"tree: {tree['n_jpeg']} jpegs + {tree['n_wav']} wavs "
          f"in {tree['gen_s']}s", file=sys.stderr, flush=True)

    records = load_video_records(tree["labels"], tree["wavs"], tree["ts"])
    ds = WindowedDataset(records, "train", use_native=True)

    cfg = Config.from_dict({
        "exp_id": "e2ebench", "outd": "/tmp/jmt_e2e_bench",
        "train_params": {"loader_params": {"batch_size": batch_size,
                                           "shuffle": True}},
        "val_params": {"loader_params": {"batch_size": batch_size}},
        "model_params": {
            # flagship-frozen: the production train mode bench.py's device
            # number (and BENCH_r03's 868 clips/s) corresponds to
            "l_vision_backbones": "R2D1,I3D",
            "l_audio_backbones": "ResNet18,wavLM",
            "intra_modal_fusion": "encoder_plus_self_attention",
            "joint_modalities": "TRANSFORMER",
            "output_format": "SELF_ATTEN",
            "num_heads": 1, "num_layers": 1,
            "max_epochs": 1, "compute_dtype": "bfloat16"},
        "SEED": 0, "mesh_data_parallel": 1, "log_every_steps": 0,
    })
    r = Runner(cfg, ds, None, wavlm_store=synthetic_wavlm_store())
    r.initialize()

    n_clips_epoch = len(ds) * 16

    # ---- warm the compile (first epoch compiles; measure the second)
    t0 = time.perf_counter()
    r.train_epoch(0)
    warm_s = time.perf_counter() - t0

    # ---- sustained: full epoch, real files -> PrefetchLoader -> chip
    t0 = time.perf_counter()
    r.train_epoch(1)
    dt_e2e = time.perf_counter() - t0
    sustained = n_clips_epoch / dt_e2e

    # ---- host-only: identical loader pass, no device work
    rng = np.random.default_rng(cfg.SEED + 1)
    loader = PrefetchLoader(ds, batch_size, shuffle=True, rng=rng,
                            wavlm_store=synthetic_wavlm_store())
    t0 = time.perf_counter()
    n_host = 0
    for batch in loader:
        n_host += batch.clips.shape[0] * batch.clips.shape[1]
    dt_host = time.perf_counter() - t0
    host_only = n_host / dt_host

    # ---- device-only: same jitted train step on pre-staged arrays
    import jax
    from jmt_tpu.train.loops import device_batch, batches_from_dataset
    batch = next(batches_from_dataset(ds, batch_size, shuffle=False))
    if r.wavlm_store is not None:
        batch.wavlm = r.wavlm_store.lookup_batch(batch.wav_paths)
    arrays = device_batch(batch)
    arrays = jax.device_put(arrays)
    key = jax.random.PRNGKey(0)
    state = r.state
    state, loss, _, _ = r.train_step(state, arrays, key)  # warm
    float(loss)
    iters = 12
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        key, sub = jax.random.split(key)
        state, acc, _, _ = r.train_step(state, arrays, sub)
    float(acc)
    dt_dev = (time.perf_counter() - t0) / iters
    device_only = batch_size * 16 / dt_dev

    bottleneck = min(device_only, host_only)
    out = {
        "backend": jax.default_backend(),
        "n_windows": len(ds), "clips_per_epoch": n_clips_epoch,
        "batch_size": batch_size,
        "sustained_clips_per_s": round(sustained, 1),
        "device_only_clips_per_s": round(device_only, 1),
        "host_only_clips_per_s": round(host_only, 1),
        "overlap_efficiency": round(sustained / bottleneck, 3),
        "epoch_s": round(dt_e2e, 1),
        "first_epoch_incl_compile_s": round(warm_s, 1),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4,
         int(sys.argv[2]) if len(sys.argv) > 2 else 961)
