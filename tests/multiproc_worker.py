"""Worker for the REAL multi-process `jax.distributed` drive.

Launched by tests/test_multiproc_real.py as N separate OS processes, each
with its own JAX runtime (CPU platform, gloo cross-process collectives),
exactly like one host of a TPU pod runs the CLI under
``jax.distributed.initialize()`` (docs/OPERATIONS.md). This converts the
round-3 "contract-pinned, not demonstrated" pod story into an executed one:
``jax.process_count() > 1`` is REALLY true here, so the host-sharded
loaders, `jax.make_array_from_process_local_data` batch assembly
(parallel/mesh.py), `process_allgather` metric gathers, and proc-0 write
gating all run their multi-process branches for real.

Must be started with JAX_PLATFORMS=cpu and WITHOUT the axon sitecustomize
on PYTHONPATH (the test harness env pins a TPU-tunnel platform plugin that
hijacks platform selection before main() runs).
"""
import argparse
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coord", required=True,
                    help="coordinator address host:port")
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--outd", required=True,
                    help="this process's experiment output root")
    ap.add_argument("--metrics", required=True,
                    help="file to write this process's metrics json to")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    if args.nprocs > 1:
        jax.distributed.initialize(coordinator_address=args.coord,
                                   num_processes=args.nprocs,
                                   process_id=args.pid)
    assert jax.process_count() == args.nprocs, (
        jax.process_count(), args.nprocs)

    from jmt_tpu.core.config import Config
    from jmt_tpu.data.synthetic import synthetic_dataset
    from jmt_tpu.train.runner import Runner
    from jmt_tpu.parallel import mesh as M

    n_global = jax.device_count()
    cfg = Config.from_dict({
        "exp_id": "podreal", "outd": args.outd,
        "goal": "PRETRAINING",  # single backbone keeps the epochs cheap
        "train_params": {"loader_params": {"batch_size": n_global,
                                           "shuffle": True}},
        "val_params": {"loader_params": {"batch_size": n_global}},
        "model_params": {"l_vision_backbones": "R2D1",
                         "l_audio_backbones": "",
                         "freeze_vision_R2D1": False,
                         "R2D1_ft_dim_reduce": "MAX",
                         "max_epochs": 2, "compute_dtype": "float32"},
        "SEED": args.seed, "mesh_data_parallel": n_global,
        "log_every_steps": 0,
    })
    train = synthetic_dataset("train", n_videos=3, length=481, stride=120,
                              img_size=16, check_coverage=False)
    val = synthetic_dataset("val", n_videos=1, length=481, stride=481,
                            img_size=16, check_coverage=False)
    r = Runner(cfg, train, val)
    assert r.procs == (args.pid, args.nprocs), r.procs
    perfs = r.fit()
    out = {
        "pid": args.pid,
        "process_count": jax.process_count(),
        "device_count": n_global,
        "is_main": M.is_main_process(),
        "best": {k: float(v) for k, v in perfs["best"].items()},
        "tracker": {k: [float(x) for x in v]
                    for k, v in perfs["tracker"].items()},
    }
    with open(args.metrics, "w") as f:
        json.dump(out, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
