"""Subprocess body for the multi-host simulation test (test_multihost.py).

Runs one rank of a 2-process CPU "cluster": jax.distributed over a local
gloo coordinator, the full Trainer on synthetic data with the global batch
assembled from per-process loader shards. Invoked as:

    python tests/multihost_worker.py <process_id> <num_processes> <port> <outdir>
"""

import json
import pathlib
import sys


def main() -> None:
    pid, nprocs, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    zero = len(sys.argv) > 5 and sys.argv[5] == "zero"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
        initialization_timeout=120,
    )

    from hvt import config as config_lib
    from hvt.train.loop import Trainer

    cfg = config_lib.loads(
        {
            "run_name": "mh-sim",
            "max_duration": "2ba",
            "grad_accum": 1,
            "seed": 0,
            "model": {"name": "resnet_micro"},
            "machine": {"save_root": f"{outdir}/runs"},
            "train_dataset": {
                "source": "synthetic", "synthetic_num_classes": 4,
                "synthetic_num_samples": 16, "crop_size": 24,
                "global_batch_size": 8, "drop_last": True, "shuffle": True,
            },
            "eval_dataset": {
                "source": "synthetic", "synthetic_num_classes": 4,
                "synthetic_num_samples": 8, "crop_size": 24,
                "global_batch_size": 8,
            },
            "optim": {"name": "sgd", "lr": 0.01, "momentum": 0.9,
                      "weight_decay": 0.0},
            "scheduler": {"args": {"t_warmup": "1ba", "alpha_f": 0.0}},
            # save.wandb exercises the rank-consistent run-info broadcast
            # (wandb is not installed: rank 0 warns, every rank still enters
            # the collective — the heterogeneous-hosts hang fix).
            "save": {"interval": None, "num_checkpoints_to_keep": 1,
                     "wandb": True},
            "loader": {"num_workers": 1, "prefetch_batches": 1},
            # ZeRO-1 variant: optimizer state sharded over a data axis that
            # SPANS both processes — exercises cross-process sharded
            # arrays through the step AND the multiprocess Orbax save.
            "mesh": {"zero": zero},
        }
    )
    if pid == 0:
        pathlib.Path(outdir, "config.json").write_text(
            json.dumps(config_lib.to_dict(cfg))
        )
    trainer = Trainer(cfg, log_interval=10)
    try:
        metrics = trainer.fit()
    finally:
        trainer.close()

    out = {
        "rank": pid,
        "world": jax.process_count(),
        "devices": len(jax.devices()),
        "cross-entropy": float(metrics["cross-entropy"]),
        "step": int(trainer.state.step),
        "opt_data_sharded": any(
            "data" in str(leaf.sharding.spec)
            for leaf in jax.tree.leaves(trainer.state.opt_state)
            if hasattr(leaf, "sharding")
        ),
    }
    pathlib.Path(outdir, f"rank{pid}.json").write_text(json.dumps(out))


if __name__ == "__main__":
    main()
