"""Pretrain / fine-tune entry point (reference main.py:36-148).

Usage (same CLI as the reference, README.md:25-34):

    python main.py --machine configs/machines/local.yaml \
        --exp configs/pretrain/inat21.yaml configs/pretrain/r50_multitask_base.yaml
"""

import argparse
import os

from hvt import config as config_lib
from hvt.train.loop import Trainer


def maybe_init_distributed() -> None:
    """Multi-host DCN init (SURVEY.md §5: jax.distributed.initialize for
    multi-host). Opt-in via HVT_MULTIHOST=1 so single-host setups (including
    tunneled single-chip dev machines) skip coordinator discovery."""
    if os.environ.get("HVT_MULTIHOST") == "1":
        import jax

        jax.distributed.initialize()


def main(config: config_lib.Config) -> dict:
    maybe_init_distributed()
    from hvt.utils import compile_cache

    compile_cache.enable()
    trainer = Trainer(config)
    try:
        return trainer.fit()
    finally:
        trainer.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    config_lib.add_exp_args(parser)
    args = parser.parse_args()
    main(config_lib.load(machine=args.machine, exps=args.exp))
