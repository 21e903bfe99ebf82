"""Sweep trial generation: flatten a sweep YAML into a dotted search space,
pick grid vs quasi-random, and emit one experiment YAML per trial
(reference sweep.py:26-109)."""

from __future__ import annotations

import itertools
import pathlib
from typing import Any, Iterator

import yaml

from hvt.sweep import halton

_LEAF_KEYSETS = ({"min", "max", "scaling"}, {"choices"})


def to_search_space(tree: dict, sep: str = ".") -> dict[str, dict]:
    """Nested sweep config → flat {dotted.key: leaf-spec}
    (reference sweep.py:26-41)."""
    flat: dict[str, dict] = {}
    for key, value in tree.items():
        if isinstance(value, dict) and set(value.keys()) not in _LEAF_KEYSETS:
            for sub, leaf in to_search_space(value, sep).items():
                flat[f"{key}{sep}{sub}"] = leaf
        else:
            flat[key] = value
    return flat


def grid_size(search_space: dict[str, dict]) -> int | None:
    """Product of choice counts, or None if any dimension is continuous."""
    total = 1
    for spec in search_space.values():
        if "choices" not in spec:
            return None
        total *= len(spec["choices"])
    return total


def generate_grid(search_space: dict[str, dict]) -> Iterator[dict[str, Any]]:
    keys = list(search_space)
    for combo in itertools.product(*(search_space[k]["choices"] for k in keys)):
        yield dict(zip(keys, combo))


def _set_dotted(tree: dict, dotted: str, value: Any) -> None:
    parts = dotted.split(".")
    node = tree
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    node[parts[-1]] = value


def generate_trials(
    sweep_config: dict, count: int, *, seed: int = 0
) -> tuple[str, list[dict]]:
    """→ (base run_name, trial config dicts). Grid when the space is fully
    discrete and smaller than `count`, else Halton (reference sweep.py:71-87).

    Each trial config sets seed=i, disables checkpointing, and names itself
    `{run_name}-{i}` (reference sweep.py:93-104).
    """
    sweep_config = dict(sweep_config)
    run_name = sweep_config.pop("run_name")
    space = to_search_space(sweep_config)

    size = grid_size(space)
    if size is not None and size < count:
        trials = list(generate_grid(space))
    else:
        trials = halton.generate_search(space, count, seed=seed)

    configs = []
    for i, trial in enumerate(trials):
        cfg: dict = {
            "seed": i,
            "save": {"interval": None, "wandb": False},
            "run_name": f"{run_name}-{i}",
        }
        for dotted, value in trial.items():
            _set_dotted(cfg, dotted, value)
        configs.append(cfg)
    return run_name, configs


def write_trials(
    sweep_file: str, count: int, output: str, *, seed: int = 0
) -> pathlib.Path:
    """CLI core: read sweep YAML, write configs/<output>/sweep-<name>/*.yaml."""
    with open(sweep_file) as fd:
        sweep_config = yaml.safe_load(fd)
    run_name, configs = generate_trials(sweep_config, count, seed=seed)

    out_dir = pathlib.Path(output) / f"sweep-{run_name}"
    out_dir.mkdir(parents=True, exist_ok=True)
    for cfg in configs:
        with open(out_dir / f"{cfg['run_name']}.yaml", "w") as fd:
            yaml.safe_dump(cfg, fd, sort_keys=False)
    return out_dir
