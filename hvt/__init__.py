"""hvt — hierarchical-vision-tpu.

A TPU-native (JAX / XLA / Pallas / pjit) framework for hierarchical vision:
pretraining image classifiers (ResNet-50, SwinV2) on taxonomy-labelled image
folders (iNat21 splits) with flat / multitask / hierarchical cross-entropy
objectives, and evaluating transfer via fine-tuning, linear probing, and
SimpleShot nearest-centroid few-shot classification.

Capability parity target: samuelstevens/hierarchical-vision (see SURVEY.md).
The PyTorch/Composer reference assembles dataloaders + a ComposerModel and
hands off to Composer's Trainer (reference main.py:104-131); here the
training loop is a first-class, jit-compiled train step with GSPMD data
parallelism over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level conveniences (keep `import hvt` light — no jax import).
    if name == "Trainer":
        from hvt.train.loop import Trainer

        return Trainer
    if name == "load_config":
        from hvt.config import load

        return load
    raise AttributeError(name)
