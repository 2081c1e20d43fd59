"""Learning-rate schedules matching `get_scheduler`
(`/root/reference/pretraining/models/pretraining_networks.py:521-614`).

All policies are per-epoch multipliers turned into optax schedules via
`steps_per_epoch` (the reference steps its schedulers once per epoch).
'plateau' is inherently loss-driven; use `PlateauState` host-side.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


def make_schedule(
    lr: float,
    policy: str,
    *,
    n_epochs: int,
    n_epochs_decay: int,
    steps_per_epoch: int,
    step_decay_iters: int = 50,
    step_gamma: float = 0.1,
    exp_gamma: float = 0.95,
):
    spe = max(steps_per_epoch, 1)

    if policy == "const_linear":
        def schedule(step):
            epoch = step // spe
            factor = 1.0 - jnp.maximum(0, epoch - n_epochs) / float(
                n_epochs_decay + 1
            )
            return lr * factor
        return schedule

    if policy == "linear":
        total = n_epochs + n_epochs_decay
        def schedule(step):
            epoch = jnp.minimum(step // spe, total)
            frac = epoch / max(total, 1)
            return lr * (1.0 + (5e-2 - 1.0) * frac)
        return schedule

    if policy == "exponential":
        def schedule(step):
            epoch = step // spe
            return lr * exp_gamma ** epoch
        return schedule

    if policy == "step":
        def schedule(step):
            epoch = step // spe
            return lr * step_gamma ** (epoch // step_decay_iters)
        return schedule

    if policy == "cosine":
        total = max(n_epochs + n_epochs_decay, 1)
        def schedule(step):
            epoch = step // spe
            return lr * (1 + jnp.cos(jnp.pi * epoch / total)) / 2.0
        return schedule

    if policy == "plateau":
        raise ValueError(
            "plateau is loss-driven; drive PlateauState from the train loop"
        )
    raise NotImplementedError(f"lr policy {policy} not implemented")


@dataclasses.dataclass
class PlateauState:
    """ReduceLROnPlateau host-side state, matching the reference's settings
    (`pretraining_networks.py:583-590`: mode='min', factor=0.5,
    threshold=1e-4 rel, patience=5, min_lr=1e-7), stepped on the val loss
    at the evaluation cadence (`trainers/train.py:379-380`)."""

    lr: float
    factor: float = 0.5
    threshold: float = 1e-4
    patience: int = 5
    min_lr: float = 1e-7
    best: float = float("inf")
    num_bad: int = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr
