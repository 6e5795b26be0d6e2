"""ReduceLROnPlateau, matching torch.optim.lr_scheduler semantics.

The reference drives every trainer with this scheduler
(reference: audio/train.py:156 mode='min' factor=0.5 patience=5;
video/train.py:213-215 mode='max'). It runs on the host between epochs and
feeds the learning rate into the jitted train step as a traced scalar (via
``optax.inject_hyperparams``), so changing it never triggers recompilation.

Semantics matched to torch: threshold_mode='rel' with threshold=1e-4,
``num_bad_epochs`` reset on improvement, cooldown=0, optional min_lr.
"""

from __future__ import annotations


class ReduceLROnPlateau:
    def __init__(
        self,
        initial_lr: float,
        mode: str = "min",
        factor: float = 0.5,
        patience: int = 5,
        threshold: float = 1e-4,
        min_lr: float = 0.0,
    ):
        assert mode in ("min", "max")
        self.lr = float(initial_lr)
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best: float | None = None
        self.num_bad_epochs = 0

    def _is_better(self, metric: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return metric < self.best * (1.0 - self.threshold)
        return metric > self.best * (1.0 + self.threshold)

    def step(self, metric: float) -> float:
        """Record one epoch's metric; returns the (possibly reduced) LR."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
            if self.num_bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad_epochs = 0
        return self.lr
