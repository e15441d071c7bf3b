"""Learning-rate schedules.

The reference decays the LR once per *epoch* with a polynomial schedule
(reference utils.py:11-26): ``lr = init_lr * (1 - iter/max_iter) ** power``.

Two distinct usages exist and both are capabilities here:

* Supervised ``train``: the base LR is always ``args.learning_rate``
  (reference train.py:71) -- the standard, non-compounding poly schedule.
* Adversarial ``train_DA``: the *current* LR is fed back as ``init_lr`` each
  epoch (reference train.py:185-186: ``lr = poly_lr_scheduler(optimizer, lr,
  epoch, ...)``), so the decay compounds:
  ``lr_{e+1} = lr_e * (1 - e/E) ** power``.

``PolyLR`` models both; the scalar LR is passed into the jitted train step
each epoch (host-side schedule, device-side use), which keeps the step
function cacheable across the whole run.
"""

from __future__ import annotations

from dataclasses import dataclass


def poly_lr(
    init_lr: float, iteration: int, max_iter: int = 300, power: float = 0.9
) -> float:
    """Reference utils.py:24 formula."""
    return init_lr * (1.0 - iteration / max_iter) ** power


def adjust_learning_rate(args, iteration: int,
                         max_iter: int = 300, power: float = 0.9):
    """Reference train.py:122-126 (defined there, never called): poly-decay
    ``args.learning_rate`` and return (base_lr, 10x_lr) -- the second group
    is the reference's 10x head-LR convention for ``optimizer.param_groups
    [1]``. Returned rather than mutated: our optimizers take the LR as a
    step input (train.optim.set_learning_rate)."""
    lr = poly_lr(args.learning_rate, iteration, max_iter, power)
    return lr, lr * 10


def adjust_learning_rate_D(args, iteration: int,
                           max_iter: int = 300, power: float = 0.9):
    """Reference train.py:128-132 twin for ``args.learning_rate_D``."""
    lr = poly_lr(args.learning_rate_D, iteration, max_iter, power)
    return lr, lr * 10


@dataclass
class PolyLR:
    """Stateful per-epoch poly LR.

    mode='standard'    lr(e) = base * (1 - e/E)^p          (reference train.py:71)
    mode='compounding' lr(e) = lr(e-1) * (1 - e/E)^p       (reference train.py:185)
    """

    base_lr: float
    max_iter: int
    power: float = 0.9
    mode: str = "standard"

    def __post_init__(self):
        if self.mode not in ("standard", "compounding"):
            raise ValueError(f"unknown PolyLR mode: {self.mode}")
        self._current = self.base_lr

    def __call__(self, epoch: int) -> float:
        if self.mode == "standard":
            self._current = poly_lr(self.base_lr, epoch, self.max_iter, self.power)
        else:
            self._current = poly_lr(
                self._current, epoch, self.max_iter, self.power
            )
        return self._current

    def fast_forward(self, start_epoch: int) -> None:
        """Replay epochs [0, start_epoch) so a resumed run continues the
        schedule an uninterrupted run would be on.

        Matters only for mode='compounding', whose state is the product
        of every previous epoch's decay factor: without the replay a
        --resume at epoch k would restart from base_lr and train with an
        LR orders of magnitude above the run it claims to continue
        (standard mode is stateless in the epoch, so this is a no-op
        beyond setting _current)."""
        for epoch in range(start_epoch):
            self(epoch)


@dataclass
class ConstantLR:
    """A never-decayed LR with the PolyLR call surface.

    Exists for the reference NNI trial's *faithful* LR semantics
    (train_nni.py:97-98): both ``poly_lr_scheduler`` calls there mutate
    ``optimizer`` (the generator's), so ``optimizer_D1``'s param-group LR
    is never touched and the discriminator trains at a constant
    ``learning_rate_D`` for the whole run, while the generator follows
    the compounded poly schedule of ``learning_rate_D`` (the second call
    overwrites the first). See train.adversarial.train_da(lr_mode=
    'nni_faithful')."""

    base_lr: float

    def __call__(self, epoch: int) -> float:
        return self.base_lr

    def fast_forward(self, start_epoch: int) -> None:
        pass
