"""AbstractGAN interface (rebuild of compare_gan/gans/abstract_gan.py:29-92).

The reference's estimator surface (`as_estimator`, `model_fn`, `input_fn`,
`as_module_spec`) maps onto a functional JAX trainer:

  as_estimator()    → make_train_step() / make_train_loop(): pure jitted fns
  model_fn()        → the body of make_train_step()
  input_fn()        → input_batches(): host iterator of numpy batches
  as_module_spec()  → sample() / discriminate(): jittable inference fns,
                      exported per checkpoint by the runner (export.py)
"""

from __future__ import annotations

import abc


class AbstractGAN(abc.ABC):
    """Interface for GAN models that can be trained with the runner."""

    def __init__(self, dataset, parameters, model_dir):
        self._dataset = dataset
        self._parameters = dict(parameters or {})
        self._model_dir = model_dir

    @property
    def dataset(self):
        return self._dataset

    @property
    def model_dir(self):
        return self._model_dir

    @property
    @abc.abstractmethod
    def num_sub_steps(self) -> int:
        """Input batches per train step (disc_iters + 1 when unrolled)."""

    @abc.abstractmethod
    def init_state(self, rng, batch_size):
        """Create the initial TrainState (params, state, optimizers, ...)."""

    @abc.abstractmethod
    def make_train_step(self, batch_size):
        """Return a pure `(train_state, batch) -> (train_state, metrics)`."""

    @abc.abstractmethod
    def input_batches(self, batch_size, host_id=None):
        """Host iterator of batches sized batch_size * num_sub_steps."""
