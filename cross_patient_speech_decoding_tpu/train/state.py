"""Train state: params + optimizer + batch stats as one pytree."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import optax


class TrainState(NamedTuple):
    """Pytree carrying everything a jitted train step mutates.

    The reference relies on Lightning to hold this implicitly; here it is an
    explicit value so steps are pure and the whole (state, batch) -> state
    transition jits/shards as one XLA program.
    """

    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any  # {} for models without BatchNorm


def create_train_state(model, variables, tx: optax.GradientTransformation):
    params = variables["params"]
    return TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=variables.get("batch_stats", {}),
    )
