"""Training state: one explicit pytree carried through the jitted step.

The reference keeps equivalent state scattered across nn.Module buffers,
the optimizer object, and module attributes mutated mid-step
(SURVEY.md section 7 design stance); here it is a single flax.struct
dataclass - trivially checkpointable, donatable, and shardable.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
from jax import Array

from scrubvae_tpu.models.scrubbers import AdvState, MIState

__all__ = ["TrainState"]


@flax.struct.dataclass
class TrainState:
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any
    scrub_state: Dict[str, Dict[str, Any]]
    adv_states: Dict[str, AdvState]
    mi_state: Optional[MIState]
    rng: Array

    @classmethod
    def create(
        cls,
        params,
        batch_stats,
        opt_state,
        scrub_state=None,
        adv_states=None,
        mi_state=None,
        rng=None,
    ):
        import jax.numpy as jnp

        return cls(
            step=jnp.asarray(0, dtype=jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            scrub_state=scrub_state or {},
            adv_states=adv_states or {},
            mi_state=mi_state,
            rng=rng if rng is not None else jax.random.PRNGKey(0),
        )
