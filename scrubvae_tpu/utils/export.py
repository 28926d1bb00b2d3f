"""Serving export: serialize the trained encoder/decoder as StableHLO.

The reference has no deployment story beyond pickled torch modules; for a
TPU-native serving path the jitted apply functions are exported with
`jax.export` (StableHLO + embedded weights), batch-polymorphic and lowered
for BOTH cpu and tpu by default, so a serving host can deserialize and call
them on either backend (or compile the StableHLO elsewhere) without this
package's Python model code.

Artifacts:
  encoder: batch of windows -> {"mu": (B, z), "L": (B, z, z)}
  decoder: (z, conditionals) -> {"x6d": ..., "root": ...}
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

__all__ = ["export_encoder", "export_decoder", "load_exported"]


def _sym_batch(shape, B):
    return jax.ShapeDtypeStruct((B,) + tuple(shape[1:]), jnp.float32)


def export_encoder(
    model,
    variables: Dict,
    example_batch: Dict[str, jnp.ndarray],
    path: Optional[str | Path] = None,
    platforms=("cpu", "tpu"),
    mu_only: bool = False,
) -> bytes:
    """Serialize ``model.encode`` with a symbolic (polymorphic) batch dim.

    ``example_batch`` needs the encoder inputs only (x6d/root, or the
    x6d_enc/root_enc view when the model was trained with one).

    ``mu_only=True`` exports a latent-extraction variant returning only
    ``{"mu"}`` via the encoders' native ``mu_only`` flag: the Cholesky head
    (fc_sigma, ~75% of flagship parameters) is never applied, so its weights
    are not embedded in the artifact (~4x smaller) and its matmul drops from
    the program. The mu it returns is the full encoder's mu (eval-mode
    encode already uses z = mu; reference analog: latent extraction reads
    only mu, /root/reference/src/scrubvae/get/eval.py:8-70). Beta-prior
    models compute mu FROM the alpha/beta heads, so for them ``mu_only``
    only restricts the artifact's outputs to ``{"mu"}`` — both heads stay
    embedded and there is no size win (ADVICE r3).
    """
    keys = [
        k for k in ("x6d", "root", "x6d_enc", "root_enc") if k in example_batch
    ]

    def encode(data):
        out = model.apply(
            variables, data, train=False, method=model.encode, mu_only=mu_only
        )
        return {"mu": out["mu"]} if mu_only else out

    (B,) = jexport.symbolic_shape("B")
    args = {k: _sym_batch(example_batch[k].shape, B) for k in keys}
    exp = jexport.export(jax.jit(encode), platforms=platforms)(args)
    blob = exp.serialize()
    if path is not None:
        Path(path).write_bytes(blob)
    return blob


def export_decoder(
    model,
    variables: Dict,
    example_batch: Dict[str, jnp.ndarray],
    z_dim: int,
    conditional_keys=(),
    path: Optional[str | Path] = None,
    platforms=("cpu", "tpu"),
) -> bytes:
    """Serialize ``model.decode`` (z + conditionals -> pose representation)."""

    def decode(z, cond):
        data = dict(cond)
        return model.apply(variables, z, data, train=False, method=model.decode)

    (B,) = jexport.symbolic_shape("B")
    z_arg = jax.ShapeDtypeStruct((B, z_dim), jnp.float32)
    cond_args = {
        k: _sym_batch(example_batch[k].shape, B) for k in conditional_keys
    }
    exp = jexport.export(jax.jit(decode), platforms=platforms)(z_arg, cond_args)
    blob = exp.serialize()
    if path is not None:
        Path(path).write_bytes(blob)
    return blob


def load_exported(blob_or_path) -> "jexport.Exported":
    """Deserialize an exported artifact; call via ``.call(*args)``."""
    if isinstance(blob_or_path, (str, Path)):
        blob = Path(blob_or_path).read_bytes()
    else:
        blob = bytes(blob_or_path)
    return jexport.deserialize(blob)
