"""Mutual-information estimator re-export (kept in scrubbers for state
locality; this module preserves the reference's module layout where the MI
estimator sits beside the scrubbers, disentangle.py:234-317)."""

from scrubvae_tpu.models.scrubbers import MIState, mi_init, mi_score  # noqa: F401

__all__ = ["MIState", "mi_init", "mi_score"]
