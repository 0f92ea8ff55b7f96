"""Majority-vote baseline model (no learned parameters).

Parity target: ``medaka/architectures/majority_vote_model.py``.
"""
from __future__ import annotations

import jax.numpy as jnp

from medaka_tpu.common import base2index
from medaka_tpu.models import register_model


@register_model
class MajorityVoteModel:
    """Argmax over strand-summed normalised base counts."""

    input_kind = "counts"

    def __init__(self, time_steps=None, **kwargs):
        """No parameters; kwargs accepted for config compatibility."""
        self.num_classes = 5

    def to_dict(self):
        """Architecture config."""
        return {"type": "MajorityVoteModel", "kwargs": {}}

    def init_params(self, rng):
        """No parameters."""
        return {}

    def params_from_torch_state(self, state):
        """No parameters to import."""
        return {}

    def apply(self, params, x, normalise=True, compute_dtype=None,
              lengths=None, training=False):
        """Class probabilities (del, A, C, G, T) by direct vote counting."""
        b2i = base2index
        bases = (x[..., b2i["a"]:b2i["t"] + 1] +
                 x[..., b2i["A"]:b2i["T"] + 1])
        dels = (x[..., b2i["d"]:b2i["d"] + 1] +
                x[..., b2i["D"]:b2i["D"] + 1])
        out = jnp.concatenate([dels, bases], axis=-1)
        pad = 1.0 - jnp.sum(out, axis=-1, keepdims=True)
        return out.at[..., 0:1].add(pad) if hasattr(out, "at") else out

    def check_feature_encoder_compatibility(self, fenc):
        """Counts-style encoders only."""
        from medaka_tpu.features import CountsFeatureEncoder
        if not isinstance(fenc, CountsFeatureEncoder):
            raise ValueError(
                "{} is not a valid feature encoder for "
                "MajorityVoteModel.".format(type(fenc)))
