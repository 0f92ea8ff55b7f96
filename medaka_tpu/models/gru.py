"""Bidirectional GRU consensus model (counts-matrix input).

Parity target: ``medaka/architectures/gru.py:10-72`` — a 2-layer biGRU over
(batch, positions, 10) pileup features with a linear 5-class head and
softmax at inference. Weight import from torch checkpoints maps 1:1.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from medaka_tpu.models import register_model
from medaka_tpu.ops.rnn import bigru_stack, gru_layer_params


@register_model
class GRUModel:
    """Functional biGRU model: params pytree + pure ``apply``."""

    input_kind = "counts"

    def __init__(self, num_features=10, num_classes=5, gru_size=128,
                 n_layers=2, bidirectional=True, time_steps=None,
                 classify_activation=None):
        """Mirror the reference constructor signature.

        ``time_steps``/``classify_activation`` are accepted for checkpoint
        compatibility and ignored.
        """
        self.num_features = num_features
        self.num_classes = num_classes
        self.gru_size = gru_size
        self.n_layers = n_layers
        self.bidirectional = bidirectional
        self.normalise = True

    def to_dict(self):
        """Architecture config."""
        return {
            "type": "GRUModel",
            "kwargs": {
                "num_features": self.num_features,
                "num_classes": self.num_classes,
                "gru_size": self.gru_size,
                "n_layers": self.n_layers,
                "bidirectional": self.bidirectional,
            }}

    # --- params ---

    def init_params(self, rng) -> Dict:
        """Random initialisation (torch uniform ±1/sqrt(H))."""
        n_dirs = 2 if self.bidirectional else 1
        layers = []
        for layer_i in range(self.n_layers):
            in_size = self.num_features if layer_i == 0 \
                else self.gru_size * n_dirs
            rng, k_f, k_b = jax.random.split(rng, 3)
            layer = {"fwd": gru_layer_params(k_f, in_size, self.gru_size)}
            if self.bidirectional:
                layer["bwd"] = gru_layer_params(k_b, in_size, self.gru_size)
            layers.append(layer)
        rng, k_w, k_b = jax.random.split(rng, 3)
        head_in = self.gru_size * n_dirs
        k = 1.0 / np.sqrt(head_in)
        linear = {
            "w": jax.random.uniform(
                k_w, (self.num_classes, head_in), jnp.float32, -k, k),
            "b": jax.random.uniform(
                k_b, (self.num_classes,), jnp.float32, -k, k)}
        return {"gru": layers, "linear": linear}

    def params_from_torch_state(self, state: Dict) -> Dict:
        """Map a ``torch.nn.GRU`` + ``Linear`` state dict onto our pytree.

        Keys: ``gru.weight_ih_l{k}[_reverse]`` etc and ``linear.weight/bias``
        (reference checkpoint layout).
        """
        def arr(key):
            v = state[key]
            return np.asarray(
                v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                dtype=np.float32)

        layers = []
        for k in range(self.n_layers):
            layer = {"fwd": {
                "w_ih": arr("gru.weight_ih_l{}".format(k)),
                "w_hh": arr("gru.weight_hh_l{}".format(k)),
                "b_ih": arr("gru.bias_ih_l{}".format(k)),
                "b_hh": arr("gru.bias_hh_l{}".format(k))}}
            if self.bidirectional:
                layer["bwd"] = {
                    "w_ih": arr("gru.weight_ih_l{}_reverse".format(k)),
                    "w_hh": arr("gru.weight_hh_l{}_reverse".format(k)),
                    "b_ih": arr("gru.bias_ih_l{}_reverse".format(k)),
                    "b_hh": arr("gru.bias_hh_l{}_reverse".format(k))}
            layers.append(layer)
        linear = {"w": arr("linear.weight"), "b": arr("linear.bias")}
        return {"gru": layers, "linear": linear}

    def torch_state_from_params(self, params: Dict) -> Dict:
        """Inverse of :meth:`params_from_torch_state` (numpy arrays)."""
        state = {}
        for k, layer in enumerate(params["gru"]):
            for key, suffix in (("fwd", ""), ("bwd", "_reverse")):
                if key not in layer:
                    continue
                p = layer[key]
                state["gru.weight_ih_l{}{}".format(k, suffix)] = \
                    np.asarray(p["w_ih"])
                state["gru.weight_hh_l{}{}".format(k, suffix)] = \
                    np.asarray(p["w_hh"])
                state["gru.bias_ih_l{}{}".format(k, suffix)] = \
                    np.asarray(p["b_ih"])
                state["gru.bias_hh_l{}{}".format(k, suffix)] = \
                    np.asarray(p["b_hh"])
        state["linear.weight"] = np.asarray(params["linear"]["w"])
        state["linear.bias"] = np.asarray(params["linear"]["b"])
        return state

    # --- forward ---

    def apply(self, params: Dict, x: jnp.ndarray, normalise: bool = True,
              compute_dtype=None, lengths=None,
              fused: Optional[bool] = None,
              training: bool = False,
              recurrent_quant: Optional[str] = None,
              interpret: bool = False) -> jnp.ndarray:
        """Forward pass.

        :param x: (batch, positions, num_features) counts features.
        :param normalise: apply softmax (False for training logits).
        :param compute_dtype: optional lower precision (e.g. bfloat16) for
            the recurrent compute; the head always accumulates in float32.
        :param lengths: optional (batch,) valid lengths for ragged chunks
            padded to a static shape (see ``ops.rnn.gru_scan``).
        :param fused: use the fused Pallas recurrent kernel. Default
            (None): on for bf16 inference on TPU backends, off elsewhere
            (CPU tests, full-precision parity runs, autodiff).
        :param recurrent_quant: low-precision variants of the fused
            path. On the flagship 2-layer split path (auto-selected for
            fused bidirectional inference) the default (None) already
            runs the validated int8 quantisation (measured max
            probability error 5.3e-4 vs the f32 scan,
            tests/perf/kernel_lab.py); pass "none" for bf16-exact
            kernels. "bf16_gates"/"staggered" select legacy fullfused
            stack variants.
        :param interpret: run the fused Pallas kernels in interpreter
            mode (CPU validation of the production kernel path, e.g. the
            driver's multichip dryrun); bypasses the batch/width perf
            heuristics since interpret mode is never about speed.
        :returns: (batch, positions, num_classes).
        """
        if fused is None:
            fused = (
                compute_dtype == jnp.bfloat16
                and jax.default_backend() not in ("cpu",))
        if (fused and not training and self.bidirectional
                and compute_dtype == jnp.bfloat16
                and len(params["gru"]) == 2
                and (interpret or (
                    x.shape[0] >= 32
                    and params["gru"][0]["fwd"]["w_hh"].shape[-1] % 128
                    == 0))
                and recurrent_quant in (None, "int8", "none")):
            # flagship split path: layer-split kernels, fused head,
            # int8 inter-layer/projections/recurrence by default
            from medaka_tpu.ops.pallas_gru import bigru_head_fullfused
            logits = bigru_head_fullfused(
                params["gru"], params["linear"], x, lengths=lengths,
                quant=(recurrent_quant != "none"), interpret=interpret)
            if normalise:
                return jax.nn.softmax(logits, axis=-1)
            return logits
        if fused and training:
            # differentiable kernel pairs (custom VJP)
            from medaka_tpu.ops.pallas_gru import bigru_stack_trainable
            feats = bigru_stack_trainable(
                params["gru"], x, lengths=lengths,
                bidirectional=self.bidirectional,
                compute_dtype=compute_dtype)
        elif fused and self.bidirectional:
            from medaka_tpu.ops.pallas_gru import bigru_stack_fullfused
            feats = bigru_stack_fullfused(
                params["gru"], x, lengths=lengths,
                compute_dtype=compute_dtype,
                recurrent_quant=recurrent_quant)
        elif fused:
            from medaka_tpu.ops.pallas_gru import bigru_stack_fused
            feats = bigru_stack_fused(
                params["gru"], x, bidirectional=self.bidirectional,
                lengths=lengths, compute_dtype=compute_dtype)
        else:
            feats = bigru_stack(
                params["gru"], x, bidirectional=self.bidirectional,
                compute_dtype=compute_dtype, lengths=lengths)
        logits = (
            jnp.einsum(
                "bth,ch->btc", feats.astype(jnp.float32),
                params["linear"]["w"].astype(jnp.float32),
                preferred_element_type=jnp.float32)
            + params["linear"]["b"].astype(jnp.float32))
        if normalise:
            return jax.nn.softmax(logits, axis=-1)
        return logits

    def check_feature_encoder_compatibility(self, fenc):
        """Counts-style encoders only."""
        from medaka_tpu.features import CountsFeatureEncoder
        if not isinstance(fenc, CountsFeatureEncoder):
            raise ValueError(
                "{} is not a valid feature encoder for GRUModel.".format(
                    type(fenc)))
