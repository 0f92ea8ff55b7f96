"""Read-level latent-space LSTM consensus model.

Parity target: ``medaka/architectures/latent_space_lstm.py`` (+
``read_level_modules.py``): base/strand embeddings summed, scaled qscores
(and optional dwells) appended, per-read 1-D convs along positions,
linear expansion, masked mean-pool over read rows, 2-layer bi-LSTM and a
linear head. Torch checkpoints (``rl_lstm384_*`` bundled models) import
1:1.

TPU notes: convolutions and the pooling are pure MXU/VPU work batched
over (batch x reads); the LSTM stack reuses :mod:`medaka_tpu.ops.rnn`.
Only the basecall, qual, strand (and dwell) channels are consumed,
mirroring the reference (mapq/haplotype/dtype channels ignored).
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from medaka_tpu.models import register_model
from medaka_tpu.ops.rnn import bilstm_stack, lstm_layer_params


def _conv1d_params(rng, in_ch, out_ch, kernel, dtype=jnp.float32):
    k = 1.0 / np.sqrt(in_ch * kernel)
    k1, k2 = jax.random.split(rng)
    return {
        "w": jax.random.uniform(
            k1, (out_ch, in_ch, kernel), dtype, -k, k),
        "b": jax.random.uniform(k2, (out_ch,), dtype, -k, k)}


def _linear_params(rng, in_f, out_f, dtype=jnp.float32):
    k = 1.0 / np.sqrt(in_f)
    k1, k2 = jax.random.split(rng)
    return {
        "w": jax.random.uniform(k1, (out_f, in_f), dtype, -k, k),
        "b": jax.random.uniform(k2, (out_f,), dtype, -k, k)}


def _bn_params(ch):
    return {
        "scale": jnp.ones((ch,), jnp.float32),
        "bias": jnp.zeros((ch,), jnp.float32),
        "mean": jnp.zeros((ch,), jnp.float32),
        "var": jnp.ones((ch,), jnp.float32)}


@jax.custom_vjp
def _conv1d_f32acc(x, w):
    """`SAME` NWC conv with f32 MXU accumulation and a working VJP.

    ``preferred_element_type=f32`` on bf16 operands is the fast forward
    (measured 69.2 vs 74.8 ms at the production geometry) but JAX's
    conv transpose rule rejects the resulting f32 cotangent against
    bf16 operands, so the backward convs run at the operands' dtype
    (the MXU still accumulates f32 internally either way).
    """
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "OIW", "NWC"),
        preferred_element_type=jnp.float32)


def _conv1d_f32acc_fwd(x, w):
    return _conv1d_f32acc(x, w), (x, w)


def _conv1d_f32acc_bwd(res, g):
    x, w = res
    _, vjp = jax.vjp(
        lambda x_, w_: jax.lax.conv_general_dilated(
            x_, w_, window_strides=(1,), padding="SAME",
            dimension_numbers=("NWC", "OIW", "NWC")), x, w)
    return vjp(g.astype(x.dtype))


_conv1d_f32acc.defvjp(_conv1d_f32acc_fwd, _conv1d_f32acc_bwd)


@register_model
class LatentSpaceLSTM:
    """Functional read-level model: params pytree + pure ``apply``."""

    input_kind = "reads"

    def __init__(self, num_classes=5, lstm_size=128, cnn_size=128,
                 kernel_sizes=(1, 17), pooler_type="mean", pooler_args=None,
                 use_dwells=False, bases_alphabet_size=6,
                 bases_embedding_size=6, bidirectional=True,
                 time_steps=None):
        """Mirror the reference constructor (checkpoint compatible)."""
        if pooler_type != "mean":
            raise NotImplementedError(
                "Only mean pooling is implemented (as in the reference).")
        self.num_classes = num_classes
        self.lstm_size = lstm_size
        self.cnn_size = cnn_size
        self.kernel_sizes = list(kernel_sizes)
        self.pooler_type = pooler_type
        self.pooler_args = dict(pooler_args or {})
        self.use_dwells = use_dwells
        self.bases_alphabet_size = bases_alphabet_size
        self.bases_embedding_size = bases_embedding_size
        self.bidirectional = bidirectional
        self.normalise = True

    def to_dict(self):
        """Architecture config."""
        return {
            "type": "LatentSpaceLSTM",
            "kwargs": {
                "num_classes": self.num_classes,
                "lstm_size": self.lstm_size,
                "cnn_size": self.cnn_size,
                "kernel_sizes": self.kernel_sizes,
                "pooler_type": self.pooler_type,
                "pooler_args": self.pooler_args,
                "use_dwells": self.use_dwells,
                "bases_alphabet_size": self.bases_alphabet_size,
                "bases_embedding_size": self.bases_embedding_size,
                "bidirectional": self.bidirectional,
            }}

    # --- params ---

    def init_params(self, rng) -> Dict:
        """Random initialisation following torch defaults."""
        n_extra = 1 + int(self.use_dwells)
        in_feat = self.bases_embedding_size + n_extra
        keys = jax.random.split(rng, 8 + 2 * len(self.kernel_sizes))
        ki = iter(keys)
        convs: List[Dict] = []
        ch_in = in_feat
        for ksize in self.kernel_sizes:
            convs.append({
                "conv": _conv1d_params(
                    next(ki), ch_in, self.cnn_size, ksize),
                "bn": _bn_params(self.cnn_size)})
            ch_in = self.cnn_size
        lstm_layers = []
        n_dirs = 2 if self.bidirectional else 1
        if self.bidirectional:
            for layer_i in range(2):
                in_size = self.lstm_size if layer_i == 0 \
                    else self.lstm_size * n_dirs
                layer = {
                    "fwd": lstm_layer_params(
                        next(ki), in_size, self.lstm_size),
                    "bwd": lstm_layer_params(
                        next(ki), in_size, self.lstm_size)}
                lstm_layers.append(layer)
        else:
            # 4 interleaved single-direction layers, alternately
            # reversed (reference ReversibleLSTM stack,
            # ``latent_space_lstm.py:139-147``)
            for layer_i in range(4):
                lstm_layers.append({
                    "fwd": lstm_layer_params(
                        next(ki), self.lstm_size, self.lstm_size)})
        return {
            "base_embed": jax.random.normal(
                next(ki),
                (self.bases_alphabet_size, self.bases_embedding_size)),
            "strand_embed": jax.random.normal(
                next(ki), (3, self.bases_embedding_size)),
            "convs": convs,
            "pre_pool": _linear_params(
                next(ki), self.cnn_size, self.lstm_size),
            "lstm": lstm_layers,
            "linear": _linear_params(
                next(ki), self.lstm_size * n_dirs, self.num_classes)}

    def params_from_torch_state(self, state: Dict) -> Dict:
        """Map a reference checkpoint state dict onto our pytree."""
        def arr(key):
            v = state[key]
            return np.asarray(
                v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                dtype=np.float32)

        convs = []
        # torch Sequential: Conv1d, ReLU, BatchNorm1d triples
        idx = 0
        for _ksize in self.kernel_sizes:
            conv_key = "read_level_conv.convs.{}".format(idx)
            bn_key = "read_level_conv.convs.{}".format(idx + 2)
            convs.append({
                "conv": {"w": arr(conv_key + ".weight"),
                         "b": arr(conv_key + ".bias")},
                "bn": {"scale": arr(bn_key + ".weight"),
                       "bias": arr(bn_key + ".bias"),
                       "mean": arr(bn_key + ".running_mean"),
                       "var": arr(bn_key + ".running_var")}})
            idx += 3
        lstm_layers = []
        if self.bidirectional:
            for k in range(2):
                lstm_layers.append({
                    "fwd": {
                        "w_ih": arr("lstm.weight_ih_l{}".format(k)),
                        "w_hh": arr("lstm.weight_hh_l{}".format(k)),
                        "b_ih": arr("lstm.bias_ih_l{}".format(k)),
                        "b_hh": arr("lstm.bias_hh_l{}".format(k))},
                    "bwd": {
                        "w_ih": arr(
                            "lstm.weight_ih_l{}_reverse".format(k)),
                        "w_hh": arr(
                            "lstm.weight_hh_l{}_reverse".format(k)),
                        "b_ih": arr(
                            "lstm.bias_ih_l{}_reverse".format(k)),
                        "b_hh": arr(
                            "lstm.bias_hh_l{}_reverse".format(k))}})
        else:
            # torch Sequential of ReversibleLSTM wrappers
            for k in range(4):
                pre = "lstm.{}.lstm.".format(k)
                lstm_layers.append({
                    "fwd": {
                        "w_ih": arr(pre + "weight_ih_l0"),
                        "w_hh": arr(pre + "weight_hh_l0"),
                        "b_ih": arr(pre + "bias_ih_l0"),
                        "b_hh": arr(pre + "bias_hh_l0")}})
        return {
            "base_embed": arr("base_embedder.weight"),
            "strand_embed": arr("strand_embedder.weight"),
            "convs": convs,
            "pre_pool": {
                "w": arr("pre_pool_expansion_layer.weight"),
                "b": arr("pre_pool_expansion_layer.bias")},
            "lstm": lstm_layers,
            "linear": {
                "w": arr("linear.weight"), "b": arr("linear.bias")}}

    def torch_state_from_params(self, params: Dict) -> Dict:
        """Inverse of :meth:`params_from_torch_state` (numpy arrays)."""
        state = {
            "base_embedder.weight": np.asarray(params["base_embed"]),
            "strand_embedder.weight": np.asarray(params["strand_embed"]),
            "pre_pool_expansion_layer.weight":
                np.asarray(params["pre_pool"]["w"]),
            "pre_pool_expansion_layer.bias":
                np.asarray(params["pre_pool"]["b"]),
            "linear.weight": np.asarray(params["linear"]["w"]),
            "linear.bias": np.asarray(params["linear"]["b"])}
        idx = 0
        for layer in params["convs"]:
            conv_key = "read_level_conv.convs.{}".format(idx)
            bn_key = "read_level_conv.convs.{}".format(idx + 2)
            state[conv_key + ".weight"] = np.asarray(layer["conv"]["w"])
            state[conv_key + ".bias"] = np.asarray(layer["conv"]["b"])
            state[bn_key + ".weight"] = np.asarray(layer["bn"]["scale"])
            state[bn_key + ".bias"] = np.asarray(layer["bn"]["bias"])
            state[bn_key + ".running_mean"] = np.asarray(
                layer["bn"]["mean"])
            state[bn_key + ".running_var"] = np.asarray(layer["bn"]["var"])
            idx += 3
        for k, layer in enumerate(params["lstm"]):
            if self.bidirectional:
                for key, suffix in (("fwd", ""), ("bwd", "_reverse")):
                    p = layer[key]
                    state["lstm.weight_ih_l{}{}".format(k, suffix)] = \
                        np.asarray(p["w_ih"])
                    state["lstm.weight_hh_l{}{}".format(k, suffix)] = \
                        np.asarray(p["w_hh"])
                    state["lstm.bias_ih_l{}{}".format(k, suffix)] = \
                        np.asarray(p["b_ih"])
                    state["lstm.bias_hh_l{}{}".format(k, suffix)] = \
                        np.asarray(p["b_hh"])
            else:
                p = layer["fwd"]
                pre = "lstm.{}.lstm.".format(k)
                state[pre + "weight_ih_l0"] = np.asarray(p["w_ih"])
                state[pre + "weight_hh_l0"] = np.asarray(p["w_hh"])
                state[pre + "bias_ih_l0"] = np.asarray(p["b_ih"])
                state[pre + "bias_hh_l0"] = np.asarray(p["b_hh"])
        return state

    # --- forward ---

    has_batch_stats = True

    def apply(self, params: Dict, x: jnp.ndarray, normalise: bool = True,
              compute_dtype=None, lengths=None,
              training: bool = False,
              fused: Optional[bool] = None,
              bn_stats: Optional[list] = None) -> jnp.ndarray:
        """Forward pass.

        :param x: (batch, positions, reads, channels) int8 read-level
            features; channels [base, qual, strand, mapq(, dwell)].
        :param training: batch-norm uses batch statistics when True
            (running statistics otherwise). Unlike torch BatchNorm1d,
            training-mode statistics are masked to non-empty read rows,
            so they do not depend on how far the static ``max_reads``
            padding exceeds the true depth.
        :param fused: use the fused Pallas recurrent kernels. Default
            (None): on for bf16 on TPU backends, off elsewhere. Callers
            running under a tensor-parallel mesh must pass False — the
            Pallas kernels are validated unsharded only.
        :param bn_stats: mutable list; when given (with
            ``training=True``) the per-conv-layer batch ``(mean, var)``
            is appended so the train step can maintain running
            statistics (see ``parallel.make_train_step``).
        :returns: (batch, positions, num_classes).
        """
        cd = compute_dtype or jnp.float32
        xf = x.astype(jnp.float32)
        B, P, R, _C = x.shape
        needed = 5 if self.use_dwells else 4
        if _C < needed:
            raise ValueError(
                "Read-level features need {} channels "
                "[base, qual, strand, mapq{}]; got {}.".format(
                    needed, ", dwell" if self.use_dwells else "", _C))

        # read rows that contain any data (reference
        # ``latent_space_lstm.py:164-166``)
        non_empty = jnp.sum(jnp.abs(xf), axis=(1, 3)) != 0  # (B, R)

        base_emb = jnp.take(
            params["base_embed"], x[..., 0].astype(jnp.int32), axis=0)
        strand_emb = jnp.take(
            params["strand_embed"],
            x[..., 2].astype(jnp.int32) + 1, axis=0)
        scaled_q = (xf[..., 1] / 25.0 - 1.0)[..., None]
        parts = [base_emb + strand_emb, scaled_q]
        if self.use_dwells:
            parts.append(xf[..., 4][..., None])
        feats = jnp.concatenate(parts, axis=-1)  # (B, P, R, F)

        # per-read convs along positions: to (B*R, P, F)
        feats = jnp.transpose(feats, (0, 2, 1, 3)).reshape(
            B * R, P, -1).astype(cd)
        # NOTE: a fused Pallas conv (K shifted matmuls + folded bn/relu
        # epilogue) measured *slower* than XLA's conv here (188 ms vs
        # 172 ms at B=128): the 17 non-8-aligned tap slices cost more
        # in sublane rotations than the epilogue fusion saves. XLA's
        # conv is the right tool for this geometry. Further measured
        # dead ends at the same geometry (B=128, P=1000, R=100): bf16
        # accumulation (preferred_element_type=bf16) is *slower* than
        # f32 (74.8 vs 69.2 ms — the MXU accumulates f32 either way,
        # the cast just adds work); the k=17 conv at f32 accumulation
        # is already at the MXU speed of light (~72 ms of FLOPs);
        # replacing the k=1 conv with an 18-entry (base,strand)-LUT
        # gather + qual outer product (66.7 ms) or a one-hot matmul
        # (46.0 ms) both lose to the native conv (42.5 ms incl. its
        # relu/bn epilogue); NHWC (B,P,R,C) vs NWC (B*R,P,C) layouts
        # time identically (69.7 vs 69.2 ms).
        for layer in params["convs"]:
            bn = layer["bn"]
            w = layer["conv"]["w"].astype(cd)  # (out, in, k)
            # MXU accumulates f32 natively; bf16 accumulation is both
            # slower to lower and less accurate (see _conv1d_f32acc)
            feats = _conv1d_f32acc(feats, w).astype(cd)
            feats = feats + layer["conv"]["b"].astype(cd)
            feats = jax.nn.relu(feats)
            if training:
                # masked batch statistics over real read rows only
                row_w = non_empty.reshape(B * R)[:, None, None].astype(
                    jnp.float32)
                n_elems = jnp.maximum(row_w.sum() * P, 1.0)
                f32 = feats.astype(jnp.float32)
                mean = (f32 * row_w).sum(axis=(0, 1)) / n_elems
                var = (jnp.square(f32 - mean) * row_w).sum(
                    axis=(0, 1)) / n_elems
                if bn_stats is not None:
                    bn_stats.append((mean, var))
                mean = mean.astype(cd)
                var = var.astype(cd)
            else:
                mean = bn["mean"].astype(cd)
                var = bn["var"].astype(cd)
            feats = (feats - mean) * jax.lax.rsqrt(
                var.astype(jnp.float32) + 1e-5).astype(cd)
            feats = feats * bn["scale"].astype(cd) + bn["bias"].astype(cd)

        # masked mean-pool over reads FIRST, then the linear expansion
        # to lstm width: the pre_pool layer is affine and the pool is a
        # masked mean over reads, so they commute exactly —
        # mean_r(W f_r + b) = W mean_r(f_r) + b. Pooling first applies
        # the (C -> L) matmul once per column instead of once per read
        # (R x less compute and HBM traffic; reference applies it
        # per-read, ``latent_space_lstm.py:168-186``).
        feats = feats.reshape(B, R, P, -1)
        mask = non_empty.astype(cd)[:, :, None, None]
        denom = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
        pooled_c = jnp.sum(feats * mask, axis=1) / denom  # (B, P, C)
        pooled = (
            jnp.einsum(
                "bpc,lc->bpl", pooled_c,
                params["pre_pool"]["w"].astype(cd),
                preferred_element_type=cd)
            + params["pre_pool"]["b"].astype(cd))  # (B, P, L)

        if fused is None:
            fused = (compute_dtype == jnp.bfloat16
                     and jax.default_backend() not in ("cpu",))
        if fused and training:
            # differentiable kernel pair (custom VJP) for both stack
            # shapes; see ops.pallas_gru.bilstm_stack_trainable
            from medaka_tpu.ops.pallas_gru import bilstm_stack_trainable
            out = bilstm_stack_trainable(
                params["lstm"], pooled, lengths=lengths,
                bidirectional=self.bidirectional,
                compute_dtype=compute_dtype)
        elif self.bidirectional:
            if fused:
                from medaka_tpu.ops.pallas_gru import bilstm_stack_fused
                out = bilstm_stack_fused(
                    params["lstm"], pooled, lengths=lengths,
                    compute_dtype=compute_dtype)
            else:
                out = bilstm_stack(
                    params["lstm"], pooled,
                    compute_dtype=compute_dtype, lengths=lengths)
        else:
            from medaka_tpu.ops.rnn import lstm_scan
            out = pooled
            for i, layer in enumerate(params["lstm"]):
                # reverse-forward-reverse-forward interleave
                out = lstm_scan(
                    layer["fwd"], out, reverse=(i % 2 == 0),
                    compute_dtype=compute_dtype, lengths=lengths)
        logits = (
            jnp.einsum(
                "bpl,cl->bpc", out.astype(jnp.float32),
                params["linear"]["w"].astype(jnp.float32),
                preferred_element_type=jnp.float32)
            + params["linear"]["b"].astype(jnp.float32))
        if normalise:
            return jax.nn.softmax(logits, axis=-1)
        return logits

    def check_feature_encoder_compatibility(self, fenc):
        """Read-level encoders, single dtype, dwell agreement."""
        from medaka_tpu.features import ReadAlignmentFeatureEncoder
        name = type(self).__name__
        if not isinstance(fenc, ReadAlignmentFeatureEncoder):
            raise ValueError(
                "{} expects a ReadAlignmentFeatureEncoder.".format(name))
        if len(fenc.dtypes) > 1:
            raise NotImplementedError(
                "{} supports only one dtype.".format(name))
        if self.use_dwells and not getattr(fenc, "include_dwells", False):
            raise ValueError(
                "Model expects dwells but the encoder does not include "
                "them.")
