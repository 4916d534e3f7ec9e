"""ModernBERT encoder models (reference:
vllm/model_executor/models/modernbert.py — ModernBertModel,
ModernBertForSequenceClassification).

ModernBERT vs classic BERT: rotary positions instead of learned (with a
different theta for local vs global layers), alternating local-window /
global attention (global every ``global_attn_every_n_layers``), pre-norm
blocks with a GeGLU MLP, no biases by default, and the FIRST layer's
attention norm is the identity (the embedding norm covers it).

Serving shape matches bert.py: prefill-only pooling over a ragged batch
with bidirectional attention inside each request span; the local window
is enforced as a symmetric mask in the jnp attention path.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import FullAttentionSpec, KVCacheSpec
from vllm_tpu.models.bert import layer_norm
from vllm_tpu.ops.attention import AttentionMetadata, attention, write_kv_cache
from vllm_tpu.ops.linear import embedding_lookup, linear
from vllm_tpu.ops.rotary import apply_rope


@dataclass(frozen=True)
class ModernBertArgs:
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    intermediate_size: int
    ln_eps: float
    global_every: int
    local_window: int  # total window width (HF local_attention)
    global_theta: float
    local_theta: float
    norm_bias: bool
    num_labels: int = 0
    classifier_pooling: str = "cls"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def from_hf_config(hf, num_labels: int = 0) -> "ModernBertArgs":
        local_theta = getattr(hf, "local_rope_theta", None)
        global_theta = float(getattr(hf, "global_rope_theta", 160000.0))
        return ModernBertArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=hf.num_hidden_layers,
            num_heads=hf.num_attention_heads,
            intermediate_size=hf.intermediate_size,
            ln_eps=float(getattr(hf, "norm_eps", 1e-5)),
            global_every=int(getattr(hf, "global_attn_every_n_layers", 3)),
            local_window=int(getattr(hf, "local_attention", 128)),
            global_theta=global_theta,
            local_theta=float(local_theta) if local_theta is not None
            else global_theta,
            norm_bias=bool(getattr(hf, "norm_bias", False)),
            num_labels=num_labels,
            classifier_pooling=getattr(hf, "classifier_pooling", "cls"),
        )


class ModernBertModel:
    """Embedding-serving ModernBERT encoder."""

    is_pooling_only = True
    _PREFIX = "model."

    def __init__(self, model_config: ModelConfig,
                 args: Optional[ModernBertArgs] = None) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        self.args = args or ModernBertArgs.from_hf_config(hf)
        a = self.args
        self.dtype = jnp.bfloat16 if model_config.dtype == "bfloat16" \
            else jnp.float32
        self.scale = 1.0 / math.sqrt(a.head_dim)
        half = a.head_dim // 2
        exp = np.arange(0, half, dtype=np.float64) / half
        self.inv_freq_global = jnp.asarray(1.0 / a.global_theta**exp,
                                           jnp.float32)
        self.inv_freq_local = jnp.asarray(1.0 / a.local_theta**exp,
                                          jnp.float32)
        # per-layer static descriptors consumed as scan xs
        self.is_global = jnp.asarray(
            [li % a.global_every == 0 for li in range(a.num_layers)],
            jnp.bool_)
        self.skip_attn_norm = jnp.asarray(
            [li == 0 for li in range(a.num_layers)], jnp.bool_)

    def embed(self, params: dict, input_ids: jnp.ndarray) -> jnp.ndarray:
        return embedding_lookup(input_ids, params["embed"]["w"])

    def forward(self, params, input_ids, kv_caches, metadata,
                lora=None, embed_override=None):
        a = self.args
        T = input_ids.shape[0]
        kv = kv_caches[0]
        x = self.embed(params, input_ids)
        x = layer_norm(x, params["embed_ln_w"], params["embed_ln_b"],
                       a.ln_eps)
        lp = jax.tree.map(jnp.asarray, params["layers"])
        # symmetric window: |col - pos| <= local_window // 2; global
        # layers use a window wide enough to be a no-op. The value is
        # traced per layer so one scan body serves both layer kinds.
        w_local = a.local_window // 2 + 1
        w_global = 1 << 30

        def layer_step(carry, scanned):
            x, kv = carry
            li, is_global, skip_norm = scanned
            nq, d = a.num_heads, a.head_dim
            h = layer_norm(x, lp["attn_ln_w"][li], lp["attn_ln_b"][li],
                           a.ln_eps)
            h = jnp.where(skip_norm, x, h)
            qkv = linear(h, lp["qkv"], layer=li)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(T, nq, d)
            k = k.reshape(T, nq, d)
            v = v.reshape(T, nq, d)
            inv = jnp.where(is_global, self.inv_freq_global,
                            self.inv_freq_local)
            q, k = apply_rope(q, k, metadata.positions, inv)
            kv = write_kv_cache(kv, k, v, metadata.slot_mapping, layer=li)
            window = jnp.where(is_global, w_global, w_local)
            o = attention(q, kv, metadata, self.scale, layer=li,
                          causal=False, sliding_window=window)
            o = linear(o.reshape(T, nq * d), lp["attn_out"], layer=li)
            x = x + o
            h = layer_norm(x, lp["mlp_ln_w"][li], lp["mlp_ln_b"][li],
                           a.ln_eps)
            wi = linear(h, lp["wi"], layer=li)
            gin, gate = jnp.split(wi, 2, axis=-1)
            act = jax.nn.gelu(gin.astype(jnp.float32),
                              approximate=False).astype(x.dtype) * gate
            x = x + linear(act, lp["wo"], layer=li)
            return (x, kv), None

        (x, kv), _ = jax.lax.scan(
            layer_step, (x, kv),
            (jnp.arange(a.num_layers), self.is_global,
             self.skip_attn_norm))
        x = layer_norm(x, params["final_ln_w"], params["final_ln_b"],
                       a.ln_eps)
        return x, [kv]

    def compute_logits(self, params: dict,
                       hidden: jnp.ndarray) -> jnp.ndarray:
        return hidden  # pooling-only

    def get_kv_cache_specs(self, block_size: int,
                           cache_dtype: str) -> dict[str, KVCacheSpec]:
        a = self.args
        return {
            f"layers.{i}": FullAttentionSpec(
                block_size=block_size, num_kv_heads=a.num_heads,
                head_size=a.head_dim, dtype=cache_dtype)
            for i in range(a.num_layers)
        }

    def load_weights(self, weights_iter) -> dict:
        a = self.args
        npd = np.float32 if self.dtype == jnp.float32 else np.dtype(
            "bfloat16")
        H, I, L = a.hidden_size, a.intermediate_size, a.num_layers
        layers = {
            "qkv": {"w": np.empty((L, H, 3 * H), npd)},
            "attn_out": {"w": np.empty((L, H, H), npd)},
            # layer 0's attn norm is Identity in HF; w=1 b=0 is NOT
            # identity under LayerNorm, so the forward skips it by flag
            # and these row-0 values are never used
            "attn_ln_w": np.ones((L, H), npd),
            "attn_ln_b": np.zeros((L, H), npd),
            "wi": {"w": np.empty((L, H, 2 * I), npd)},
            "wo": {"w": np.empty((L, I, H), npd)},
            "mlp_ln_w": np.empty((L, H), npd),
            "mlp_ln_b": np.zeros((L, H), npd),
        }
        params: dict = {
            "layers": layers,
            "embed_ln_b": np.zeros(H, npd),
            "final_ln_b": np.zeros(H, npd),
        }
        pre = self._PREFIX
        for name, w in weights_iter:
            w = np.asarray(w)
            if name.startswith(pre):
                name = name[len(pre):]
            if name == "embeddings.tok_embeddings.weight":
                params["embed"] = {"w": w.astype(npd)}
            elif name == "embeddings.norm.weight":
                params["embed_ln_w"] = w.astype(npd)
            elif name == "embeddings.norm.bias":
                params["embed_ln_b"] = w.astype(npd)
            elif name == "final_norm.weight":
                params["final_ln_w"] = w.astype(npd)
            elif name == "final_norm.bias":
                params["final_ln_b"] = w.astype(npd)
            elif name == "head.dense.weight":
                params.setdefault("head_dense", {})["w"] = w.T.astype(npd)
            elif name == "head.dense.bias":
                params.setdefault("head_dense", {})["b"] = w.astype(npd)
            elif name == "head.norm.weight":
                params["head_ln_w"] = w.astype(npd)
            elif name == "head.norm.bias":
                params["head_ln_b"] = w.astype(npd)
            elif name == "classifier.weight":
                params.setdefault("classifier", {})["w"] = w.T.astype(npd)
            elif name == "classifier.bias":
                params.setdefault("classifier", {})["b"] = w.astype(npd)
            elif name.startswith("layers."):
                parts = name.split(".")
                li = int(parts[1])
                sub = ".".join(parts[2:])
                if sub == "attn.Wqkv.weight":
                    layers["qkv"]["w"][li] = w.T
                elif sub == "attn.Wo.weight":
                    layers["attn_out"]["w"][li] = w.T
                elif sub == "attn_norm.weight":
                    layers["attn_ln_w"][li] = w
                elif sub == "attn_norm.bias":
                    layers["attn_ln_b"][li] = w
                elif sub == "mlp.Wi.weight":
                    layers["wi"]["w"][li] = w.T
                elif sub == "mlp.Wo.weight":
                    layers["wo"]["w"][li] = w.T
                elif sub == "mlp_norm.weight":
                    layers["mlp_ln_w"][li] = w
                elif sub == "mlp_norm.bias":
                    layers["mlp_ln_b"][li] = w
        if "head_ln_b" not in params and "head_ln_w" in params:
            params["head_ln_b"] = np.zeros(H, npd)
        return params


class ModernBertForSequenceClassification(ModernBertModel):
    """Classifier / cross-encoder head (reference: models/modernbert.py
    ModernBertForSequenceClassification): pool (cls or mean) ->
    head.dense -> gelu -> head.norm -> classifier."""

    def __init__(self, model_config: ModelConfig,
                 args: Optional[ModernBertArgs] = None) -> None:
        hf = model_config.resolve_hf_config()
        args = args or ModernBertArgs.from_hf_config(
            hf, num_labels=int(getattr(hf, "num_labels", 1)))
        super().__init__(model_config, args)

    def classify(self, params, hidden: jnp.ndarray,
                 metadata: AttentionMetadata) -> jnp.ndarray:
        a = self.args
        qsl = metadata.query_start_loc
        R = qsl.shape[0] - 1
        if a.classifier_pooling == "mean":
            T = hidden.shape[0]
            token_ids = jnp.arange(T, dtype=jnp.int32)
            token_req = jnp.clip(
                jnp.searchsorted(qsl, token_ids, side="right") - 1, 0,
                R)
            # tokens past the last request sum into segment R (dropped)
            token_req = jnp.where(token_ids < qsl[-1], token_req, R)
            sums = jax.ops.segment_sum(hidden.astype(jnp.float32),
                                       token_req, num_segments=R + 1)
            counts = jnp.maximum(qsl[1:] - qsl[:-1], 1)
            pooled = (sums[:R] / counts[:, None]).astype(hidden.dtype)
        else:
            pooled = hidden[qsl[:-1]]
        h = linear(pooled, params["head_dense"])
        h = jax.nn.gelu(h.astype(jnp.float32),
                        approximate=False).astype(pooled.dtype)
        h = layer_norm(h, params["head_ln_w"], params["head_ln_b"],
                       a.ln_eps)
        return linear(h, params["classifier"])
