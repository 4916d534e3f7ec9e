"""BERT encoder models: embeddings + cross-encoder scoring (reference:
vllm/model_executor/models/bert.py — BertEmbeddingModel, cross-encoder
BertForSequenceClassification).

Encoder serving is prefill-only pooling: the whole prompt runs in one
ragged batch pass with BIDIRECTIONAL attention inside each request span
(attention(..., causal=False)); there is no decode phase. KV pages are
written once and attended once, so the paged cache degenerates to a
scratch buffer — kept for uniformity with the runner's step.
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
from vllm_tpu.ops.attention import (AttentionMetadata, attention,
                                    write_kv_cache)
from vllm_tpu.ops.linear import embedding_lookup, linear


def layer_norm(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
               eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu)**2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


@dataclass(frozen=True)
class BertArgs:
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    intermediate_size: int
    max_position: int
    type_vocab_size: int
    ln_eps: float
    num_labels: int = 0  # >0: sequence-classification head

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def from_hf_config(hf, num_labels: int = 0) -> "BertArgs":
        return BertArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=hf.num_hidden_layers,
            num_heads=hf.num_attention_heads,
            intermediate_size=hf.intermediate_size,
            max_position=hf.max_position_embeddings,
            type_vocab_size=getattr(hf, "type_vocab_size", 2),
            ln_eps=float(getattr(hf, "layer_norm_eps", 1e-12)),
            num_labels=num_labels,
        )


class BertEmbeddingModel:
    """BertModel for /v1/embeddings-style pooling serving (reference:
    models/bert.py BertEmbeddingModel). Post-LN encoder, learned
    positions, bidirectional attention within each request span."""

    is_pooling_only = True

    def __init__(self, model_config: ModelConfig,
                 args: Optional[BertArgs] = None) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        self.args = args or BertArgs.from_hf_config(hf)
        self.dtype = jnp.bfloat16 if model_config.dtype == "bfloat16" \
            else jnp.float32
        self.scale = 1.0 / math.sqrt(self.args.head_dim)

    def embed(self, params: dict, input_ids: jnp.ndarray) -> jnp.ndarray:
        return embedding_lookup(input_ids, params["embed"]["w"])

    def forward(
        self,
        params: dict,
        input_ids: jnp.ndarray,
        kv_caches,
        metadata: AttentionMetadata,
        lora=None,
        embed_override=None,
    ):
        a = self.args
        T = input_ids.shape[0]
        kv = kv_caches[0]
        x = self.embed(params, input_ids)
        pos = jnp.clip(metadata.positions, 0, a.max_position - 1)
        x = x + params["pos_embed"][pos] + params["type_embed"][0]
        x = layer_norm(x, params["embed_ln_w"], params["embed_ln_b"],
                       a.ln_eps)

        lp = jax.tree.map(jnp.asarray, params["layers"])

        def layer_step(carry, li):
            x, kv = carry
            nq, d = a.num_heads, a.head_dim
            qkv = linear(x, lp["qkv"], layer=li)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(T, nq, d)
            k = k.reshape(T, nq, d)
            v = v.reshape(T, nq, d)
            kv = write_kv_cache(kv, k, v, metadata.slot_mapping, layer=li)
            o = attention(q, kv, metadata, self.scale, layer=li,
                          causal=False)
            o = linear(o.reshape(T, nq * d), lp["attn_out"], layer=li)
            x = layer_norm(x + o, lp["attn_ln_w"][li], lp["attn_ln_b"][li],
                           a.ln_eps)
            h = jax.nn.gelu(linear(x, lp["inter"], layer=li).astype(
                jnp.float32), approximate=False).astype(x.dtype)
            h = linear(h, lp["out"], layer=li)
            x = layer_norm(x + h, lp["out_ln_w"][li], lp["out_ln_b"][li],
                           a.ln_eps)
            return (x, kv), None

        (x, kv), _ = jax.lax.scan(layer_step, (x, kv),
                                  jnp.arange(a.num_layers))
        return x, [kv]

    def compute_logits(self, params: dict,
                       hidden: jnp.ndarray) -> jnp.ndarray:
        # pooling-only model: no LM head; return hidden so the runner's
        # generic logits gather stays shape-valid (never sampled from)
        return hidden

    def pooler_head(self, params: dict,
                    cls_hidden: jnp.ndarray) -> jnp.ndarray:
        """BERT pooler: tanh(dense(CLS)) (reference: BertPooler)."""
        h = linear(cls_hidden, params["pooler"])
        return jnp.tanh(h.astype(jnp.float32)).astype(cls_hidden.dtype)

    def get_kv_cache_specs(self, block_size: int,
                           cache_dtype: str) -> dict[str, KVCacheSpec]:
        a = self.args
        return {
            f"layers.{i}": FullAttentionSpec(
                block_size=block_size, num_kv_heads=a.num_heads,
                head_size=a.head_dim, dtype=cache_dtype)
            for i in range(a.num_layers)
        }

    _PREFIX = "bert."

    def load_weights(self, weights_iter) -> dict:
        a = self.args
        npd = np.float32 if self.dtype == jnp.float32 else np.dtype(
            "bfloat16")
        H, I, L = a.hidden_size, a.intermediate_size, a.num_layers
        layers = {
            "qkv": {"w": np.empty((L, H, 3 * H), npd),
                    "b": np.empty((L, 3 * H), npd)},
            "attn_out": {"w": np.empty((L, H, H), npd),
                         "b": np.empty((L, H), npd)},
            "attn_ln_w": np.empty((L, H), npd),
            "attn_ln_b": np.empty((L, H), npd),
            "inter": {"w": np.empty((L, H, I), npd),
                      "b": np.empty((L, I), npd)},
            "out": {"w": np.empty((L, I, H), npd),
                    "b": np.empty((L, H), npd)},
            "out_ln_w": np.empty((L, H), npd),
            "out_ln_b": np.empty((L, H), npd),
        }
        params: dict = {"layers": layers}
        pre = self._PREFIX
        qkv_slot = {"query": 0, "key": 1, "value": 2}
        for name, w in weights_iter:
            w = np.asarray(w)
            if name.startswith(pre):
                name = name[len(pre):]
            if name == "embeddings.word_embeddings.weight":
                params["embed"] = {"w": w.astype(npd)}
            elif name == "embeddings.position_embeddings.weight":
                params["pos_embed"] = w.astype(npd)
            elif name == "embeddings.token_type_embeddings.weight":
                params["type_embed"] = w.astype(npd)
            elif name == "embeddings.LayerNorm.weight":
                params["embed_ln_w"] = w.astype(npd)
            elif name == "embeddings.LayerNorm.bias":
                params["embed_ln_b"] = w.astype(npd)
            elif name == "pooler.dense.weight":
                params["pooler"] = params.get("pooler", {})
                params["pooler"]["w"] = w.T.astype(npd)
            elif name == "pooler.dense.bias":
                params["pooler"] = params.get("pooler", {})
                params["pooler"]["b"] = w.astype(npd)
            elif name.startswith("encoder.layer."):
                parts = name.split(".")
                li = int(parts[2])
                sub = ".".join(parts[3:])
                H = a.hidden_size
                if sub.startswith("attention.self."):
                    which = qkv_slot[parts[5]]
                    if sub.endswith("weight"):
                        layers["qkv"]["w"][li, :, which * H:(which + 1) *
                                           H] = w.T
                    else:
                        layers["qkv"]["b"][li, which * H:(which + 1) *
                                           H] = w
                elif sub == "attention.output.dense.weight":
                    layers["attn_out"]["w"][li] = w.T
                elif sub == "attention.output.dense.bias":
                    layers["attn_out"]["b"][li] = w
                elif sub == "attention.output.LayerNorm.weight":
                    layers["attn_ln_w"][li] = w
                elif sub == "attention.output.LayerNorm.bias":
                    layers["attn_ln_b"][li] = w
                elif sub == "intermediate.dense.weight":
                    layers["inter"]["w"][li] = w.T
                elif sub == "intermediate.dense.bias":
                    layers["inter"]["b"][li] = w
                elif sub == "output.dense.weight":
                    layers["out"]["w"][li] = w.T
                elif sub == "output.dense.bias":
                    layers["out"]["b"][li] = w
                elif sub == "output.LayerNorm.weight":
                    layers["out_ln_w"][li] = w
                elif sub == "output.LayerNorm.bias":
                    layers["out_ln_b"][li] = w
            elif name == "classifier.weight":
                params["classifier"] = params.get("classifier", {})
                params["classifier"]["w"] = w.T.astype(npd)
            elif name == "classifier.bias":
                params["classifier"] = params.get("classifier", {})
                params["classifier"]["b"] = w.astype(npd)
        return params


class BertForSequenceClassification(BertEmbeddingModel):
    """Cross-encoder scorer (reference: models/bert.py
    BertForSequenceClassification): classifier(dense-tanh-pool(CLS))."""

    def __init__(self, model_config: ModelConfig,
                 args: Optional[BertArgs] = None) -> None:
        hf = model_config.resolve_hf_config()
        args = args or BertArgs.from_hf_config(
            hf, num_labels=int(getattr(hf, "num_labels", 1)))
        super().__init__(model_config, args)

    def classify(self, params: dict, hidden: jnp.ndarray,
                 metadata: AttentionMetadata) -> jnp.ndarray:
        """Per-request classification scores from the packed hidden
        states: gather each request's CLS (first) token, pool,
        classify. Returns [R, num_labels]."""
        cls = hidden[metadata.query_start_loc[:-1]]
        pooled = self.pooler_head(params, cls)
        return linear(pooled, params["classifier"])


class XLMRobertaModel(BertEmbeddingModel):
    """XLM-RoBERTa embedding model (bge-m3 family; reference:
    models/roberta.py): BERT encoder with padding-offset learned
    positions (position id = pos + padding_idx + 1)."""

    _PREFIX = "roberta."

    def __init__(self, model_config: ModelConfig,
                 args: Optional[BertArgs] = None) -> None:
        super().__init__(model_config, args)
        hf = model_config.resolve_hf_config()
        self.pad_offset = int(getattr(hf, "pad_token_id", 1) or 1) + 1

    def forward(self, params, input_ids, kv_caches, metadata, lora=None,
                embed_override=None):
        a = self.args
        # roberta's learned positions are shifted by padding_idx + 1
        pos = jnp.clip(metadata.positions + self.pad_offset, 0,
                       a.max_position - 1)
        T = input_ids.shape[0]
        kv = kv_caches[0]
        x = self.embed(params, input_ids)
        x = x + params["pos_embed"][pos] + params["type_embed"][0]
        x = layer_norm(x, params["embed_ln_w"], params["embed_ln_b"],
                       a.ln_eps)
        lp = jax.tree.map(jnp.asarray, params["layers"])

        def layer_step(carry, li):
            x, kv = carry
            nq, d = a.num_heads, a.head_dim
            qkv = linear(x, lp["qkv"], layer=li)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(T, nq, d)
            k = k.reshape(T, nq, d)
            v = v.reshape(T, nq, d)
            kv = write_kv_cache(kv, k, v, metadata.slot_mapping, layer=li)
            o = attention(q, kv, metadata, self.scale, layer=li,
                          causal=False)
            o = linear(o.reshape(T, nq * d), lp["attn_out"], layer=li)
            x = layer_norm(x + o, lp["attn_ln_w"][li],
                           lp["attn_ln_b"][li], a.ln_eps)
            h = jax.nn.gelu(linear(x, lp["inter"], layer=li).astype(
                jnp.float32), approximate=False).astype(x.dtype)
            h = linear(h, lp["out"], layer=li)
            x = layer_norm(x + h, lp["out_ln_w"][li], lp["out_ln_b"][li],
                           a.ln_eps)
            return (x, kv), None

        (x, kv), _ = jax.lax.scan(layer_step, (x, kv),
                                  jnp.arange(a.num_layers))
        return x, [kv]


class XLMRobertaForSequenceClassification(XLMRobertaModel):
    """Cross-encoder reranker (bge-reranker family; reference:
    models/roberta.py RobertaForSequenceClassification): RoBERTa
    classification head = out_proj(tanh(dense(CLS)))."""

    def __init__(self, model_config: ModelConfig,
                 args: Optional[BertArgs] = None) -> None:
        hf = model_config.resolve_hf_config()
        args = args or BertArgs.from_hf_config(
            hf, num_labels=int(getattr(hf, "num_labels", 1)))
        super().__init__(model_config, args)

    def load_weights(self, weights_iter):
        extra = {}

        def tap(it):
            for name, w in it:
                if name.startswith("classifier."):
                    extra[name] = np.asarray(w)
                yield name, w

        params = super().load_weights(tap(weights_iter))
        npd = np.float32 if self.dtype == jnp.float32 else np.dtype(
            "bfloat16")
        if "classifier.dense.weight" in extra:
            params["cls_dense"] = {
                "w": extra["classifier.dense.weight"].T.astype(npd),
                "b": extra["classifier.dense.bias"].astype(npd),
            }
            params["classifier"] = {
                "w": extra["classifier.out_proj.weight"].T.astype(npd),
                "b": extra["classifier.out_proj.bias"].astype(npd),
            }
        return params

    def classify(self, params, hidden, metadata) -> jnp.ndarray:
        cls = hidden[metadata.query_start_loc[:-1]]
        h = jnp.tanh(linear(cls, params["cls_dense"]).astype(
            jnp.float32)).astype(cls.dtype)
        return linear(h, params["classifier"])
