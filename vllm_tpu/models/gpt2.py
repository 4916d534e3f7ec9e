"""GPT-2 (reference parity: vllm/model_executor/models/gpt2.py).

Learned positional embeddings, LayerNorm (not RMS), fused c_attn qkv,
gelu_new MLP. Checkpoint Conv1D weights are stored [in, out] already (no
transpose).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import FullAttentionSpec
from vllm_tpu.models.llama import _np_dtype
from vllm_tpu.ops.activation import gelu_new
from vllm_tpu.ops.attention import AttentionMetadata, attention, \
    write_kv_cache
from vllm_tpu.ops.layernorm import layer_norm
from vllm_tpu.ops.linear import embedding_lookup, linear, lm_head_logits


class GPT2LMHeadModel:

    def __init__(self, model_config: ModelConfig) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        self.hidden = hf.hidden_size
        self.num_layers = hf.num_hidden_layers
        self.num_heads = hf.num_attention_heads
        self.head_dim = self.hidden // self.num_heads
        self.inner = getattr(hf, "n_inner", None) or 4 * self.hidden
        self.vocab_size = hf.vocab_size
        self.max_pos = hf.max_position_embeddings
        self.ln_eps = getattr(hf, "layer_norm_epsilon", 1e-5)
        self.dtype = jnp.bfloat16 if model_config.dtype == "bfloat16" \
            else jnp.float32
        self.scale = 1.0 / math.sqrt(self.head_dim)
        # GPTBigCode (StarCoder) overrides: 1 kv head + nn.Linear layout
        self.num_kv = self._num_kv_heads(hf)
        # JAIS overrides: ALiBi instead of wpe, swiglu MLP, muP scales
        self.alibi_slopes = None
        self.embeddings_scale = None
        self.logits_scale = None
        self.swiglu = False

        class _Args:
            vocab_size = self.vocab_size
            num_layers = self.num_layers
            num_kv_heads = self.num_kv
            head_dim = self.head_dim
            hidden_size = self.hidden

        self.args = _Args()

    # checkpoint linear layout: GPT-2 Conv1D stores [in, out] (no
    # transpose); GPTBigCode nn.Linear stores [out, in]
    _linear_layout = False

    def _num_kv_heads(self, hf) -> int:
        return self.num_heads

    def forward(self, params, input_ids, kv_caches, metadata,
                lora=None):
        x = embedding_lookup(input_ids, params["embed"]["w"])
        if "pos_embed" in params:  # absent under ALiBi (JAIS)
            x = x + embedding_lookup(metadata.positions,
                                     params["pos_embed"])
        if self.embeddings_scale is not None:
            x = x * jnp.asarray(self.embeddings_scale, x.dtype)

        def body(carry, scanned):
            h, kv = carry
            lp, li = scanned
            nh, hd = self.num_heads, self.head_dim
            T = h.shape[0]
            a = layer_norm(h, lp["ln1_w"], lp["ln1_b"], self.ln_eps)
            nk = self.num_kv
            qkv = linear(a, lp["qkv"])
            q, k, v = jnp.split(qkv, [nh * hd, (nh + nk) * hd], axis=-1)
            q = q.reshape(T, nh, hd)
            k = k.reshape(T, nk, hd)
            v = v.reshape(T, nk, hd)
            kv = write_kv_cache(kv, k, v, metadata.slot_mapping,
                                layer=li)
            attn = attention(q, kv, metadata, self.scale, layer=li,
                             alibi_slopes=self.alibi_slopes)
            h = h + linear(attn.reshape(T, nh * hd), lp["o"])
            a = layer_norm(h, lp["ln2_w"], lp["ln2_b"], self.ln_eps)
            if self.swiglu:  # JAIS: silu(c_fc) * c_fc2
                act = jax.nn.silu(linear(a, lp["fc"])) * \
                    linear(a, lp["fc2"])
            else:
                act = gelu_new(linear(a, lp["fc"]))
            mlp = linear(act, lp["proj"])
            return (h + mlp, kv), None

        idxs = jnp.arange(self.args.num_layers, dtype=jnp.int32)
        (x, new_kv), _ = jax.lax.scan(body, (x, kv_caches[0]),
                                      (params["layers"], idxs))
        x = layer_norm(x, params["final_ln_w"], params["final_ln_b"],
                       self.ln_eps)
        return x, [new_kv]

    def compute_logits(self, params, hidden):
        logits = lm_head_logits(hidden, params["lm_head"])
        if self.logits_scale is not None:
            logits = logits * jnp.asarray(self.logits_scale,
                                          logits.dtype)
        return logits

    def get_kv_cache_specs(self, block_size, cache_dtype):
        return {
            f"h.{i}": FullAttentionSpec(block_size=block_size,
                                        num_kv_heads=self.num_kv,
                                        head_size=self.head_dim,
                                        dtype=cache_dtype)
            for i in range(self.num_layers)
        }

    def load_weights(self, weights_iter):
        L, H, I = self.num_layers, self.hidden, self.inner
        np_dtype = _np_dtype(self.model_config.dtype)
        layers: dict[str, Any] = {
            "ln1_w": np.empty((L, H), np_dtype),
            "ln1_b": np.empty((L, H), np_dtype),
            "ln2_w": np.empty((L, H), np_dtype),
            "ln2_b": np.empty((L, H), np_dtype),
            "qkv": {"w": np.empty(
                (L, H, (self.num_heads + 2 * self.num_kv) *
                 self.head_dim), np_dtype),
                    "b": np.empty(
                (L, (self.num_heads + 2 * self.num_kv) *
                 self.head_dim), np_dtype)},
            "o": {"w": np.empty((L, H, H), np_dtype),
                  "b": np.empty((L, H), np_dtype)},
            "fc": {"w": np.empty((L, H, I), np_dtype),
                   "b": np.empty((L, I), np_dtype)},
            "proj": {"w": np.empty((L, I, H), np_dtype),
                     "b": np.empty((L, H), np_dtype)},
        }
        if self.swiglu:
            layers["fc2"] = {"w": np.empty((L, H, I), np_dtype),
                             "b": np.zeros((L, I), np_dtype)}
        params: dict[str, Any] = {
            "embed": {"w": np.empty((self.vocab_size, H), np_dtype)},
            "layers": layers,
            "final_ln_w": np.empty((H,), np_dtype),
            "final_ln_b": np.empty((H,), np_dtype),
            "lm_head": {"w": np.empty((H, self.vocab_size), np_dtype)},
        }
        if self.alibi_slopes is None:
            params["pos_embed"] = np.empty((self.max_pos, H), np_dtype)
        # Conv1D layout: weight [in, out] — no transpose.
        suffix_map = {
            "ln_1.weight": ("ln1_w", None),
            "ln_1.bias": ("ln1_b", None),
            "ln_2.weight": ("ln2_w", None),
            "ln_2.bias": ("ln2_b", None),
            "attn.c_attn.weight": ("qkv", "w"),
            "attn.c_attn.bias": ("qkv", "b"),
            "attn.c_proj.weight": ("o", "w"),
            "attn.c_proj.bias": ("o", "b"),
            "mlp.c_fc.weight": ("fc", "w"),
            "mlp.c_fc.bias": ("fc", "b"),
            "mlp.c_fc2.weight": ("fc2", "w"),
            "mlp.c_fc2.bias": ("fc2", "b"),
            "mlp.c_proj.weight": ("proj", "w"),
            "mlp.c_proj.bias": ("proj", "b"),
        }
        for name, w in weights_iter:
            w = np.asarray(w)
            if name.startswith("transformer."):
                name = name[len("transformer."):]
            if name == "wte.weight":
                params["embed"]["w"][...] = w.astype(np_dtype)
            elif name == "wpe.weight":
                params["pos_embed"][...] = w.astype(np_dtype)
            elif name == "ln_f.weight":
                params["final_ln_w"][...] = w.astype(np_dtype)
            elif name == "ln_f.bias":
                params["final_ln_b"][...] = w.astype(np_dtype)
            elif name == "lm_head.weight":
                params["lm_head"]["w"][...] = w.T.astype(np_dtype)
            elif name.startswith("h."):
                layer_str, suffix = name[2:].split(".", 1)
                entry = suffix_map.get(suffix)
                if entry is None:
                    continue
                key, leaf = entry
                li = int(layer_str)
                if leaf is None:
                    layers[key][li] = w.astype(np_dtype)
                else:
                    if leaf == "w" and self._linear_layout:
                        w = w.T
                    layers[key][leaf][li] = w.astype(np_dtype)
        # GPT-2/StarCoder tie lm_head to wte.
        params["lm_head"]["w"][...] = params["embed"]["w"].T
        return params

    def init_dummy_params(self, seed: int = 0):
        raise NotImplementedError("use a real GPT-2 checkpoint")


class GPTBigCodeForCausalLM(GPT2LMHeadModel):
    """GPTBigCode / StarCoder-1 (reference: models/gpt_bigcode.py):
    GPT-2 skeleton with multi-query attention (one kv head) and
    nn.Linear checkpoint layout (transposed vs GPT-2's Conv1D)."""

    _linear_layout = True

    def _num_kv_heads(self, hf) -> int:
        return 1 if getattr(hf, "multi_query", True) else self.num_heads


class GPT2ForSequenceClassification(GPT2LMHeadModel):
    """GPT-2 sequence classifier (reference:
    models/gpt2.py analog in the reference registry): bias-free score
    head over the LAST token's hidden state; served via the pooling
    path (task="classify")."""

    def __init__(self, model_config: ModelConfig) -> None:
        super().__init__(model_config)
        hf = model_config.resolve_hf_config()
        self.num_labels = int(getattr(hf, "num_labels", 2))

    def classify(self, params, hidden, metadata):
        qsl = metadata.query_start_loc
        last = hidden[jnp.maximum(qsl[1:] - 1, 0)]
        return linear(last, params["score"])

    def load_weights(self, weights_iter):
        extra = {}

        def tap(it):
            for name, w in it:
                if name.startswith("score."):
                    extra[name] = np.asarray(w)
                else:
                    yield name, w

        params = super().load_weights(tap(weights_iter))
        np_dtype = _np_dtype(self.model_config.dtype)
        params["score"] = {
            "w": extra.get("score.weight",
                           np.zeros((self.num_labels, self.hidden),
                                    np.float32)).T.astype(np_dtype)}
        return params


class JAISLMHeadModel(GPT2LMHeadModel):
    """Core42 JAIS (reference: models/jais.py +
    transformers_utils/configs/jais.py): GPT-2 skeleton with ALiBi
    instead of learned positions, a swiglu MLP (``c_fc``/``c_fc2``),
    muP scalings (``embeddings_scale`` on the embedding output,
    ``width_scale`` on the logits), and optionally 1/d attention
    scaling (``scale_qk_dot_by_d``). Raw gpt2-style config attrs
    (``n_embd``/``n_layer``/``n_head``) are normalized here because the
    remote-code config class is unavailable without egress."""

    def __init__(self, model_config: ModelConfig) -> None:
        hf = model_config.resolve_hf_config()
        for ours, raw in (("hidden_size", "n_embd"),
                          ("num_hidden_layers", "n_layer"),
                          ("num_attention_heads", "n_head"),
                          ("max_position_embeddings", "n_positions")):
            if not hasattr(hf, ours) and hasattr(hf, raw):
                setattr(hf, ours, getattr(hf, raw))
        super().__init__(model_config)
        if getattr(hf, "position_embedding_type", "alibi") == "alibi":
            from vllm_tpu.models.neox import _alibi_slopes

            self.alibi_slopes = jnp.asarray(
                _alibi_slopes(self.num_heads), jnp.float32)
        self.swiglu = getattr(hf, "activation_function",
                              "swiglu") == "swiglu"
        if hasattr(hf, "embeddings_scale"):
            self.embeddings_scale = float(hf.embeddings_scale)
        elif hasattr(hf, "mup_embeddings_scale"):
            self.embeddings_scale = float(hf.mup_embeddings_scale)
        if hasattr(hf, "width_scale"):
            self.logits_scale = float(hf.width_scale)
        elif hasattr(hf, "mup_output_alpha"):
            self.logits_scale = float(hf.mup_output_alpha) * \
                float(hf.mup_width_scale)
        if bool(getattr(hf, "scale_qk_dot_by_d",
                        getattr(hf, "mup_scale_qk_dot_by_d", False))):
            self.scale = 1.0 / self.head_dim
