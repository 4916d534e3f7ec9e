"""OPT (reference parity: vllm/model_executor/models/opt.py).

Learned positional embeddings with the OPT +2 offset, LayerNorm, ReLU MLP,
separate q/k/v projections with bias.
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
from vllm_tpu.ops.attention import attention, write_kv_cache
from vllm_tpu.ops.layernorm import layer_norm
from vllm_tpu.ops.linear import embedding_lookup, linear, lm_head_logits


class OPTForCausalLM:

    def __init__(self, model_config: ModelConfig) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        self.hidden = hf.hidden_size
        self.num_layers = hf.num_hidden_layers
        self.num_heads = hf.num_attention_heads
        self.head_dim = self.hidden // self.num_heads
        self.inner = hf.ffn_dim
        self.vocab_size = hf.vocab_size
        self.word_embed_dim = getattr(hf, "word_embed_proj_dim",
                                      self.hidden)
        assert self.word_embed_dim == self.hidden, \
            "OPT word_embed_proj_dim != hidden not yet supported"
        self.max_pos = hf.max_position_embeddings
        self.do_ln_before = bool(getattr(hf, "do_layer_norm_before", True))
        self.dtype = jnp.bfloat16 if model_config.dtype == "bfloat16" \
            else jnp.float32
        self.scale = 1.0 / math.sqrt(self.head_dim)

        class _Args:
            vocab_size = self.vocab_size
            num_layers = self.num_layers
            num_kv_heads = self.num_heads
            head_dim = self.head_dim
            hidden_size = self.hidden

        self.args = _Args()

    def forward(self, params, input_ids, kv_caches, metadata,
                lora=None, embed_override=None):
        x = embedding_lookup(input_ids, params["embed"]["w"])
        if embed_override is not None:
            # VLM composition (BLIP-2): query embeddings substituted at
            # image-placeholder slots BEFORE positions are added
            idx, vecs = embed_override
            x = x.at[idx].set(vecs.astype(x.dtype))
        # OPT's learned positions are offset by 2 (padding legacy).
        x = x + embedding_lookup(metadata.positions + 2,
                                 params["pos_embed"])

        def body(carry, scanned):
            h, kv = carry
            lp, li = scanned
            nh, hd = self.num_heads, self.head_dim
            T = h.shape[0]
            residual = h
            a = layer_norm(h, lp["ln1_w"], lp["ln1_b"]) \
                if self.do_ln_before else h
            qkv = linear(a, lp["qkv"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(T, nh, hd)
            k = k.reshape(T, nh, hd)
            v = v.reshape(T, nh, hd)
            kv = write_kv_cache(kv, k, v, metadata.slot_mapping,
                                layer=li)
            attn = attention(q, kv, metadata, self.scale, layer=li)
            h = residual + linear(attn.reshape(T, nh * hd), lp["o"])
            if not self.do_ln_before:
                h = layer_norm(h, lp["ln1_w"], lp["ln1_b"])
            residual = h
            a = layer_norm(h, lp["ln2_w"], lp["ln2_b"]) \
                if self.do_ln_before else h
            mlp = linear(jax.nn.relu(linear(a, lp["fc"])), lp["proj"])
            h = residual + mlp
            if not self.do_ln_before:
                h = layer_norm(h, lp["ln2_w"], lp["ln2_b"])
            return (h, kv), None

        idxs = jnp.arange(self.args.num_layers, dtype=jnp.int32)
        (x, new_kv), _ = jax.lax.scan(body, (x, kv_caches[0]),
                                      (params["layers"], idxs))
        if self.do_ln_before:
            x = layer_norm(x, params["final_ln_w"], params["final_ln_b"])
        return x, [new_kv]

    def compute_logits(self, params, hidden):
        return lm_head_logits(hidden, params["lm_head"])

    def get_kv_cache_specs(self, block_size, cache_dtype):
        return {
            f"layers.{i}": FullAttentionSpec(block_size=block_size,
                                             num_kv_heads=self.num_heads,
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
            "qkv": {"w": np.empty((L, H, 3 * H), np_dtype),
                    "b": np.empty((L, 3 * H), np_dtype)},
            "o": {"w": np.empty((L, H, H), np_dtype),
                  "b": np.empty((L, H), np_dtype)},
            "fc": {"w": np.empty((L, H, I), np_dtype),
                   "b": np.empty((L, I), np_dtype)},
            "proj": {"w": np.empty((L, I, H), np_dtype),
                     "b": np.empty((L, H), np_dtype)},
        }
        params: dict[str, Any] = {
            "embed": {"w": np.empty((self.vocab_size, H), np_dtype)},
            "pos_embed": np.empty((self.max_pos + 2, H), np_dtype),
            "layers": layers,
            "final_ln_w": np.empty((H,), np_dtype),
            "final_ln_b": np.empty((H,), np_dtype),
            "lm_head": {"w": np.empty((H, self.vocab_size), np_dtype)},
        }
        qkv_off = {"q_proj": 0, "k_proj": H, "v_proj": 2 * H}
        for name, w in weights_iter:
            w = np.asarray(w)
            name = name.removeprefix("model.").removeprefix("decoder.")
            if name == "embed_tokens.weight":
                params["embed"]["w"][...] = w.astype(np_dtype)
            elif name == "embed_positions.weight":
                params["pos_embed"][...] = w.astype(np_dtype)
            elif name in ("final_layer_norm.weight",):
                params["final_ln_w"][...] = w.astype(np_dtype)
            elif name in ("final_layer_norm.bias",):
                params["final_ln_b"][...] = w.astype(np_dtype)
            elif name == "lm_head.weight":
                params["lm_head"]["w"][...] = w.T.astype(np_dtype)
            elif name.startswith("layers."):
                layer_str, suffix = name[len("layers."):].split(".", 1)
                li = int(layer_str)
                for proj, off in qkv_off.items():
                    if suffix == f"self_attn.{proj}.weight":
                        layers["qkv"]["w"][li, :, off:off + H] = \
                            w.T.astype(np_dtype)
                        break
                    if suffix == f"self_attn.{proj}.bias":
                        layers["qkv"]["b"][li, off:off + H] = \
                            w.astype(np_dtype)
                        break
                else:
                    simple = {
                        "self_attn.out_proj.weight": ("o", "w", True),
                        "self_attn.out_proj.bias": ("o", "b", False),
                        "self_attn_layer_norm.weight": ("ln1_w", None,
                                                        False),
                        "self_attn_layer_norm.bias": ("ln1_b", None, False),
                        "final_layer_norm.weight": ("ln2_w", None, False),
                        "final_layer_norm.bias": ("ln2_b", None, False),
                        "fc1.weight": ("fc", "w", True),
                        "fc1.bias": ("fc", "b", False),
                        "fc2.weight": ("proj", "w", True),
                        "fc2.bias": ("proj", "b", False),
                    }
                    entry = simple.get(suffix)
                    if entry is None:
                        continue
                    key, leaf, transpose = entry
                    if transpose:
                        w = w.T
                    if leaf is None:
                        layers[key][li] = w.astype(np_dtype)
                    else:
                        layers[key][leaf][li] = w.astype(np_dtype)
        # OPT ties lm_head to embed_tokens.
        params["lm_head"]["w"][...] = params["embed"]["w"].T
        return params

    def init_dummy_params(self, seed: int = 0):
        raise NotImplementedError("use a real OPT checkpoint")
