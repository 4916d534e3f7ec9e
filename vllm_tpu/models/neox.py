"""LayerNorm-family causal LMs: GPT-NeoX (Pythia), Phi-1.5/2, StableLM,
Starcoder2, Cohere Command-R (reference parity: the corresponding
vllm/model_executor/models/{gpt_neox,phi,stablelm,starcoder2,commandr}.py
modules; built on one configurable decoder block, layer-stacked + scanned
like the Llama family).

Block shape knobs:
  parallel_residual  x + attn(ln1(x)) + mlp(ln2(x))   (neox/phi/cohere)
  shared_input_ln    mlp input reuses ln1(x)           (phi/cohere)
  gated_mlp          silu(gate)*up (stablelm/cohere) vs dense gelu
  norm "ln"|"rms", biases per tensor family, partial rotary, qk-norm
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import FullAttentionSpec, KVCacheSpec
from vllm_tpu.models.llama import _np_dtype
from vllm_tpu.ops.activation import GATED_ACTIVATIONS
from vllm_tpu.ops.attention import AttentionMetadata, attention, \
    write_kv_cache
from vllm_tpu.ops.layernorm import rms_norm
from vllm_tpu.ops.linear import embedding_lookup, linear, lm_head_logits
from vllm_tpu.ops.rotary import RopeConfig, apply_rope, compute_inv_freq


def layer_norm(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray],
               eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def _alibi_slopes(n_heads: int) -> np.ndarray:
    """Standard ALiBi head slopes (reference: the alibi_slopes the
    engine passes into csrc paged attention for Bloom/MPT)."""
    closest = 2 ** math.floor(math.log2(n_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(closest) - 3)))
    slopes = [base ** (i + 1) for i in range(closest)]
    if closest != n_heads:
        extra = 2.0 ** (-(2.0 ** -(math.log2(2 * closest) - 3)))
        slopes += [extra ** (2 * i + 1) for i in range(n_heads - closest)]
    return np.asarray(slopes, np.float32)


@dataclass(frozen=True)
class NeoxArgs:
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    intermediate_size: int
    ln_eps: float
    rope: RopeConfig
    parallel_residual: bool = True
    shared_input_ln: bool = False
    gated_mlp: bool = False
    act: str = "gelu"
    norm_type: str = "ln"  # "ln" | "rms"
    ln_bias: bool = True
    qkv_bias: bool = True
    o_bias: bool = True
    mlp_bias: bool = True
    lm_head_bias: bool = False
    qk_norm: bool = False  # cohere-plus style per-head LN
    qk_norm_bias: bool = False  # persimmon: per-head LN carries a bias
    logit_scale: Optional[float] = None
    tie_embeddings: bool = False
    max_position: int = 2048
    alibi: bool = False  # ALiBi position bias instead of rope
    embed_ln: bool = False  # bloom: LayerNorm after the embedding
    clip_qkv: Optional[float] = None  # OLMo: clamp q/k/v to +-clip


class GPTNeoXForCausalLM:
    """Functional model; public surface mirrors LlamaForCausalLM."""

    def __init__(self, model_config: ModelConfig, args=None) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        self.args = args or self.parse_args(hf)
        self.inv_freq, self.rope_mscale = compute_inv_freq(self.args.rope)
        self.dtype = jnp.bfloat16 if model_config.dtype == "bfloat16" \
            else jnp.float32
        self.scale = 1.0 / math.sqrt(self.args.head_dim)
        self.alibi_slopes = None
        if self.args.alibi:
            self.alibi_slopes = jnp.asarray(
                _alibi_slopes(self.args.num_heads), jnp.float32)

    def parse_args(self, hf) -> NeoxArgs:
        head_dim = hf.hidden_size // hf.num_attention_heads
        rope = RopeConfig(
            head_size=head_dim,
            rotary_dim=int(head_dim * float(getattr(hf, "rotary_pct",
                                                    1.0))),
            max_position=getattr(hf, "max_position_embeddings", 2048),
            base=float(getattr(hf, "rotary_emb_base",
                               getattr(hf, "rope_theta", 10000.0))),
            scaling=getattr(hf, "rope_scaling", None),
        )
        return NeoxArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=hf.num_hidden_layers,
            num_heads=hf.num_attention_heads,
            num_kv_heads=hf.num_attention_heads,
            head_dim=head_dim,
            intermediate_size=hf.intermediate_size,
            ln_eps=float(getattr(hf, "layer_norm_eps", 1e-5)),
            rope=rope,
            parallel_residual=bool(
                getattr(hf, "use_parallel_residual", True)),
            act=getattr(hf, "hidden_act", "gelu"),
            tie_embeddings=bool(getattr(hf, "tie_word_embeddings",
                                        False)),
            max_position=getattr(hf, "max_position_embeddings", 2048),
        )

    # ----------------------------------------------------------- forward

    def _norm(self, x, lp, name, li=None):
        w = lp[f"{name}_w"]
        b = lp.get(f"{name}_b")
        if li is not None:
            w = w[li]
            b = b[li] if b is not None else None
        if self.args.norm_type == "rms":
            return rms_norm(x, w, self.args.ln_eps)
        return layer_norm(x, w, b, self.args.ln_eps)

    def forward(self, params, input_ids, kv_caches, metadata, lora=None,
                embed_override=None):
        args = self.args
        x = embedding_lookup(input_ids, params["embed"]["w"])
        if embed_override is not None:
            # multimodal placeholder substitution (same mechanism as
            # llama.py): padding entries index the scratch row T
            idx, vecs = embed_override
            ext = jnp.concatenate([x, jnp.zeros((1, x.shape[1]),
                                                x.dtype)])
            x = ext.at[idx].set(vecs.astype(x.dtype))[:x.shape[0]]
        if args.embed_ln:
            x = layer_norm(x, params["embed_ln_w"],
                           params.get("embed_ln_b"), args.ln_eps)

        kv = kv_caches[0]
        idxs = jnp.arange(args.num_layers, dtype=jnp.int32)
        layers = jax.tree.map(jnp.asarray, params["layers"])

        def body(carry, li):
            h, kv = carry
            h, kv = self._decoder_layer(layers, h, kv, li, metadata)
            return (h, kv), None

        (x, kv), _ = jax.lax.scan(body, (x, kv), idxs)
        x = self._norm(x, params, "final_ln")
        return x, [kv]

    def _decoder_layer(self, lp, x, kv, li, metadata):
        args = self.args
        T = x.shape[0]
        nq, nk, d = args.num_heads, args.num_kv_heads, args.head_dim

        h1 = self._norm(x, lp, "input_ln", li)
        qkv = linear(h1, lp["qkv"], layer=li)
        if args.clip_qkv is not None:
            qkv = jnp.clip(qkv, -args.clip_qkv, args.clip_qkv)
        q, k, v = jnp.split(qkv, [nq * d, (nq + nk) * d], axis=-1)
        q = q.reshape(T, nq, d)
        k = k.reshape(T, nk, d)
        v = v.reshape(T, nk, d)
        if args.qk_norm:
            q = layer_norm(q, lp["q_norm"][li],
                           lp["q_norm_b"][li] if args.qk_norm_bias
                           else None, args.ln_eps)
            k = layer_norm(k, lp["k_norm"][li],
                           lp["k_norm_b"][li] if args.qk_norm_bias
                           else None, args.ln_eps)
        if args.rope.rotary_dim > 0:
            q, k = apply_rope(q, k, metadata.positions, self.inv_freq,
                              args.rope.is_neox_style, self.rope_mscale)
        kv = write_kv_cache(kv, k, v, metadata.slot_mapping, layer=li)
        attn_out = attention(q, kv, metadata, self.scale, layer=li,
                             alibi_slopes=self.alibi_slopes)
        attn_out = linear(attn_out.reshape(T, nq * d), lp["o"], layer=li)

        if args.parallel_residual:
            h2 = h1 if args.shared_input_ln else self._norm(x, lp,
                                                            "post_ln", li)
            x = x + attn_out + self._mlp(lp, h2, li)
        else:
            x = x + attn_out
            x = x + self._mlp(lp, self._norm(x, lp, "post_ln", li), li)
        return x, kv

    def _mlp(self, lp, h, li=None):
        args = self.args
        if args.gated_mlp:
            gate_up = linear(h, lp["gate_up"], layer=li)
            return linear(GATED_ACTIVATIONS[args.act](gate_up),
                          lp["down"], layer=li)
        up = linear(h, lp["up"], layer=li)
        if args.act in ("gelu", "gelu_new", "gelu_pytorch_tanh",
                        "gelu_fast"):
            up = jax.nn.gelu(up.astype(jnp.float32),
                             approximate=args.act != "gelu").astype(
                                 up.dtype)
        elif args.act == "relu":
            up = jax.nn.relu(up)
        elif args.act == "relu2":
            up = jnp.square(jax.nn.relu(up))
        else:
            up = jax.nn.gelu(up.astype(jnp.float32)).astype(up.dtype)
        return linear(up, lp["down"], layer=li)

    def compute_logits(self, params, hidden):
        logits = lm_head_logits(hidden, params["lm_head"])
        if self.args.logit_scale is not None:
            logits = logits * jnp.asarray(self.args.logit_scale,
                                          logits.dtype)
        return logits

    def get_kv_cache_specs(self, block_size: int,
                           cache_dtype: str) -> dict[str, KVCacheSpec]:
        a = self.args
        return {
            f"layers.{i}": FullAttentionSpec(block_size=block_size,
                                             num_kv_heads=a.num_kv_heads,
                                             head_size=a.head_dim,
                                             dtype=cache_dtype)
            for i in range(a.num_layers)
        }

    # ----------------------------------------------------------- weights

    def _alloc(self) -> dict:
        a = self.args
        np_dtype = _np_dtype(self.model_config.dtype)
        L, H, I = a.num_layers, a.hidden_size, a.intermediate_size
        nq, nk, d = a.num_heads, a.num_kv_heads, a.head_dim
        layers: dict[str, Any] = {
            "input_ln_w": np.zeros((L, H), np_dtype),
            "qkv": {"w": np.zeros((L, H, (nq + 2 * nk) * d), np_dtype)},
            "o": {"w": np.zeros((L, nq * d, H), np_dtype)},
        }
        if a.ln_bias:
            layers["input_ln_b"] = np.zeros((L, H), np_dtype)
        if not (a.parallel_residual and a.shared_input_ln):
            layers["post_ln_w"] = np.zeros((L, H), np_dtype)
            if a.ln_bias:
                layers["post_ln_b"] = np.zeros((L, H), np_dtype)
        if a.qkv_bias:
            layers["qkv"]["b"] = np.zeros((L, (nq + 2 * nk) * d), np_dtype)
        if a.o_bias:
            layers["o"]["b"] = np.zeros((L, H), np_dtype)
        if a.qk_norm:
            layers["q_norm"] = np.zeros((L, nq, d), np_dtype)
            layers["k_norm"] = np.zeros((L, nk, d), np_dtype)
            if a.qk_norm_bias:
                layers["q_norm_b"] = np.zeros((L, nq, d), np_dtype)
                layers["k_norm_b"] = np.zeros((L, nk, d), np_dtype)
        if a.gated_mlp:
            layers["gate_up"] = {"w": np.zeros((L, H, 2 * I), np_dtype)}
            layers["down"] = {"w": np.zeros((L, I, H), np_dtype)}
        else:
            layers["up"] = {"w": np.zeros((L, H, I), np_dtype)}
            layers["down"] = {"w": np.zeros((L, I, H), np_dtype)}
            if a.mlp_bias:
                layers["up"]["b"] = np.zeros((L, I), np_dtype)
                layers["down"]["b"] = np.zeros((L, H), np_dtype)
        params: dict[str, Any] = {
            "embed": {"w": np.zeros((a.vocab_size, H), np_dtype)},
            "layers": layers,
            "final_ln_w": np.zeros((H,), np_dtype),
            "lm_head": {"w": np.zeros((H, a.vocab_size), np_dtype)},
        }
        if a.ln_bias:
            params["final_ln_b"] = np.zeros((H,), np_dtype)
        if a.embed_ln:
            params["embed_ln_w"] = np.zeros((H,), np_dtype)
            if a.ln_bias:
                params["embed_ln_b"] = np.zeros((H,), np_dtype)
        if a.lm_head_bias:
            params["lm_head"]["b"] = np.zeros((a.vocab_size,), np_dtype)
        return params

    # name maps: HF suffix -> (key, part, transpose)
    _EMBED = "gpt_neox.embed_in.weight"
    _FINAL_W = "gpt_neox.final_layer_norm.weight"
    _FINAL_B = "gpt_neox.final_layer_norm.bias"
    _LM_HEAD = "embed_out.weight"
    _LM_HEAD_B = None
    _EMBED_LN_W = None
    _EMBED_LN_B = None
    _LAYER_PREFIX = "gpt_neox.layers"

    def _hf_layer_map(self) -> dict[str, tuple[str, str, bool]]:
        return {
            "input_layernorm.weight": ("input_ln_w", "", False),
            "input_layernorm.bias": ("input_ln_b", "", False),
            "post_attention_layernorm.weight": ("post_ln_w", "", False),
            "post_attention_layernorm.bias": ("post_ln_b", "", False),
            "attention.query_key_value.weight": ("qkv.w", "neox_qkv",
                                                 True),
            "attention.query_key_value.bias": ("qkv.b", "neox_qkv",
                                               False),
            "attention.dense.weight": ("o.w", "", True),
            "attention.dense.bias": ("o.b", "", False),
            "mlp.dense_h_to_4h.weight": ("up.w", "", True),
            "mlp.dense_h_to_4h.bias": ("up.b", "", False),
            "mlp.dense_4h_to_h.weight": ("down.w", "", True),
            "mlp.dense_4h_to_h.bias": ("down.b", "", False),
        }

    def _place(self, dest_layers, key: str, part: str, li: int,
               w: np.ndarray, np_dtype) -> None:
        a = self.args
        nq, nk, d = a.num_heads, a.num_kv_heads, a.head_dim
        obj: Any = dest_layers
        *path, leaf = key.split(".")
        for p in path:
            obj = obj[p]
        if part == "neox_qkv":
            # neox fuses qkv interleaved per head: [nq, 3, d, ...]
            if w.ndim == 2:  # transposed weight [H, 3*H]
                wr = w.reshape(w.shape[0], nq, 3, d)
                q = wr[:, :, 0].reshape(w.shape[0], nq * d)
                k = wr[:, :, 1].reshape(w.shape[0], nq * d)
                v = wr[:, :, 2].reshape(w.shape[0], nq * d)
                obj[leaf][li] = np.concatenate([q, k, v],
                                               axis=1).astype(np_dtype)
            else:
                wr = w.reshape(nq, 3, d)
                obj[leaf][li] = np.concatenate(
                    [wr[:, 0].reshape(-1), wr[:, 1].reshape(-1),
                     wr[:, 2].reshape(-1)]).astype(np_dtype)
        elif part in ("q", "k", "v"):
            start = {"q": 0, "k": nq * d, "v": (nq + nk) * d}[part]
            length = nq * d if part == "q" else nk * d
            if w.ndim == 2:
                obj[leaf][li, :, start:start + length] = w.astype(np_dtype)
            else:
                obj[leaf][li, start:start + length] = w.astype(np_dtype)
        elif part in ("gate", "up2"):
            I = a.intermediate_size
            start = 0 if part == "gate" else I
            obj[leaf][li, :, start:start + I] = w.astype(np_dtype)
        else:
            obj[leaf][li] = w.astype(np_dtype)

    def load_weights(self, weights_iter) -> dict:
        np_dtype = _np_dtype(self.model_config.dtype)
        params = self._alloc()
        lmap = self._hf_layer_map()
        prefix = self._LAYER_PREFIX + "."
        seen_lm_head = False
        for name, w in weights_iter:
            w = np.asarray(w)
            if name == self._EMBED:
                params["embed"]["w"][...] = w.astype(np_dtype)
                continue
            if name == self._FINAL_W:
                params["final_ln_w"][...] = w.astype(np_dtype)
                continue
            if name == self._FINAL_B and self.args.ln_bias:
                params["final_ln_b"][...] = w.astype(np_dtype)
                continue
            if name == self._LM_HEAD:
                params["lm_head"]["w"][...] = w.T.astype(np_dtype)
                seen_lm_head = True
                continue
            if self._LM_HEAD_B and name == self._LM_HEAD_B:
                params["lm_head"]["b"][...] = w.astype(np_dtype)
                continue
            if self._EMBED_LN_W and name == self._EMBED_LN_W:
                params["embed_ln_w"][...] = w.astype(np_dtype)
                continue
            if self._EMBED_LN_B and name == self._EMBED_LN_B:
                params["embed_ln_b"][...] = w.astype(np_dtype)
                continue
            if not name.startswith(prefix):
                continue
            layer_str, suffix = name[len(prefix):].split(".", 1)
            entry = lmap.get(suffix)
            if entry is None:
                continue
            key, part, transpose = entry
            if transpose:
                w = w.T
            self._place(params["layers"], key, part, int(layer_str), w,
                        np_dtype)
        if self.args.tie_embeddings and not seen_lm_head:
            params["lm_head"]["w"][...] = params["embed"]["w"].T
        return params

    def init_dummy_params(self, seed: int = 0) -> dict:
        rng = np.random.default_rng(seed)
        params = self._alloc()

        def fill(leaf):
            if leaf.ndim >= 2 and leaf.shape[-1] > 1:
                return (rng.standard_normal(leaf.shape) *
                        0.5 / math.sqrt(leaf.shape[-1])).astype(leaf.dtype)
            return np.ones_like(leaf)

        params = jax.tree.map(fill, params)
        # norm weights should be ~1
        for k in list(params["layers"]):
            if "ln_w" in k or "norm" in k:
                params["layers"][k] = np.ones_like(params["layers"][k])
        params["final_ln_w"] = np.ones_like(params["final_ln_w"])
        return params


class PhiForCausalLM(GPTNeoXForCausalLM):
    """Phi-1.5/2 (reference: models/phi.py): parallel residual sharing
    one input LN, partial rotary, biased dense layers, biased lm_head."""

    _EMBED = "model.embed_tokens.weight"
    _FINAL_W = "model.final_layernorm.weight"
    _FINAL_B = "model.final_layernorm.bias"
    _LM_HEAD = "lm_head.weight"
    _LM_HEAD_B = "lm_head.bias"
    _LAYER_PREFIX = "model.layers"

    def parse_args(self, hf) -> NeoxArgs:
        args = super().parse_args(hf)
        head_dim = hf.hidden_size // hf.num_attention_heads
        rope = replace(args.rope,
                       rotary_dim=int(head_dim *
                                      getattr(hf, "partial_rotary_factor",
                                              0.5)),
                       base=float(getattr(hf, "rope_theta", 10000.0)))
        return replace(args, parallel_residual=True, shared_input_ln=True,
                       rope=rope, act=getattr(hf, "hidden_act",
                                              "gelu_new"),
                       lm_head_bias=True)

    def _hf_layer_map(self):
        return {
            "input_layernorm.weight": ("input_ln_w", "", False),
            "input_layernorm.bias": ("input_ln_b", "", False),
            "self_attn.q_proj.weight": ("qkv.w", "q", True),
            "self_attn.k_proj.weight": ("qkv.w", "k", True),
            "self_attn.v_proj.weight": ("qkv.w", "v", True),
            "self_attn.q_proj.bias": ("qkv.b", "q", False),
            "self_attn.k_proj.bias": ("qkv.b", "k", False),
            "self_attn.v_proj.bias": ("qkv.b", "v", False),
            "self_attn.dense.weight": ("o.w", "", True),
            "self_attn.dense.bias": ("o.b", "", False),
            "mlp.fc1.weight": ("up.w", "", True),
            "mlp.fc1.bias": ("up.b", "", False),
            "mlp.fc2.weight": ("down.w", "", True),
            "mlp.fc2.bias": ("down.b", "", False),
        }


class StableLmForCausalLM(GPTNeoXForCausalLM):
    """StableLM-2 (reference: models/stablelm.py): sequential residual,
    LayerNorm, partial rotary, gated silu MLP, GQA."""

    _EMBED = "model.embed_tokens.weight"
    _FINAL_W = "model.norm.weight"
    _FINAL_B = "model.norm.bias"
    _LM_HEAD = "lm_head.weight"
    _LM_HEAD_B = None
    _LAYER_PREFIX = "model.layers"

    def parse_args(self, hf) -> NeoxArgs:
        head_dim = hf.hidden_size // hf.num_attention_heads
        rope = RopeConfig(
            head_size=head_dim,
            rotary_dim=int(head_dim *
                           getattr(hf, "partial_rotary_factor", 0.25)),
            max_position=getattr(hf, "max_position_embeddings", 2048),
            base=float(getattr(hf, "rope_theta", 10000.0)),
            scaling=getattr(hf, "rope_scaling", None),
        )
        return NeoxArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=hf.num_hidden_layers,
            num_heads=hf.num_attention_heads,
            num_kv_heads=getattr(hf, "num_key_value_heads",
                                 hf.num_attention_heads),
            head_dim=head_dim,
            intermediate_size=hf.intermediate_size,
            ln_eps=float(getattr(hf, "layer_norm_eps", 1e-5)),
            rope=rope,
            parallel_residual=bool(getattr(hf, "use_parallel_residual",
                                           False)),
            gated_mlp=True,
            act=getattr(hf, "hidden_act", "silu"),
            qkv_bias=bool(getattr(hf, "use_qkv_bias", False)),
            o_bias=False,
            mlp_bias=False,
            tie_embeddings=bool(getattr(hf, "tie_word_embeddings",
                                        False)),
            max_position=getattr(hf, "max_position_embeddings", 2048),
        )

    def _hf_layer_map(self):
        return {
            "input_layernorm.weight": ("input_ln_w", "", False),
            "input_layernorm.bias": ("input_ln_b", "", False),
            "post_attention_layernorm.weight": ("post_ln_w", "", False),
            "post_attention_layernorm.bias": ("post_ln_b", "", False),
            "self_attn.q_proj.weight": ("qkv.w", "q", True),
            "self_attn.k_proj.weight": ("qkv.w", "k", True),
            "self_attn.v_proj.weight": ("qkv.w", "v", True),
            "self_attn.q_proj.bias": ("qkv.b", "q", False),
            "self_attn.k_proj.bias": ("qkv.b", "k", False),
            "self_attn.v_proj.bias": ("qkv.b", "v", False),
            "self_attn.o_proj.weight": ("o.w", "", True),
            "mlp.gate_proj.weight": ("gate_up.w", "gate", True),
            "mlp.up_proj.weight": ("gate_up.w", "up2", True),
            "mlp.down_proj.weight": ("down.w", "", True),
        }


class Starcoder2ForCausalLM(StableLmForCausalLM):
    """Starcoder2 (reference: models/starcoder2.py): sequential residual,
    LN + bias everywhere, full rotary, dense gelu MLP (c_fc/c_proj)."""

    def parse_args(self, hf) -> NeoxArgs:
        head_dim = hf.hidden_size // hf.num_attention_heads
        rope = RopeConfig(
            head_size=head_dim, rotary_dim=head_dim,
            max_position=getattr(hf, "max_position_embeddings", 2048),
            base=float(getattr(hf, "rope_theta", 10000.0)),
        )
        use_bias = bool(getattr(hf, "use_bias", True))
        return NeoxArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=hf.num_hidden_layers,
            num_heads=hf.num_attention_heads,
            num_kv_heads=getattr(hf, "num_key_value_heads",
                                 hf.num_attention_heads),
            head_dim=head_dim,
            intermediate_size=hf.intermediate_size,
            ln_eps=float(getattr(hf, "norm_epsilon", 1e-5)),
            rope=rope,
            parallel_residual=False,
            gated_mlp=False,
            act=getattr(hf, "hidden_act", "gelu_pytorch_tanh"),
            qkv_bias=use_bias,
            o_bias=use_bias,
            mlp_bias=use_bias,
            tie_embeddings=bool(getattr(hf, "tie_word_embeddings", True)),
            max_position=getattr(hf, "max_position_embeddings", 2048),
        )

    def _hf_layer_map(self):
        m = super()._hf_layer_map()
        m.pop("mlp.gate_proj.weight")
        m.pop("mlp.up_proj.weight")
        m.pop("mlp.down_proj.weight")
        m.update({
            "self_attn.o_proj.bias": ("o.b", "", False),
            "mlp.c_fc.weight": ("up.w", "", True),
            "mlp.c_fc.bias": ("up.b", "", False),
            "mlp.c_proj.weight": ("down.w", "", True),
            "mlp.c_proj.bias": ("down.b", "", False),
        })
        return m


class CohereForCausalLM(GPTNeoXForCausalLM):
    """Cohere Command-R (reference: models/commandr.py): parallel
    residual with one shared LayerNorm (no bias), gated silu MLP,
    logit_scale, tied embeddings."""

    _EMBED = "model.embed_tokens.weight"
    _FINAL_W = "model.norm.weight"
    _FINAL_B = "__none__"
    _LM_HEAD = "lm_head.weight"
    _LM_HEAD_B = None
    _LAYER_PREFIX = "model.layers"

    def parse_args(self, hf) -> NeoxArgs:
        head_dim = hf.hidden_size // hf.num_attention_heads
        rope = RopeConfig(
            head_size=head_dim, rotary_dim=head_dim,
            max_position=getattr(hf, "max_position_embeddings", 8192),
            base=float(getattr(hf, "rope_theta", 10000.0)),
            is_neox_style=False,  # cohere uses interleaved rotary
        )
        return NeoxArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=hf.num_hidden_layers,
            num_heads=hf.num_attention_heads,
            num_kv_heads=getattr(hf, "num_key_value_heads",
                                 hf.num_attention_heads),
            head_dim=head_dim,
            intermediate_size=hf.intermediate_size,
            ln_eps=float(getattr(hf, "layer_norm_eps", 1e-5)),
            rope=rope,
            parallel_residual=True,
            shared_input_ln=True,
            gated_mlp=True,
            act=getattr(hf, "hidden_act", "silu"),
            ln_bias=False,
            qkv_bias=bool(getattr(hf, "attention_bias", False)),
            o_bias=False,
            mlp_bias=False,
            qk_norm=bool(getattr(hf, "use_qk_norm", False)),
            logit_scale=float(getattr(hf, "logit_scale", 1.0)),
            tie_embeddings=True,
            max_position=getattr(hf, "max_position_embeddings", 8192),
        )

    def _hf_layer_map(self):
        return {
            "input_layernorm.weight": ("input_ln_w", "", False),
            "self_attn.q_proj.weight": ("qkv.w", "q", True),
            "self_attn.k_proj.weight": ("qkv.w", "k", True),
            "self_attn.v_proj.weight": ("qkv.w", "v", True),
            "self_attn.o_proj.weight": ("o.w", "", True),
            "self_attn.q_norm.weight": ("q_norm", "", False),
            "self_attn.k_norm.weight": ("k_norm", "", False),
            "mlp.gate_proj.weight": ("gate_up.w", "gate", True),
            "mlp.up_proj.weight": ("gate_up.w", "up2", True),
            "mlp.down_proj.weight": ("down.w", "", True),
        }


class OrionForCausalLM(StableLmForCausalLM):
    """OrionStar Orion-14B (reference: models/orion.py): the Llama block
    shape — sequential residual, gated silu MLP, GQA, full rotary — but
    every norm is a biased LayerNorm (eps comes from ``rms_norm_eps``
    despite NOT being an RMSNorm) and no linear layer carries a bias."""

    def parse_args(self, hf) -> NeoxArgs:
        head_dim = hf.hidden_size // hf.num_attention_heads
        rope = RopeConfig(
            head_size=head_dim, rotary_dim=head_dim,
            max_position=getattr(hf, "max_position_embeddings", 4096),
            base=float(getattr(hf, "rope_theta", 10000.0)),
            scaling=getattr(hf, "rope_scaling", None),
        )
        return NeoxArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=hf.num_hidden_layers,
            num_heads=hf.num_attention_heads,
            num_kv_heads=getattr(hf, "num_key_value_heads",
                                 hf.num_attention_heads),
            head_dim=head_dim,
            intermediate_size=hf.intermediate_size,
            ln_eps=float(getattr(hf, "rms_norm_eps", 1e-5)),
            rope=rope,
            parallel_residual=False,
            gated_mlp=True,
            act=getattr(hf, "hidden_act", "silu"),
            qkv_bias=False,
            o_bias=False,
            mlp_bias=False,
            tie_embeddings=bool(getattr(hf, "tie_word_embeddings",
                                        False)),
            max_position=getattr(hf, "max_position_embeddings", 4096),
        )


class QWenLMHeadModel(GPTNeoXForCausalLM):
    """Qwen-1 (reference: models/qwen.py): RMSNorm, sequential residual,
    one fused biased ``c_attn`` qkv (MHA), gated silu MLP whose true
    inner width is ``intermediate_size // 2`` with gate=w2 / up=w1, and
    an untied lm_head."""

    _EMBED = "transformer.wte.weight"
    _FINAL_W = "transformer.ln_f.weight"
    _FINAL_B = "__none__"
    _LM_HEAD = "lm_head.weight"
    _LM_HEAD_B = None
    _EMBED_LN_W = None
    _EMBED_LN_B = None
    _LAYER_PREFIX = "transformer.h"

    def parse_args(self, hf) -> NeoxArgs:
        head_dim = hf.hidden_size // hf.num_attention_heads
        rope = RopeConfig(
            head_size=head_dim, rotary_dim=head_dim,
            max_position=getattr(hf, "max_position_embeddings", 8192),
            base=float(getattr(hf, "rotary_emb_base",
                               getattr(hf, "rope_theta", 10000.0))),
        )
        return NeoxArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=hf.num_hidden_layers,
            num_heads=hf.num_attention_heads,
            num_kv_heads=hf.num_attention_heads,
            head_dim=head_dim,
            intermediate_size=hf.intermediate_size // 2,
            ln_eps=float(getattr(hf, "layer_norm_epsilon", 1e-6)),
            rope=rope,
            parallel_residual=False,
            gated_mlp=True,
            act="silu",
            norm_type="rms",
            ln_bias=False,
            qkv_bias=True,
            o_bias=False,
            mlp_bias=False,
            tie_embeddings=bool(getattr(hf, "tie_word_embeddings",
                                        False)),
            max_position=getattr(hf, "max_position_embeddings", 8192),
        )

    def _hf_layer_map(self):
        # qwen-1 checkpoints store w1=up, w2=gate (reference
        # qwen.py:293-294 stacks (gate_up, w2, 0), (gate_up, w1, 1))
        return {
            "ln_1.weight": ("input_ln_w", "", False),
            "ln_2.weight": ("post_ln_w", "", False),
            "attn.c_attn.weight": ("qkv.w", "", True),
            "attn.c_attn.bias": ("qkv.b", "", False),
            "attn.c_proj.weight": ("o.w", "", True),
            "mlp.w2.weight": ("gate_up.w", "gate", True),
            "mlp.w1.weight": ("gate_up.w", "up2", True),
            "mlp.c_proj.weight": ("down.w", "", True),
        }
