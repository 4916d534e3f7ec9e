"""BLIP-2 (reference behavior parity: vllm/model_executor/models/
blip2.py): frozen ViT -> Q-Former with learned query tokens -> linear
projection -> OPT language model, query outputs substituted at the
image-placeholder positions.

Pieces: Blip2 ViT is pre-norm with a FUSED qkv and a final
post_layernorm (no CLIP pre-layrnorm); the Q-Former is a BERT-style
post-norm encoder over the query tokens whose layers cross-attend to
the image features every ``cross_attention_frequency`` layers and use
the query-specific FFN (intermediate_query/output_query)."""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import KVCacheSpec
from vllm_tpu.models.llama import _np_dtype
from vllm_tpu.models.opt import OPTForCausalLM


def _ln(x, w, b, eps=1e-12):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _mha(q_in, kv_in, p, heads: int):
    """Standard softmax MHA: q from q_in, k/v from kv_in."""
    Tq, D = q_in.shape[-2:]
    d = D // heads
    q = (q_in @ p["q"]["w"] + p["q"]["b"]).reshape(-1, Tq, heads, d)
    k = (kv_in @ p["k"]["w"] + p["k"]["b"]).reshape(
        -1, kv_in.shape[-2], heads, d)
    v = (kv_in @ p["v"]["w"] + p["v"]["b"]).reshape(
        -1, kv_in.shape[-2], heads, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d)
    probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(-1, Tq, D)
    return out @ p["o"]["w"] + p["o"]["b"]


class Blip2ForConditionalGeneration:

    def __init__(self, model_config: ModelConfig) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        self.image_token_index = int(
            getattr(hf, "image_token_index", None)
            or getattr(hf, "image_token_id", None) or 50265)
        self.num_query_tokens = int(getattr(hf, "num_query_tokens", 32))
        self.v = hf.vision_config
        self.q = hf.qformer_config
        self.cross_freq = int(getattr(self.q,
                                      "cross_attention_frequency", 2))

        lm_config = ModelConfig(model=model_config.model,
                                dtype=model_config.dtype,
                                hf_config=hf.text_config)
        self.language = OPTForCausalLM(lm_config)
        self.args = self.language.args
        self.dtype = self.language.dtype

    # ---------------------------------------------------------- vision

    def encode_image(self, params: dict,
                     pixel_values: jnp.ndarray) -> jnp.ndarray:
        """[B, C, H, W] -> [B, num_query_tokens, H_text]"""
        return self._encode_qformer(
            params, self._encode_vit(params, pixel_values))

    def _encode_vit(self, params: dict,
                    pixel_values: jnp.ndarray) -> jnp.ndarray:
        v = self.v
        vp = params["vision"]
        B = pixel_values.shape[0]
        P = v.patch_size
        n_side = v.image_size // P
        x = pixel_values.astype(self.dtype).reshape(
            B, 3, n_side, P, n_side, P)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(
            B, n_side * n_side, 3 * P * P)
        x = x @ vp["patch_embed"] + vp["patch_bias"]
        cls = jnp.broadcast_to(vp["cls"][None, None],
                               (B, 1, x.shape[-1])).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + vp["pos"][None, :x.shape[1]].astype(x.dtype)
        for lp in vp["layers"]:
            h = _ln(x, lp["ln1_w"], lp["ln1_b"], v.layer_norm_eps)
            qkv = h @ lp["qkv"]["w"] + lp["qkv"]["b"]
            qq, kk, vv = jnp.split(qkv, 3, axis=-1)
            heads = v.num_attention_heads
            d = qq.shape[-1] // heads
            T = qq.shape[1]
            qh = qq.reshape(B, T, heads, d)
            kh = kk.reshape(B, T, heads, d)
            vh = vv.reshape(B, T, heads, d)
            scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(d)
            probs = jax.nn.softmax(scores.astype(jnp.float32),
                                   -1).astype(x.dtype)
            att = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(
                B, T, -1)
            x = x + (att @ lp["proj"]["w"] + lp["proj"]["b"])
            h = _ln(x, lp["ln2_w"], lp["ln2_b"], v.layer_norm_eps)
            h = jax.nn.gelu((h @ lp["fc1"]["w"] + lp["fc1"]["b"]).astype(
                jnp.float32), approximate=False).astype(x.dtype)
            x = x + (h @ lp["fc2"]["w"] + lp["fc2"]["b"])
        return _ln(x, vp["post_ln_w"], vp["post_ln_b"],
                   v.layer_norm_eps)

    def _encode_qformer(self, params: dict,
                        img: jnp.ndarray) -> jnp.ndarray:
        B = img.shape[0]
        qf = params["qformer"]
        eps = self.q.layer_norm_eps
        heads = self.q.num_attention_heads
        h = jnp.broadcast_to(
            params["query_tokens"][None],
            (B, self.num_query_tokens,
             params["query_tokens"].shape[-1])).astype(self.dtype)
        h = _ln(h, qf["ln_w"], qf["ln_b"], eps)
        for i, lp in enumerate(qf["layers"]):
            att = _mha(h, h, lp["self"], heads)
            h = _ln(h + att, lp["self"]["ln_w"], lp["self"]["ln_b"], eps)
            if i % self.cross_freq == 0:
                att = _mha(h, img, lp["cross"], heads)
                h = _ln(h + att, lp["cross"]["ln_w"],
                        lp["cross"]["ln_b"], eps)
            f = jax.nn.gelu(
                (h @ lp["fc1"]["w"] + lp["fc1"]["b"]).astype(jnp.float32),
                approximate=False).astype(h.dtype)
            f = f @ lp["fc2"]["w"] + lp["fc2"]["b"]
            h = _ln(h + f, lp["ffn_ln_w"], lp["ffn_ln_b"], eps)

        return h @ params["projection"]["w"] + params["projection"]["b"]

    # ------------------------------------------------------------- forward

    def forward(self, params, input_ids, kv_caches, metadata, lora=None,
                embed_override=None):
        return self.language.forward(params["language"], input_ids,
                                     kv_caches, metadata, lora=lora,
                                     embed_override=embed_override)

    def compute_logits(self, params, hidden):
        return self.language.compute_logits(params["language"], hidden)

    def get_kv_cache_specs(self, block_size: int,
                           cache_dtype: str) -> dict[str, KVCacheSpec]:
        return self.language.get_kv_cache_specs(block_size, cache_dtype)

    # ------------------------------------------------------------- weights

    def _alloc(self, npd) -> dict:
        v, q = self.v, self.q
        D, F = v.hidden_size, v.intermediate_size
        QD, QF = q.hidden_size, q.intermediate_size
        n_pos = (v.image_size // v.patch_size) ** 2 + 1

        def dense(i, o):
            return {"w": np.zeros((i, o), npd), "b": np.zeros(o, npd)}

        def vlayer():
            return {
                "ln1_w": np.zeros(D, npd), "ln1_b": np.zeros(D, npd),
                "ln2_w": np.zeros(D, npd), "ln2_b": np.zeros(D, npd),
                "qkv": dense(D, 3 * D), "proj": dense(D, D),
                "fc1": dense(D, F), "fc2": dense(F, D),
            }

        def attn(kv_dim):
            return {"q": dense(QD, QD), "k": dense(kv_dim, QD),
                    "v": dense(kv_dim, QD), "o": dense(QD, QD),
                    "ln_w": np.zeros(QD, npd), "ln_b": np.zeros(QD, npd)}

        def qlayer(i):
            lp = {"self": attn(QD), "fc1": dense(QD, QF),
                  "fc2": dense(QF, QD), "ffn_ln_w": np.zeros(QD, npd),
                  "ffn_ln_b": np.zeros(QD, npd)}
            if i % self.cross_freq == 0:
                enc = int(getattr(q, "encoder_hidden_size", D))
                lp["cross"] = attn(enc)
            return lp

        return {
            "vision": {
                "patch_embed": np.zeros((3 * v.patch_size ** 2, D), npd),
                "patch_bias": np.zeros(D, npd),
                "cls": np.zeros(D, npd),
                "pos": np.zeros((n_pos, D), npd),
                "post_ln_w": np.zeros(D, npd),
                "post_ln_b": np.zeros(D, npd),
                "layers": [vlayer()
                           for _ in range(v.num_hidden_layers)],
            },
            "qformer": {
                "ln_w": np.zeros(QD, npd), "ln_b": np.zeros(QD, npd),
                "layers": [qlayer(i)
                           for i in range(q.num_hidden_layers)],
            },
            "query_tokens": np.zeros((self.num_query_tokens, QD), npd),
            "projection": dense(QD, self.args.hidden_size),
        }

    def load_weights(self, weights_iter) -> dict:
        npd = _np_dtype(self.model_config.dtype)
        top = self._alloc(npd)
        lm_weights = []
        for name, w in weights_iter:
            w = np.asarray(w)
            if name == "query_tokens":
                top["query_tokens"][...] = w.reshape(
                    top["query_tokens"].shape).astype(npd)
            elif name.startswith("language_projection."):
                key = "w" if name.endswith("weight") else "b"
                top["projection"][key][...] = (
                    w.T if key == "w" else w).astype(npd)
            elif name.startswith("language_model."):
                lm_weights.append((name[len("language_model."):], w))
            elif name.startswith("vision_model."):
                self._load_vision(top["vision"], name[13:], w, npd)
            elif name.startswith("qformer."):
                self._load_qformer(top["qformer"], name[8:], w, npd)
        return {"language": self.language.load_weights(iter(lm_weights)),
                **top}

    def _load_vision(self, vp, name, w, npd):
        flat = {
            "embeddings.class_embedding": ("cls", lambda x: x.reshape(-1)),
            "embeddings.position_embedding": ("pos",
                                              lambda x: x.reshape(
                                                  x.shape[-2], -1)),
            "embeddings.patch_embedding.weight": (
                "patch_embed",
                lambda x: x.transpose(2, 3, 1, 0).reshape(
                    -1, x.shape[0])),
            "embeddings.patch_embedding.bias": ("patch_bias",
                                                lambda x: x),
            "post_layernorm.weight": ("post_ln_w", lambda x: x),
            "post_layernorm.bias": ("post_ln_b", lambda x: x),
        }
        if name in flat:
            key, f = flat[name]
            vp[key][...] = f(w).astype(npd)
            return
        if not name.startswith("encoder.layers."):
            return
        parts = name.split(".")
        lp = vp["layers"][int(parts[2])]
        rest = ".".join(parts[3:])
        m = {
            "self_attn.qkv.weight": ("qkv", "w", True),
            "self_attn.qkv.bias": ("qkv", "b", False),
            "self_attn.projection.weight": ("proj", "w", True),
            "self_attn.projection.bias": ("proj", "b", False),
            "layer_norm1.weight": ("ln1_w", None, False),
            "layer_norm1.bias": ("ln1_b", None, False),
            "layer_norm2.weight": ("ln2_w", None, False),
            "layer_norm2.bias": ("ln2_b", None, False),
            "mlp.fc1.weight": ("fc1", "w", True),
            "mlp.fc1.bias": ("fc1", "b", False),
            "mlp.fc2.weight": ("fc2", "w", True),
            "mlp.fc2.bias": ("fc2", "b", False),
        }
        if rest in m:
            key, sub, transpose = m[rest]
            dst = lp[key] if sub is None else lp[key][sub]
            dst[...] = (w.T if transpose else w).astype(npd)

    def _load_qformer(self, qf, name, w, npd):
        if name == "layernorm.weight":
            qf["ln_w"][...] = w.astype(npd)
            return
        if name == "layernorm.bias":
            qf["ln_b"][...] = w.astype(npd)
            return
        if not name.startswith("encoder.layer."):
            return
        parts = name.split(".")
        lp = qf["layers"][int(parts[2])]
        rest = ".".join(parts[3:])

        def put(d, key, transpose):
            d[key][...] = (w.T if transpose else w).astype(npd)

        for block, pre in (("self", "attention."),
                           ("cross", "crossattention.")):
            if block not in lp or not rest.startswith(pre):
                continue
            sub = rest[len(pre):]
            m = {
                "attention.query.weight": ("q", "w", True),
                "attention.query.bias": ("q", "b", False),
                "attention.key.weight": ("k", "w", True),
                "attention.key.bias": ("k", "b", False),
                "attention.value.weight": ("v", "w", True),
                "attention.value.bias": ("v", "b", False),
                "output.dense.weight": ("o", "w", True),
                "output.dense.bias": ("o", "b", False),
            }
            if sub in m:
                key, kk, tr = m[sub]
                put(lp[block][key], kk, tr)
            elif sub == "output.LayerNorm.weight":
                lp[block]["ln_w"][...] = w.astype(npd)
            elif sub == "output.LayerNorm.bias":
                lp[block]["ln_b"][...] = w.astype(npd)
            return
        m2 = {
            "intermediate_query.dense.weight": ("fc1", "w", True),
            "intermediate_query.dense.bias": ("fc1", "b", False),
            "output_query.dense.weight": ("fc2", "w", True),
            "output_query.dense.bias": ("fc2", "b", False),
        }
        if rest in m2:
            key, kk, tr = m2[rest]
            put(lp[key], kk, tr)
        elif rest == "output_query.LayerNorm.weight":
            lp["ffn_ln_w"][...] = w.astype(npd)
        elif rest == "output_query.LayerNorm.bias":
            lp["ffn_ln_b"][...] = w.astype(npd)
