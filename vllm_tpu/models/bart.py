"""BART — encoder-decoder text generation (reference behavior parity:
vllm/model_executor/models/bart.py BartForConditionalGeneration).

Serving shape mirrors Whisper's: the user prompt rides as ENCODER input
(the processor rewrites the request so the decoder prompt is
[decoder_start_token_id]); the encoder runs once per request in the
runner's multimodal hook (encode_text) and its states persist as
per-layer cross-attention K/V in a per-request state slot. Unlike
Whisper the source length varies per request, so cross-attention masks
past each slot's true encoder length (stored alongside the K/V).

Architecture vs Whisper: POST-layernorm blocks, learned positions with
the BART +2 offset, embedding scale + layernorm_embedding, biased k
projections, and a final_logits_bias on the shared-embedding LM head."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import (FullAttentionSpec,
                                              KVCacheSpec, MambaSpec)
from vllm_tpu.models.whisper import _ln
from vllm_tpu.ops.attention import AttentionMetadata, attention, write_kv_cache
from vllm_tpu.ops.linear import embedding_lookup


@dataclass(frozen=True)
class BartArgs:
    vocab_size: int
    d_model: int
    encoder_layers: int
    decoder_layers: int
    encoder_heads: int
    decoder_heads: int
    encoder_ffn: int
    decoder_ffn: int
    max_positions: int
    scale_embedding: bool
    decoder_start_token_id: int

    @property
    def head_dim(self) -> int:
        return self.d_model // self.decoder_heads

    @property
    def hidden_size(self) -> int:
        return self.d_model

    @property
    def max_source_positions(self) -> int:
        return self.max_positions

    @property
    def max_target_positions(self) -> int:
        return self.max_positions

    @staticmethod
    def from_hf_config(hf) -> "BartArgs":
        return BartArgs(
            vocab_size=hf.vocab_size,
            d_model=hf.d_model,
            encoder_layers=hf.encoder_layers,
            decoder_layers=hf.decoder_layers,
            encoder_heads=hf.encoder_attention_heads,
            decoder_heads=hf.decoder_attention_heads,
            encoder_ffn=hf.encoder_ffn_dim,
            decoder_ffn=hf.decoder_ffn_dim,
            max_positions=hf.max_position_embeddings,
            scale_embedding=bool(getattr(hf, "scale_embedding", False)),
            decoder_start_token_id=int(
                getattr(hf, "decoder_start_token_id", 2)),
        )


def _mha_masked(x, lp, n_heads, prefix, n_valid):
    """Bidirectional MHA over [T, H] with key positions >= n_valid
    masked (BART encoder over a padded bucket)."""
    T, H = x.shape
    d = H // n_heads
    scale = 1.0 / math.sqrt(d)
    q = (x @ lp[f"{prefix}.q"]["w"] + lp[f"{prefix}.q"]["b"]) * scale
    k = x @ lp[f"{prefix}.k"]["w"] + lp[f"{prefix}.k"]["b"]
    v = x @ lp[f"{prefix}.v"]["w"] + lp[f"{prefix}.v"]["b"]
    q = q.reshape(T, n_heads, d)
    k = k.reshape(T, n_heads, d)
    v = v.reshape(T, n_heads, d)
    scores = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                        k.astype(jnp.float32))
    mask = (jnp.arange(T) < n_valid)[None, None, :]
    scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("hqk,khd->qhd", probs, v.astype(jnp.float32))
    o = o.reshape(T, H).astype(x.dtype)
    return o @ lp[f"{prefix}.o"]["w"] + lp[f"{prefix}.o"]["b"]


class BartForConditionalGeneration:
    """Decoder serves; the encoder runs in the runner's hook."""

    is_ssm = True  # per-request cross-KV (+length) state slots
    uses_cross_embed = True
    is_encoder_decoder_text = True

    def __init__(self, model_config: ModelConfig,
                 args: Optional[BartArgs] = None) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        self.args = args or BartArgs.from_hf_config(hf)
        self.dtype = jnp.bfloat16 if model_config.dtype == "bfloat16" \
            else jnp.float32
        self.scale = 1.0 / math.sqrt(self.args.head_dim)
        self.embed_scale = (math.sqrt(self.args.d_model)
                            if self.args.scale_embedding else 1.0)

    # --------------------------------------------------------- encoder

    def encode_text(self, params: dict, input_ids: jnp.ndarray,
                    n_valid) -> jnp.ndarray:
        """[T_pad] token ids (+ true length) -> [T_pad, d] encoder
        states (the runner slices to n_valid rows)."""
        a = self.args
        ep = params["encoder"]
        T = input_ids.shape[0]
        x = embedding_lookup(input_ids, params["embed"]["w"]) \
            * jnp.asarray(self.embed_scale, self.dtype)
        pos = jnp.clip(jnp.arange(T), 0, a.max_positions - 1)
        x = x + ep["pos"][pos + 2].astype(x.dtype)  # BART +2 offset
        x = _ln(x, ep["emb_ln_w"], ep["emb_ln_b"])
        for li in range(a.encoder_layers):
            lp = ep["layers"][li]
            h = _mha_masked(x, lp, a.encoder_heads, "attn", n_valid)
            x = _ln(x + h, lp["ln1_w"], lp["ln1_b"])  # post-LN
            h = jax.nn.gelu((x @ lp["fc1"]["w"] + lp["fc1"]["b"]).astype(
                jnp.float32), approximate=False).astype(x.dtype)
            h = h @ lp["fc2"]["w"] + lp["fc2"]["b"]
            x = _ln(x + h, lp["ln2_w"], lp["ln2_b"])
        return x

    # ---------------------------------------------------------- states

    def init_states(self, num_slots: int):
        a = self.args
        cross_kv = jnp.zeros((a.decoder_layers, num_slots + 1,
                              a.max_positions, 2 * a.decoder_heads,
                              a.head_dim), self.dtype)
        cross_len = jnp.zeros((num_slots + 1,), jnp.int32)
        return (cross_kv, cross_len)

    def get_kv_cache_specs(self, block_size: int,
                           cache_dtype: str) -> dict[str, KVCacheSpec]:
        a = self.args
        el = 2 if self.dtype == jnp.bfloat16 else 4
        cross_bytes = (a.max_positions * 2 * a.decoder_heads *
                       a.head_dim * el)
        specs: dict[str, KVCacheSpec] = {
            f"layers.{i}": FullAttentionSpec(
                block_size=block_size, num_kv_heads=a.decoder_heads,
                head_size=a.head_dim, dtype=cache_dtype)
            for i in range(a.decoder_layers)
        }
        specs["cross_kv"] = MambaSpec(block_size=block_size,
                                      state_size_bytes=cross_bytes + 4)
        return specs

    # --------------------------------------------------------- forward

    def embed(self, params: dict, input_ids: jnp.ndarray) -> jnp.ndarray:
        return embedding_lookup(input_ids, params["embed"]["w"])

    def forward(self, params: dict, input_ids: jnp.ndarray, kv_caches,
                metadata: AttentionMetadata, lora=None,
                embed_override=None, cross_embed=None):
        a = self.args
        T = input_ids.shape[0]
        ssm_gi = next(i for i, c in enumerate(kv_caches)
                      if isinstance(c, tuple))
        attn_gi = next(i for i, c in enumerate(kv_caches)
                       if not isinstance(c, tuple))
        cross_kv, cross_len = kv_caches[ssm_gi]
        self_kv = kv_caches[attn_gi]
        num_slots = cross_kv.shape[1] - 1

        if cross_embed is not None:
            slots, embeds, lens = cross_embed
            embeds = embeds.astype(self.dtype)
            safe = jnp.minimum(slots, num_slots)
            cross_len = cross_len.at[safe].set(lens)
            for li in range(a.decoder_layers):
                lp = params["dec_layers"][li]
                k = embeds @ lp["xattn.k"]["w"] + lp["xattn.k"]["b"]
                v = embeds @ lp["xattn.v"]["w"] + lp["xattn.v"]["b"]
                B = embeds.shape[0]
                kv = jnp.concatenate([
                    k.reshape(B, -1, a.decoder_heads, a.head_dim),
                    v.reshape(B, -1, a.decoder_heads, a.head_dim)
                ], axis=2)
                cross_kv = cross_kv.at[li, safe].set(kv.astype(
                    cross_kv.dtype))

        R = metadata.seq_lens.shape[0]
        token_ids = jnp.arange(T, dtype=jnp.int32)
        token_req = jnp.clip(
            jnp.searchsorted(metadata.query_start_loc, token_ids,
                             side="right") - 1, 0, R - 1)
        token_slot = (metadata.state_slots[token_req]
                      if metadata.state_slots is not None else token_req)
        token_slot = jnp.minimum(token_slot, num_slots)

        dp = params["decoder"]
        x = self.embed(params, input_ids) \
            * jnp.asarray(self.embed_scale, self.dtype)
        pos = jnp.clip(metadata.positions, 0, a.max_positions - 1)
        x = x + dp["pos"][pos + 2].astype(x.dtype)
        x = _ln(x, dp["emb_ln_w"], dp["emb_ln_b"])

        nq = a.decoder_heads
        d = a.head_dim
        tok_len = cross_len[token_slot]  # [T]
        src = jnp.arange(a.max_positions)
        xmask = src[None, :] < tok_len[:, None]  # [T, T_src]
        for li in range(a.decoder_layers):
            lp = params["dec_layers"][li]
            # self attention (paged, causal), post-LN
            q = (x @ lp["attn.q"]["w"] + lp["attn.q"]["b"]).reshape(
                T, nq, d)
            k = (x @ lp["attn.k"]["w"] + lp["attn.k"]["b"]).reshape(
                T, nq, d)
            v = (x @ lp["attn.v"]["w"] + lp["attn.v"]["b"]).reshape(
                T, nq, d)
            self_kv = write_kv_cache(self_kv, k, v, metadata.slot_mapping,
                                     layer=li)
            o = attention(q, self_kv, metadata, self.scale, layer=li)
            o = o.reshape(T, nq * d) @ lp["attn.o"]["w"] \
                + lp["attn.o"]["b"]
            x = _ln(x + o, lp["ln1_w"], lp["ln1_b"])

            # cross attention, masked to each request's source length
            q = (x @ lp["xattn.q"]["w"] + lp["xattn.q"]["b"]).reshape(
                T, nq, d)
            ckv = cross_kv[li][token_slot]  # [T, T_src, 2nq, d]
            ck = ckv[:, :, :nq, :]
            cv = ckv[:, :, nq:, :]
            scores = jnp.einsum(
                "thd,tshd->ths", q.astype(jnp.float32) * self.scale,
                ck.astype(jnp.float32))
            scores = jnp.where(xmask[:, None, :], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("ths,tshd->thd", probs,
                           cv.astype(jnp.float32)).astype(x.dtype)
            o = o.reshape(T, nq * d) @ lp["xattn.o"]["w"] \
                + lp["xattn.o"]["b"]
            x = _ln(x + o, lp["lnx_w"], lp["lnx_b"])

            # ffn, post-LN
            h = jax.nn.gelu((x @ lp["fc1"]["w"] + lp["fc1"]["b"]).astype(
                jnp.float32), approximate=False).astype(x.dtype)
            h = h @ lp["fc2"]["w"] + lp["fc2"]["b"]
            x = _ln(x + h, lp["ln2_w"], lp["ln2_b"])

        new_caches = [None] * len(kv_caches)
        new_caches[ssm_gi] = (cross_kv, cross_len)
        new_caches[attn_gi] = self_kv
        return x, new_caches

    def compute_logits(self, params: dict,
                       hidden: jnp.ndarray) -> jnp.ndarray:
        logits = jnp.dot(hidden, params["embed"]["w"].T.astype(
            hidden.dtype))
        return logits + params["final_logits_bias"].astype(logits.dtype)

    # --------------------------------------------------------- weights

    def _alloc(self, npd):
        a = self.args

        def attn_block(ffn, prefix_cross=False):
            D = a.d_model
            blk = {
                "ln1_w": np.zeros(D, npd), "ln1_b": np.zeros(D, npd),
                "ln2_w": np.zeros(D, npd), "ln2_b": np.zeros(D, npd),
                "attn.q": {"w": np.zeros((D, D), npd),
                           "b": np.zeros(D, npd)},
                "attn.k": {"w": np.zeros((D, D), npd),
                           "b": np.zeros(D, npd)},
                "attn.v": {"w": np.zeros((D, D), npd),
                           "b": np.zeros(D, npd)},
                "attn.o": {"w": np.zeros((D, D), npd),
                           "b": np.zeros(D, npd)},
                "fc1": {"w": np.zeros((D, ffn), npd),
                        "b": np.zeros(ffn, npd)},
                "fc2": {"w": np.zeros((ffn, D), npd),
                        "b": np.zeros(D, npd)},
            }
            if prefix_cross:
                blk.update({
                    "lnx_w": np.zeros(D, npd),
                    "lnx_b": np.zeros(D, npd),
                    "xattn.q": {"w": np.zeros((D, D), npd),
                                "b": np.zeros(D, npd)},
                    "xattn.k": {"w": np.zeros((D, D), npd),
                                "b": np.zeros(D, npd)},
                    "xattn.v": {"w": np.zeros((D, D), npd),
                                "b": np.zeros(D, npd)},
                    "xattn.o": {"w": np.zeros((D, D), npd),
                                "b": np.zeros(D, npd)},
                })
            return blk

        D = a.d_model
        return {
            "embed": {"w": np.zeros((a.vocab_size, D), npd)},
            "final_logits_bias": np.zeros(a.vocab_size, npd),
            "encoder": {
                "pos": np.zeros((a.max_positions + 2, D), npd),
                "emb_ln_w": np.zeros(D, npd),
                "emb_ln_b": np.zeros(D, npd),
                "layers": [attn_block(a.encoder_ffn)
                           for _ in range(a.encoder_layers)],
            },
            "decoder": {
                "pos": np.zeros((a.max_positions + 2, D), npd),
                "emb_ln_w": np.zeros(D, npd),
                "emb_ln_b": np.zeros(D, npd),
            },
            "dec_layers": [attn_block(a.decoder_ffn, prefix_cross=True)
                           for _ in range(a.decoder_layers)],
        }

    def load_weights(self, weights_iter) -> dict:
        npd = np.float32 if self.dtype == jnp.float32 else np.dtype(
            "bfloat16")
        p = self._alloc(npd)
        attn_map = {
            "self_attn.q_proj": "attn.q", "self_attn.k_proj": "attn.k",
            "self_attn.v_proj": "attn.v", "self_attn.out_proj": "attn.o",
            "encoder_attn.q_proj": "xattn.q",
            "encoder_attn.k_proj": "xattn.k",
            "encoder_attn.v_proj": "xattn.v",
            "encoder_attn.out_proj": "xattn.o",
        }
        flat_map = {
            "self_attn_layer_norm.weight": "ln1_w",
            "self_attn_layer_norm.bias": "ln1_b",
            "final_layer_norm.weight": "ln2_w",
            "final_layer_norm.bias": "ln2_b",
            "encoder_attn_layer_norm.weight": "lnx_w",
            "encoder_attn_layer_norm.bias": "lnx_b",
        }
        for name, w in weights_iter:
            w = np.asarray(w)
            name = name.removeprefix("model.")
            if name in ("shared.weight", "encoder.embed_tokens.weight",
                        "decoder.embed_tokens.weight"):
                p["embed"]["w"][...] = w.astype(npd)
            elif name == "final_logits_bias":
                p["final_logits_bias"][...] = w.reshape(-1).astype(npd)
            elif name == "encoder.embed_positions.weight":
                p["encoder"]["pos"][...] = w.astype(npd)
            elif name == "decoder.embed_positions.weight":
                p["decoder"]["pos"][...] = w.astype(npd)
            elif name == "encoder.layernorm_embedding.weight":
                p["encoder"]["emb_ln_w"][...] = w.astype(npd)
            elif name == "encoder.layernorm_embedding.bias":
                p["encoder"]["emb_ln_b"][...] = w.astype(npd)
            elif name == "decoder.layernorm_embedding.weight":
                p["decoder"]["emb_ln_w"][...] = w.astype(npd)
            elif name == "decoder.layernorm_embedding.bias":
                p["decoder"]["emb_ln_b"][...] = w.astype(npd)
            elif name.startswith(("encoder.layers.", "decoder.layers.")):
                is_enc = name.startswith("encoder.")
                parts = name.split(".")
                li = int(parts[2])
                sub = ".".join(parts[3:])
                blk = (p["encoder"]["layers"][li] if is_enc
                       else p["dec_layers"][li])
                if sub in flat_map:
                    blk[flat_map[sub]][...] = w.astype(npd)
                    continue
                for pre, key in attn_map.items():
                    if sub == f"{pre}.weight":
                        blk[key]["w"][...] = w.T.astype(npd)
                        break
                    if sub == f"{pre}.bias":
                        blk[key]["b"][...] = w.astype(npd)
                        break
                else:
                    if sub == "fc1.weight":
                        blk["fc1"]["w"][...] = w.T.astype(npd)
                    elif sub == "fc1.bias":
                        blk["fc1"]["b"][...] = w.astype(npd)
                    elif sub == "fc2.weight":
                        blk["fc2"]["w"][...] = w.T.astype(npd)
                    elif sub == "fc2.bias":
                        blk["fc2"]["b"][...] = w.astype(npd)
        return p

    def init_dummy_params(self, seed: int = 0) -> dict:
        rng = np.random.default_rng(seed)
        p = self._alloc(np.float32)

        def fill(leaf):
            if getattr(leaf, "ndim", 0) >= 2:
                return (rng.standard_normal(leaf.shape) * 0.4 /
                        np.sqrt(leaf.shape[-1])).astype(np.float32)
            return leaf

        p = jax.tree.map(fill, p)

        def ones_ln(d):
            for k in list(d):
                if k.startswith(("ln", "emb_ln")) and k.endswith("_w"):
                    d[k] = np.ones_like(d[k])

        for blk in p["encoder"]["layers"] + p["dec_layers"]:
            ones_ln(blk)
        ones_ln(p["encoder"])
        ones_ln(p["decoder"])
        return p
