"""Whisper encoder-decoder ASR model, TPU-native (reference:
vllm/model_executor/models/whisper.py — audio encoder + causal decoder
with cross-attention; re-designed for this engine's state-slot runner).

Serving shape:
- the mel spectrogram rides the multimodal path (mm_inputs
  {"input_features": [80, 3000]}); the runner's encoder hook calls
  ``encode_audio`` once per distinct audio (content-hash cached),
- decoder self-attention uses the regular paged KV cache,
- cross-attention K/V are computed ONCE per request when its first
  prefill step runs (``cross_embed`` step input) and persist in a
  constant-size per-request state buffer — the state-slot mechanism the
  Mamba models use (reference analog: the cross-attn KV cache of
  vllm's EncoderDecoder path).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import (FullAttentionSpec,
                                              KVCacheSpec, MambaSpec)
from vllm_tpu.ops.attention import (AttentionMetadata, attention,
                                    write_kv_cache)
from vllm_tpu.ops.linear import embedding_lookup


@dataclass(frozen=True)
class WhisperArgs:
    vocab_size: int
    d_model: int
    encoder_layers: int
    decoder_layers: int
    encoder_heads: int
    decoder_heads: int
    num_mel_bins: int
    max_source_positions: int  # encoder positions (1500)
    max_target_positions: int
    ffn_dim_enc: int
    ffn_dim_dec: int

    @property
    def head_dim(self) -> int:
        return self.d_model // self.decoder_heads

    @staticmethod
    def from_hf_config(hf) -> "WhisperArgs":
        return WhisperArgs(
            vocab_size=hf.vocab_size,
            d_model=hf.d_model,
            encoder_layers=hf.encoder_layers,
            decoder_layers=hf.decoder_layers,
            encoder_heads=hf.encoder_attention_heads,
            decoder_heads=hf.decoder_attention_heads,
            num_mel_bins=hf.num_mel_bins,
            max_source_positions=hf.max_source_positions,
            max_target_positions=hf.max_target_positions,
            ffn_dim_enc=hf.encoder_ffn_dim,
            ffn_dim_dec=hf.decoder_ffn_dim,
        )


def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _mha_full(x, lp, n_heads, prefix):
    """Bidirectional MHA over one sequence [T, H] (encoder)."""
    T, H = x.shape
    d = H // n_heads
    scale = 1.0 / math.sqrt(d)
    q = (x @ lp[f"{prefix}.q"]["w"] + lp[f"{prefix}.q"]["b"]) * scale
    k = x @ lp[f"{prefix}.k"]["w"]
    v = x @ lp[f"{prefix}.v"]["w"] + lp[f"{prefix}.v"]["b"]
    q = q.reshape(T, n_heads, d)
    k = k.reshape(T, n_heads, d)
    v = v.reshape(T, n_heads, d)
    scores = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                        k.astype(jnp.float32))
    probs = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("hqk,khd->qhd", probs, v.astype(jnp.float32))
    o = o.reshape(T, H).astype(x.dtype)
    return o @ lp[f"{prefix}.o"]["w"] + lp[f"{prefix}.o"]["b"]


class WhisperForConditionalGeneration:
    """Audio -> text. The decoder is the serving model; the encoder runs
    in the runner's multimodal hook."""

    is_ssm = True  # per-request cross-KV state slots
    uses_cross_embed = True

    def __init__(self, model_config: ModelConfig,
                 args: Optional[WhisperArgs] = None) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        self.args = args or WhisperArgs.from_hf_config(hf)
        self.dtype = jnp.bfloat16 if model_config.dtype == "bfloat16" \
            else jnp.float32
        self.scale = 1.0 / math.sqrt(self.args.head_dim)

    # --------------------------------------------------------- audio enc

    def encode_audio(self, params: dict,
                     input_features: jnp.ndarray) -> jnp.ndarray:
        """[num_mel, 3000] (or batched [1, num_mel, 3000]) ->
        [max_source_positions, d_model] encoder states."""
        a = self.args
        ep = params["encoder"]
        x = input_features
        if x.ndim == 3:
            x = x[0]
        x = x.astype(self.dtype)  # [mel, T0]

        # conv1 k=3 s=1 pad=1; conv2 k=3 s=2 pad=1 (as matmuls over
        # unrolled taps — tiny kernels fuse fine on the MXU)
        def conv(xin, w, b, stride):
            # xin [C_in, T], w [C_out, C_in, 3]
            C_in, T0 = xin.shape
            xpad = jnp.pad(xin, ((0, 0), (1, 1)))
            cols = T0 // stride
            idx = jnp.arange(cols) * stride
            taps = [xpad[:, idx + t] for t in range(3)]  # [C_in, cols] x3
            stack = jnp.concatenate(taps, axis=0)  # [3*C_in, cols]
            wf = w.transpose(2, 1, 0).reshape(3 * C_in, -1)  # [3C_in, C_out]
            return (stack.T @ wf + b.ravel()).T  # [C_out, cols]

        x = jax.nn.gelu(conv(x, ep["conv1_w"], ep["conv1_b"], 1),
                        approximate=False)
        x = jax.nn.gelu(conv(x, ep["conv2_w"], ep["conv2_b"], 2),
                        approximate=False)
        x = x.T  # [T_src, H]
        x = x + ep["pos"][:x.shape[0]].astype(x.dtype)

        for li in range(a.encoder_layers):
            lp = ep["layers"][li]
            h = _ln(x, lp["ln1_w"], lp["ln1_b"])
            x = x + _mha_full(h, lp, a.encoder_heads, "attn")
            h = _ln(x, lp["ln2_w"], lp["ln2_b"])
            h = jax.nn.gelu((h @ lp["fc1"]["w"] + lp["fc1"]["b"]).astype(
                jnp.float32), approximate=False).astype(x.dtype)
            x = x + (h @ lp["fc2"]["w"] + lp["fc2"]["b"])
        return _ln(x, ep["ln_post_w"], ep["ln_post_b"])

    # --------------------------------------------------------- states

    def init_states(self, num_slots: int):
        a = self.args
        # cross-attn K/V per decoder layer, one slot per request (+1
        # scratch): [L, slots+1, T_src, 2*heads, d]
        return (jnp.zeros((a.decoder_layers, num_slots + 1,
                           a.max_source_positions, 2 * a.decoder_heads,
                           a.head_dim), self.dtype),)

    def get_kv_cache_specs(self, block_size: int,
                           cache_dtype: str) -> dict[str, KVCacheSpec]:
        a = self.args
        el = 2 if self.dtype == jnp.bfloat16 else 4
        cross_bytes = (a.max_source_positions * 2 * a.decoder_heads *
                       a.head_dim * el)
        specs: dict[str, KVCacheSpec] = {
            f"layers.{i}": FullAttentionSpec(
                block_size=block_size, num_kv_heads=a.decoder_heads,
                head_size=a.head_dim, dtype=cache_dtype)
            for i in range(a.decoder_layers)
        }
        specs["cross_kv"] = MambaSpec(block_size=block_size,
                                      state_size_bytes=cross_bytes)
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
        (cross_kv,) = kv_caches[ssm_gi]
        self_kv = kv_caches[attn_gi]
        num_slots = cross_kv.shape[1] - 1

        if cross_embed is not None:
            # new audio requests this step: project encoder states to
            # per-layer cross K/V and persist at the request's slot
            slots, embeds = cross_embed[0], cross_embed[1]  # lens unused
            # (whisper's source length is fixed at max_source_positions)
            embeds = embeds.astype(self.dtype)
            safe = jnp.minimum(slots, num_slots)
            for li in range(a.decoder_layers):
                lp = params["layers"][li]
                k = embeds @ lp["xattn.k"]["w"]
                v = embeds @ lp["xattn.v"]["w"] + lp["xattn.v"]["b"]
                B = embeds.shape[0]
                kv = jnp.concatenate([
                    k.reshape(B, -1, a.decoder_heads, a.head_dim),
                    v.reshape(B, -1, a.decoder_heads, a.head_dim)
                ], axis=2)
                cross_kv = cross_kv.at[li, safe].set(kv.astype(
                    cross_kv.dtype))

        # token -> request row (for gathering each token's cross KV)
        R = metadata.seq_lens.shape[0]
        token_ids = jnp.arange(T, dtype=jnp.int32)
        token_req = jnp.clip(
            jnp.searchsorted(metadata.query_start_loc, token_ids,
                             side="right") - 1, 0, R - 1)
        token_slot = (metadata.state_slots[token_req]
                      if metadata.state_slots is not None else token_req)
        token_slot = jnp.minimum(token_slot, num_slots)

        x = self.embed(params, input_ids)
        x = x + params["dec_pos"][jnp.clip(
            metadata.positions, 0,
            a.max_target_positions - 1)].astype(x.dtype)

        nq = a.decoder_heads
        d = a.head_dim
        for li in range(a.decoder_layers):
            lp = params["layers"][li]
            # self attention (paged, causal)
            h = _ln(x, lp["ln1_w"], lp["ln1_b"])
            q = (h @ lp["attn.q"]["w"] + lp["attn.q"]["b"]).reshape(
                T, nq, d)
            k = (h @ lp["attn.k"]["w"]).reshape(T, nq, d)
            v = (h @ lp["attn.v"]["w"] + lp["attn.v"]["b"]).reshape(
                T, nq, d)
            self_kv = write_kv_cache(self_kv, k, v, metadata.slot_mapping,
                                     layer=li)
            o = attention(q, self_kv, metadata, self.scale, layer=li)
            x = x + (o.reshape(T, nq * d) @ lp["attn.o"]["w"] +
                     lp["attn.o"]["b"])

            # cross attention over the request's stored audio K/V
            h = _ln(x, lp["lnx_w"], lp["lnx_b"])
            q = (h @ lp["xattn.q"]["w"] + lp["xattn.q"]["b"]).reshape(
                T, nq, d)
            ckv = cross_kv[li][token_slot]  # [T, T_src, 2nq, d]
            ck = ckv[:, :, :nq, :]
            cv = ckv[:, :, nq:, :]
            scores = jnp.einsum(
                "thd,tshd->ths", q.astype(jnp.float32) * self.scale,
                ck.astype(jnp.float32))
            probs = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("ths,tshd->thd", probs,
                           cv.astype(jnp.float32)).astype(x.dtype)
            x = x + (o.reshape(T, nq * d) @ lp["xattn.o"]["w"] +
                     lp["xattn.o"]["b"])

            # ffn
            h = _ln(x, lp["ln2_w"], lp["ln2_b"])
            h = jax.nn.gelu((h @ lp["fc1"]["w"] + lp["fc1"]["b"]).astype(
                jnp.float32), approximate=False).astype(x.dtype)
            x = x + (h @ lp["fc2"]["w"] + lp["fc2"]["b"])

        x = _ln(x, params["ln_f_w"], params["ln_f_b"])
        new_caches = [None] * len(kv_caches)
        new_caches[ssm_gi] = (cross_kv,)
        new_caches[attn_gi] = self_kv
        return x, new_caches

    def compute_logits(self, params: dict,
                       hidden: jnp.ndarray) -> jnp.ndarray:
        return jnp.dot(hidden, params["embed"]["w"].T.astype(hidden.dtype))

    # --------------------------------------------------------- weights

    def load_weights(self, weights_iter) -> dict:
        a = self.args
        npd = np.float32 if self.dtype == jnp.float32 else np.dtype(
            "bfloat16")
        enc_layers = [{} for _ in range(a.encoder_layers)]
        dec_layers = [{} for _ in range(a.decoder_layers)]
        params: dict = {
            "encoder": {"layers": enc_layers},
            "layers": dec_layers,
        }

        def put_attn(lp, key, kind, w):
            # kind in q/k/v/o; weights transposed to [in, out]
            ent = lp.setdefault(key + "." + kind, {})
            if w.ndim == 2:
                ent["w"] = w.T.astype(npd)
            else:
                ent["b"] = w.astype(npd)

        for name, w in weights_iter:
            w = np.asarray(w)
            parts = name.split(".")
            if name.startswith("model.encoder."):
                sub = parts[2]
                ep = params["encoder"]
                if sub == "conv1":
                    ep["conv1_w" if parts[3] == "weight" else
                       "conv1_b"] = (w.astype(npd) if w.ndim == 3 else
                                     w[:, None].astype(npd))
                elif sub == "conv2":
                    ep["conv2_w" if parts[3] == "weight" else
                       "conv2_b"] = (w.astype(npd) if w.ndim == 3 else
                                     w[:, None].astype(npd))
                elif sub == "embed_positions":
                    ep["pos"] = w.astype(np.float32)
                elif sub == "layer_norm":
                    ep["ln_post_w" if parts[3] == "weight" else
                       "ln_post_b"] = w.astype(np.float32)
                elif sub == "layers":
                    li = int(parts[3])
                    lp = enc_layers[li]
                    rest = ".".join(parts[4:])
                    if rest.startswith("self_attn_layer_norm"):
                        lp["ln1_w" if rest.endswith("weight") else
                           "ln1_b"] = w.astype(np.float32)
                    elif rest.startswith("final_layer_norm"):
                        lp["ln2_w" if rest.endswith("weight") else
                           "ln2_b"] = w.astype(np.float32)
                    elif rest.startswith("self_attn."):
                        kind = parts[5].split("_")[0][0]  # q/k/v/o(ut)
                        kind = "o" if parts[5] == "out_proj" else kind
                        put_attn(lp, "attn", kind, w)
                    elif rest.startswith("fc1"):
                        ent = lp.setdefault("fc1", {})
                        ent["w" if w.ndim == 2 else "b"] = \
                            (w.T if w.ndim == 2 else w).astype(npd)
                    elif rest.startswith("fc2"):
                        ent = lp.setdefault("fc2", {})
                        ent["w" if w.ndim == 2 else "b"] = \
                            (w.T if w.ndim == 2 else w).astype(npd)
            elif name.startswith("model.decoder."):
                sub = parts[2]
                if sub == "embed_tokens":
                    params["embed"] = {"w": w.astype(npd)}
                elif sub == "embed_positions":
                    params["dec_pos"] = w.astype(np.float32)
                elif sub == "layer_norm":
                    params["ln_f_w" if parts[3] == "weight" else
                           "ln_f_b"] = w.astype(np.float32)
                elif sub == "layers":
                    li = int(parts[3])
                    lp = dec_layers[li]
                    rest = ".".join(parts[4:])
                    if rest.startswith("self_attn_layer_norm"):
                        lp["ln1_w" if rest.endswith("weight") else
                           "ln1_b"] = w.astype(np.float32)
                    elif rest.startswith("encoder_attn_layer_norm"):
                        lp["lnx_w" if rest.endswith("weight") else
                           "lnx_b"] = w.astype(np.float32)
                    elif rest.startswith("final_layer_norm"):
                        lp["ln2_w" if rest.endswith("weight") else
                           "ln2_b"] = w.astype(np.float32)
                    elif rest.startswith("self_attn."):
                        kind = "o" if parts[5] == "out_proj" else \
                            parts[5][0]
                        put_attn(lp, "attn", kind, w)
                    elif rest.startswith("encoder_attn."):
                        kind = "o" if parts[5] == "out_proj" else \
                            parts[5][0]
                        put_attn(lp, "xattn", kind, w)
                    elif rest.startswith("fc1"):
                        ent = lp.setdefault("fc1", {})
                        ent["w" if w.ndim == 2 else "b"] = \
                            (w.T if w.ndim == 2 else w).astype(npd)
                    elif rest.startswith("fc2"):
                        ent = lp.setdefault("fc2", {})
                        ent["w" if w.ndim == 2 else "b"] = \
                            (w.T if w.ndim == 2 else w).astype(npd)
        # conv biases came in as [C]; keep [C, 1] for broadcasting over T
        for key in ("conv1_b", "conv2_b"):
            b = params["encoder"].get(key)
            if b is not None and b.ndim == 1:
                params["encoder"][key] = b[:, None]
        return params
