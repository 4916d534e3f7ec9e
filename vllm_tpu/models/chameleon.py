"""Chameleon — Meta's early-fusion token-based VLM (reference behavior
parity: vllm/model_executor/models/chameleon.py).

Text: llama skeleton with PER-HEAD biased LayerNorm on q/k before rope
(modeling_chameleon.py:187 ChameleonLayerNorm — stats over head_dim,
per-head gamma/beta) and, for the 30B layout (``swin_norm``), the
norms applied to the sublayer OUTPUTS (x += ln(attn(x))). Images enter
as VQ-VAE codebook tokens: the in-model VQ encoder (conv/GroupNorm
resnet + mid attention) quantizes pixels to codebook ids, the
``vocabulary_map`` translates them to BPE token ids, and their
embedding rows substitute at the <image> placeholder positions — the
same early-fusion path the reference runs (chameleon.py
ChameleonVQVAE + get_image_tokens)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.models.llama import (LlamaForCausalLM, ModelArgs,
                                   _np_dtype, dataclass_replace)
from vllm_tpu.ops.activation import GATED_ACTIVATIONS
from vllm_tpu.ops.layernorm import rms_norm
from vllm_tpu.ops.linear import linear


def _head_ln(x, w, b, eps=1e-5):
    """[T, H, d] per-head LayerNorm: stats over d, per-head affine."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w[None] +
            b[None]).astype(x.dtype)


class ChameleonForCausalLM(LlamaForCausalLM):
    """Text path (arch name used by some checkpoints)."""

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        self.swin_norm = bool(getattr(hf, "swin_norm", False))
        self.ln_eps = 1e-5  # torch LayerNorm default (ChameleonLayerNorm)
        return dataclass_replace(args, qk_norm=True)

    # per-head biased LayerNorm instead of RMSNorm
    def _qk_norm(self, lp: dict, li, q, k):
        return (_head_ln(q, lp["q_ln_w"][li], lp["q_ln_b"][li],
                         self.ln_eps),
                _head_ln(k, lp["k_ln_w"][li], lp["k_ln_b"][li],
                         self.ln_eps))

    def _decoder_layer(self, lp, x, kv, li, metadata,
                       sliding_window="default", inv_freq=None,
                       lora_ctx=None, rope_on=True):
        if not self.swin_norm:
            return super()._decoder_layer(
                lp, x, kv, li, metadata, sliding_window=sliding_window,
                inv_freq=inv_freq, lora_ctx=lora_ctx, rope_on=rope_on)
        # swin order: x += ln(sublayer(x)) (ChameleonSwinDecoderLayer)
        args = self.args
        T = x.shape[0]
        nq, nk, d = args.num_heads, args.num_kv_heads, args.head_dim
        if inv_freq is None:
            inv_freq = self.inv_freq
        qkv = linear(x, lp["qkv"], layer=li)
        q, k, v = jnp.split(qkv, [nq * d, (nq + nk) * d], axis=-1)
        q = q.reshape(T, nq, d)
        k = k.reshape(T, nk, d)
        v = v.reshape(T, nk, d)
        q, k = self._qk_norm(lp, li, q, k)
        q, k = self._apply_rope_qk(q, k, metadata, inv_freq)
        attn_out, kv = self._cached_attention(
            lp, li, q, k, v, kv, metadata,
            sliding_window=args.sliding_window,
            logits_soft_cap=args.attn_soft_cap)
        attn_o = linear(attn_out.reshape(T, nq * d), lp["o"], layer=li)
        x = x + rms_norm(attn_o, lp["input_ln"][li], args.rms_eps)
        ffw = self._mlp(lp, x, li, lora_ctx)
        return x + rms_norm(ffw, lp["post_ln"][li], args.rms_eps), kv

    def _alloc_layer_stack(self, np_dtype) -> dict:
        layers = super()._alloc_layer_stack(np_dtype)
        a = self.args
        L, nq, nk, d = a.num_layers, a.num_heads, a.num_kv_heads, \
            a.head_dim
        for key in ("q_norm", "k_norm"):
            layers.pop(key, None)
        layers["q_ln_w"] = np.empty((L, nq, d), np_dtype)
        layers["q_ln_b"] = np.empty((L, nq, d), np_dtype)
        layers["k_ln_w"] = np.empty((L, nk, d), np_dtype)
        layers["k_ln_b"] = np.empty((L, nk, d), np_dtype)
        return layers

    def _hf_layer_map(self):
        m = super()._hf_layer_map()
        m.pop("self_attn.q_norm.weight", None)
        m.pop("self_attn.k_norm.weight", None)
        m["self_attn.q_norm.weight"] = ("q_ln_w", "", False)
        m["self_attn.q_norm.bias"] = ("q_ln_b", "", False)
        m["self_attn.k_norm.weight"] = ("k_ln_w", "", False)
        m["self_attn.k_norm.bias"] = ("k_ln_b", "", False)
        return m


class ChameleonForConditionalGeneration(ChameleonForCausalLM):
    """Full early-fusion model: + VQ-VAE image tokenizer."""

    def __init__(self, model_config: ModelConfig) -> None:
        super().__init__(model_config)
        hf = model_config.resolve_hf_config()
        self.vq_config = getattr(hf, "vq_config", None)
        vmap = dict(getattr(hf, "vocabulary_map", None) or {})
        # BPE id of the <image> placeholder: from the vocabulary map
        # (reference: ChameleonImageVocabularyMapping.image_token_id;
        # 8711 in the released checkpoints)
        self.image_token_index = int(
            vmap.get("<image>")
            or getattr(hf, "image_token_index", None) or 8711)
        # vocabulary_map: BPE-token-string -> bpe id; image codes are
        # "IMGIMG..." entries; build codebook-id -> bpe-id (reference:
        # chameleon.py ChameleonImageVocabularyMapping.img2bpe)
        self._img2bpe = self._build_img2bpe(vmap)

    @staticmethod
    def _build_img2bpe(vmap: dict) -> dict:
        out = {}
        char_map = {chr(ord("A") + i): str(i) for i in range(10)}
        for tok, bpe_id in vmap.items():
            if not tok.startswith("IMGIMG"):
                continue
            digits = "".join(char_map.get(c, "") for c in tok[6:-1])
            if digits:
                out[int(digits)] = int(bpe_id)
        return out

    def compute_logits(self, params, hidden):
        logits = super().compute_logits(params, hidden)
        # image-token logits are disallowed in text generation
        # (reference: chameleon.py compute_logits masks
        # image_tokens to -inf, matching HF)
        if self._img2bpe:
            ids = jnp.asarray(sorted(self._img2bpe.values()), jnp.int32)
            logits = logits.at[..., ids].set(
                jnp.finfo(jnp.float32).min)
        return logits

    # ---------------------------------------------------------- vq encode

    def encode_image_mm(self, params: dict, mm: dict) -> np.ndarray:
        """pixel_values [C, H, W] (or [1, C, H, W]) -> the EMBEDDING
        rows of the image's VQ token ids (early fusion: equivalent to
        substituting the ids into input_ids before embedding)."""
        pv = np.asarray(mm["pixel_values"], np.float32)
        if pv.ndim == 3:
            pv = pv[None]
        if self._encode_fn is None:
            self._encode_fn = jax.jit(self._vq_tokens)
        codes = np.asarray(self._encode_fn(params, jnp.asarray(pv)))
        ids = np.asarray(
            [self._img2bpe.get(int(c), self.image_token_index)
             for c in codes.reshape(-1)], np.int32)
        embed = np.asarray(params["language"]["embed"]["w"]
                           if "language" in params
                           else params["embed"]["w"])
        return embed[ids].astype(np.float32)

    _encode_fn = None

    def _vq_tokens(self, params, pv: jnp.ndarray) -> jnp.ndarray:
        from vllm_tpu.models.chameleon_vq import vq_encode_tokens

        return vq_encode_tokens(params["vq"], pv, self.vq_config)

    # ------------------------------------------------------------ weights

    def load_weights(self, weights_iter):
        from vllm_tpu.models.chameleon_vq import alloc_vq, load_vq_one

        npd = _np_dtype(self.model_config.dtype)
        vq = alloc_vq(self.vq_config, np.float32) \
            if self.vq_config is not None else None

        def tap(it):
            for name, w in it:
                n = name.removeprefix("model.")
                if n.startswith("vqmodel."):
                    if vq is not None:
                        load_vq_one(vq, n[len("vqmodel."):],
                                    np.asarray(w))
                    continue
                yield name, w

        params = super().load_weights(tap(weights_iter))
        if vq is not None:
            params["vq"] = vq
        return params
