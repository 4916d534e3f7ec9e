"""Qwen2-Audio — audio-chat model (reference behavior parity:
vllm/model_executor/models/qwen2_audio.py).

Composition: Whisper-style audio encoder (conv x2 -> learned positions
-> bidirectional layers) -> stride-2 average pool -> LayerNorm -> a
single linear projector -> audio embeddings substituted at
<|AUDIO|> placeholder positions in the Qwen2 language model (the same
embed_override mechanism as image VLMs; decoder-only, unlike Whisper's
cross-attention)."""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import KVCacheSpec
from vllm_tpu.models.llama import _np_dtype
from vllm_tpu.models.whisper import _ln, _mha_full


class Qwen2AudioForConditionalGeneration:

    def __init__(self, model_config: ModelConfig) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        ac = hf.audio_config
        self.audio_token_index = int(getattr(hf, "audio_token_index",
                                             151646))
        # placeholder substitution rides the image mechanism (token-id
        # keyed); audio placeholders are just a different token id
        self.image_token_index = self.audio_token_index
        self.d_model = ac.d_model
        self.encoder_layers = ac.encoder_layers
        self.encoder_heads = ac.encoder_attention_heads
        self.num_mel = ac.num_mel_bins
        self.max_source_positions = ac.max_source_positions
        self.dtype = jnp.bfloat16 if model_config.dtype == "bfloat16" \
            else jnp.float32

        from vllm_tpu.models.registry import resolve_model_cls

        from vllm_tpu.models.registry import arch_for_text_config

        text_arch = arch_for_text_config(hf.text_config,
                                         "Qwen2ForCausalLM")
        lm_cls = resolve_model_cls(text_arch)
        lm_config = ModelConfig(model=model_config.model,
                                dtype=model_config.dtype,
                                hf_config=hf.text_config)
        self.language = lm_cls(lm_config)
        self.args = self.language.args

    # ------------------------------------------------------------ audio

    def encode_audio(self, params: dict,
                     input_features: jnp.ndarray) -> jnp.ndarray:
        """[num_mel, T] (or [1, num_mel, T]) -> [T//4ish, H_text]."""
        ep = params["audio"]
        x = input_features
        if x.ndim == 3:
            x = x[0]
        x = x.astype(self.dtype)

        def conv(xin, w, b, stride):
            C_in, T0 = xin.shape
            xpad = jnp.pad(xin, ((0, 0), (1, 1)))
            cols = T0 // stride
            idx = jnp.arange(cols) * stride
            taps = [xpad[:, idx + t] for t in range(3)]
            stack = jnp.concatenate(taps, axis=0)
            wf = w.transpose(2, 1, 0).reshape(3 * C_in, -1)
            return (stack.T @ wf + b.ravel()).T

        x = jax.nn.gelu(conv(x, ep["conv1_w"], ep["conv1_b"], 1),
                        approximate=False)
        x = jax.nn.gelu(conv(x, ep["conv2_w"], ep["conv2_b"], 2),
                        approximate=False)
        x = x.T  # [T_src, D]
        x = x + ep["pos"][:x.shape[0]].astype(x.dtype)
        for li in range(self.encoder_layers):
            lp = ep["layers"][li]
            h = _ln(x, lp["ln1_w"], lp["ln1_b"])
            x = x + _mha_full(h, lp, self.encoder_heads, "attn")
            h = _ln(x, lp["ln2_w"], lp["ln2_b"])
            h = jax.nn.gelu((h @ lp["fc1"]["w"] + lp["fc1"]["b"]).astype(
                jnp.float32), approximate=False).astype(x.dtype)
            x = x + (h @ lp["fc2"]["w"] + lp["fc2"]["b"])
        # stride-2 average pool over time, then LN, then project
        T2 = (x.shape[0] // 2) * 2
        x = x[:T2].reshape(T2 // 2, 2, -1).mean(axis=1)
        x = _ln(x, ep["ln_post_w"], ep["ln_post_b"])
        return x @ params["projector"]["w"] + params["projector"]["b"]

    # ------------------------------------------------------------ forward

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

    # ------------------------------------------------------------ weights

    def _alloc_audio(self, npd) -> dict:
        D, L = self.d_model, self.encoder_layers
        F = 4 * D  # whisper-style encoder_ffn_dim == 4*d_model by config
        hf = self.model_config.resolve_hf_config()
        F = int(getattr(hf.audio_config, "encoder_ffn_dim", F))
        layer = lambda: {  # noqa: E731 — _mha_full's key layout
            "ln1_w": np.zeros(D, npd), "ln1_b": np.zeros(D, npd),
            "ln2_w": np.zeros(D, npd), "ln2_b": np.zeros(D, npd),
            "attn.q": {"w": np.zeros((D, D), npd),
                       "b": np.zeros(D, npd)},
            "attn.k": {"w": np.zeros((D, D), npd)},  # k_proj: no bias
            "attn.v": {"w": np.zeros((D, D), npd),
                       "b": np.zeros(D, npd)},
            "attn.o": {"w": np.zeros((D, D), npd),
                       "b": np.zeros(D, npd)},
            "fc1": {"w": np.zeros((D, F), npd), "b": np.zeros(F, npd)},
            "fc2": {"w": np.zeros((F, D), npd), "b": np.zeros(D, npd)},
        }
        return {
            "conv1_w": np.zeros((D, self.num_mel, 3), npd),
            "conv1_b": np.zeros(D, npd),
            "conv2_w": np.zeros((D, D, 3), npd),
            "conv2_b": np.zeros(D, npd),
            "pos": np.zeros((self.max_source_positions, D), npd),
            "ln_post_w": np.zeros(D, npd),
            "ln_post_b": np.zeros(D, npd),
            "layers": [layer() for _ in range(L)],
        }

    def load_weights(self, weights_iter) -> dict:
        npd = _np_dtype(self.model_config.dtype)
        audio = self._alloc_audio(npd)
        proj = {"w": np.zeros((self.d_model, self.args.hidden_size), npd),
                "b": np.zeros(self.args.hidden_size, npd)}
        lm_weights: list[tuple[str, np.ndarray]] = []
        amap = {
            "conv1.weight": "conv1_w", "conv1.bias": "conv1_b",
            "conv2.weight": "conv2_w", "conv2.bias": "conv2_b",
            "embed_positions.weight": "pos",
            "layer_norm.weight": "ln_post_w",
            "layer_norm.bias": "ln_post_b",
        }
        attn_map = {
            "self_attn.q_proj": "attn.q",
            "self_attn.k_proj": "attn.k",
            "self_attn.v_proj": "attn.v",
            "self_attn.out_proj": "attn.o",
        }
        for name, w in weights_iter:
            w = np.asarray(w)
            name = name.removeprefix("model.")
            if name.startswith("audio_tower."):
                sub = name[len("audio_tower."):]
                if sub in amap:
                    audio[amap[sub]][...] = w.astype(npd)
                elif sub.startswith("layers."):
                    parts = sub.split(".")
                    li = int(parts[1])
                    rest = ".".join(parts[2:])
                    lp = audio["layers"][li]
                    if rest == "self_attn_layer_norm.weight":
                        lp["ln1_w"][...] = w
                    elif rest == "self_attn_layer_norm.bias":
                        lp["ln1_b"][...] = w
                    elif rest == "final_layer_norm.weight":
                        lp["ln2_w"][...] = w
                    elif rest == "final_layer_norm.bias":
                        lp["ln2_b"][...] = w
                    elif rest == "fc1.weight":
                        lp["fc1"]["w"][...] = w.T
                    elif rest == "fc1.bias":
                        lp["fc1"]["b"][...] = w
                    elif rest == "fc2.weight":
                        lp["fc2"]["w"][...] = w.T
                    elif rest == "fc2.bias":
                        lp["fc2"]["b"][...] = w
                    else:
                        for pre, key in attn_map.items():
                            if rest == f"{pre}.weight":
                                lp[key]["w"][...] = w.T
                            elif rest == f"{pre}.bias" and "b" in lp[key]:
                                lp[key]["b"][...] = w
            elif name.startswith("multi_modal_projector.linear."):
                if name.endswith("weight"):
                    proj["w"][...] = w.T.astype(npd)
                else:
                    proj["b"][...] = w.astype(npd)
            elif name.startswith("language_model."):
                sub = name[len("language_model."):]
                if not sub.startswith(("model.", "lm_head.")):
                    sub = "model." + sub
                lm_weights.append((sub, w))
            elif name.startswith("lm_head."):
                lm_weights.append((name, w))
        # whisper-style attn params load as {q,k,v,o}_w/b dicts; _mha_full
        # expects that exact layout
        params = {"language": self.language.load_weights(iter(lm_weights)),
                  "audio": audio, "projector": proj}
        return params

    def init_dummy_params(self, seed: int = 0) -> dict:
        rng = np.random.default_rng(seed)
        audio = self._alloc_audio(np.float32)

        def fill(leaf):
            if getattr(leaf, "ndim", 0) >= 2:
                return (rng.standard_normal(leaf.shape) * 0.4 /
                        np.sqrt(leaf.shape[-1])).astype(np.float32)
            return leaf

        audio = jax.tree.map(fill, audio)
        for lp in audio["layers"]:
            for k in ("ln1_w", "ln2_w"):
                lp[k] = np.ones_like(lp[k])
        audio["ln_post_w"] = np.ones_like(audio["ln_post_w"])
        proj = jax.tree.map(
            fill, {"w": np.zeros((self.d_model, self.args.hidden_size),
                                 np.float32),
                   "b": np.zeros(self.args.hidden_size, np.float32)})
        return {"language": self.language.init_dummy_params(seed),
                "audio": audio, "projector": proj}


class VoxtralForConditionalGeneration(Qwen2AudioForConditionalGeneration):
    """Voxtral — Mistral's audio-chat model (reference:
    vllm/model_executor/models/voxtral.py).

    vs Qwen2-Audio: no temporal average pool — instead the encoder
    output [T, d] reshapes to [T/4, 4d] (intermediate_size = 4*d_model)
    before a bias-free 2-layer GELU projector into the Mistral hidden
    size."""

    def __init__(self, model_config: ModelConfig) -> None:
        hf = model_config.resolve_hf_config()
        # HF marks the placeholder as audio_token_id on the top config
        super().__init__(model_config)
        self.audio_token_index = int(getattr(hf, "audio_token_id", None)
                                     or 24)
        self.image_token_index = self.audio_token_index
        self.intermediate = int(getattr(hf.audio_config,
                                        "intermediate_size",
                                        4 * self.d_model))

    def encode_audio(self, params: dict,
                     input_features: jnp.ndarray) -> jnp.ndarray:
        ep = params["audio"]
        x = input_features
        if x.ndim == 3:
            x = x[0]
        x = x.astype(self.dtype)

        def conv(xin, w, b, stride):
            C_in, T0 = xin.shape
            xpad = jnp.pad(xin, ((0, 0), (1, 1)))
            cols = T0 // stride
            idx = jnp.arange(cols) * stride
            taps = [xpad[:, idx + t] for t in range(3)]
            stack = jnp.concatenate(taps, axis=0)
            wf = w.transpose(2, 1, 0).reshape(3 * C_in, -1)
            return (stack.T @ wf + b.ravel()).T

        x = jax.nn.gelu(conv(x, ep["conv1_w"], ep["conv1_b"], 1),
                        approximate=False)
        x = jax.nn.gelu(conv(x, ep["conv2_w"], ep["conv2_b"], 2),
                        approximate=False)
        x = x.T
        x = x + ep["pos"][:x.shape[0]].astype(x.dtype)
        for li in range(self.encoder_layers):
            lp = ep["layers"][li]
            h = _ln(x, lp["ln1_w"], lp["ln1_b"])
            x = x + _mha_full(h, lp, self.encoder_heads, "attn")
            h = _ln(x, lp["ln2_w"], lp["ln2_b"])
            h = jax.nn.gelu((h @ lp["fc1"]["w"] + lp["fc1"]["b"]).astype(
                jnp.float32), approximate=False).astype(x.dtype)
            x = x + (h @ lp["fc2"]["w"] + lp["fc2"]["b"])
        x = _ln(x, ep["ln_post_w"], ep["ln_post_b"])
        ratio = self.intermediate // self.d_model
        Tr = (x.shape[0] // ratio) * ratio
        x = x[:Tr].reshape(Tr // ratio, self.intermediate)
        p = params["projector"]
        h = jax.nn.gelu((x @ p["w1"]).astype(jnp.float32),
                        approximate=False).astype(x.dtype)
        return h @ p["w2"]

    def load_weights(self, weights_iter) -> dict:
        npd = _np_dtype(self.model_config.dtype)
        H = self.args.hidden_size
        proj = {"w1": np.zeros((self.intermediate, H), npd),
                "w2": np.zeros((H, H), npd)}
        taps = []

        def tap(it):
            for name, w in it:
                n = name.removeprefix("model.")
                if n == "multi_modal_projector.linear_1.weight":
                    proj["w1"][...] = np.asarray(w).T.astype(npd)
                elif n == "multi_modal_projector.linear_2.weight":
                    proj["w2"][...] = np.asarray(w).T.astype(npd)
                else:
                    yield name, w

        params = super().load_weights(tap(weights_iter))
        params["projector"] = proj
        return params
