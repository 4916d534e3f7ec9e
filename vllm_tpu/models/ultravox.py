"""Ultravox — fixie.ai's audio-chat model (reference behavior parity:
vllm/model_executor/models/ultravox.py).

Composition: full Whisper encoder (NO temporal pooling; final
layer_norm kept, ultravox.py:391) -> frame stacking by ``stack_factor``
(StackAudioFrames, ultravox.py:238: pad T to a multiple, reshape
[T/sf, D*sf]) -> projector (ultravox.py:259: RMSNorm ln_pre ->
bias-free linear_1 -> swiglu (x1 * silu(x2), halving the width) or act
-> RMSNorm ln_mid (v0.5+) -> bias-free linear_2 -> RMSNorm ln_post
(v0.4)) -> audio embeddings substituted at the <|audio|> placeholder
(config.audio_token_index, default 32000) of the Llama language model.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.models.llama import _np_dtype
from vllm_tpu.models.qwen2_audio import Qwen2AudioForConditionalGeneration
from vllm_tpu.models.whisper import _ln, _mha_full
from vllm_tpu.ops.layernorm import rms_norm


class UltravoxModel(Qwen2AudioForConditionalGeneration):

    def __init__(self, model_config: ModelConfig) -> None:
        hf = model_config.resolve_hf_config()
        super().__init__(model_config)
        self.audio_token_index = int(getattr(hf, "audio_token_index",
                                             32000))
        self.image_token_index = self.audio_token_index
        self.stack_factor = int(getattr(hf, "stack_factor", 8))
        self.projector_act = getattr(hf, "projector_act", "swiglu")
        self.projector_ln_mid = bool(getattr(hf, "projector_ln_mid",
                                             False))
        # projector inner width (UltravoxConfig.hidden_size); swiglu
        # halves it between linear_1 and linear_2
        self.proj_hidden = int(getattr(hf, "hidden_size", 4096))
        self.proj_mid = (self.proj_hidden // 2
                         if self.projector_act == "swiglu"
                         else self.proj_hidden)

    # ------------------------------------------------------------ audio

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
        x = _ln(x, ep["ln_post_w"], ep["ln_post_b"])

        # StackAudioFrames: pad time to a multiple of stack_factor with
        # zeros, then fold sf frames into the channel axis
        sf = self.stack_factor
        T0, D = x.shape
        Tp = -(-T0 // sf) * sf
        x = jnp.pad(x, ((0, Tp - T0), (0, 0)))
        x = x.reshape(Tp // sf, D * sf)

        p = params["projector"]
        h = rms_norm(x, p["ln_pre"], 1e-6)
        h = h @ p["w1"]
        if self.projector_act == "swiglu":
            # MulAndSilu: x1 * silu(x2) (reference: MulAndSilu in
            # vllm/model_executor/layers/activation.py)
            x1, x2 = jnp.split(h, 2, axis=-1)
            h = x1 * jax.nn.silu(x2.astype(jnp.float32)).astype(x1.dtype)
        else:
            h = jax.nn.gelu(h.astype(jnp.float32),
                            approximate=False).astype(h.dtype)
        if self.projector_ln_mid:
            h = rms_norm(h, p["ln_mid"], 1e-6)
        h = h @ p["w2"]
        if not self.projector_ln_mid:
            h = rms_norm(h, p["ln_post"], 1e-6)
        return h

    # ------------------------------------------------------------ weights

    def _alloc_projector(self, npd) -> dict:
        din = self.d_model * self.stack_factor
        dout = self.args.hidden_size
        proj = {
            "ln_pre": np.zeros(din, npd),
            "w1": np.zeros((din, self.proj_hidden), npd),
            "w2": np.zeros((self.proj_mid, dout), npd),
        }
        if self.projector_ln_mid:
            proj["ln_mid"] = np.zeros(self.proj_mid, npd)
        else:
            proj["ln_post"] = np.zeros(dout, npd)
        return proj

    def load_weights(self, weights_iter) -> dict:
        npd = _np_dtype(self.model_config.dtype)
        proj = self._alloc_projector(npd)
        pmap = {
            "ln_pre.weight": ("ln_pre", False),
            "linear_1.weight": ("w1", True),
            "linear_2.weight": ("w2", True),
            "ln_mid.weight": ("ln_mid", False),
            "ln_post.weight": ("ln_post", False),
        }

        def tap(it):
            for name, w in it:
                # checkpoint prefix zoo: audio_tower.model.encoder.*
                # (hf_to_vllm_mapper, ultravox.py:406) vs audio_tower.*
                n = name.replace("audio_tower.model.encoder.",
                                 "audio_tower.")
                if n.startswith("multi_modal_projector."):
                    sub = n[len("multi_modal_projector."):]
                    entry = pmap.get(sub)
                    if entry is not None and entry[0] in proj:
                        key, transpose = entry
                        w = np.asarray(w)
                        proj[key][...] = (w.T if transpose else
                                          w).astype(npd)
                    continue
                yield n, w

        params = super().load_weights(tap(weights_iter))
        params["projector"] = proj
        return params

    def init_dummy_params(self, seed: int = 0) -> dict:
        rng = np.random.default_rng(seed)
        params = super().init_dummy_params(seed)
        proj = self._alloc_projector(np.float32)

        def fill(leaf):
            if getattr(leaf, "ndim", 0) >= 2:
                return (rng.standard_normal(leaf.shape) * 0.4 /
                        np.sqrt(leaf.shape[-1])).astype(np.float32)
            return np.ones_like(leaf)

        params["projector"] = jax.tree.map(fill, proj)
        return params
