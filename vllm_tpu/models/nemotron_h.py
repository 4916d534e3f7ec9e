"""Nemotron-H — NVIDIA's hybrid Mamba2/attention/MLP LM (reference
behavior parity: vllm/model_executor/models/nemotron_h.py).

``hybrid_override_pattern`` assigns each layer ONE mixer: "M" Mamba2,
"*" GQA attention (NoPE — nemotron_h.py:181 has no rotary), "-" a
relu-squared MLP (up -> relu(x)^2 -> down, nemotron_h.py:61). Every
layer is x += mixer(rmsnorm(x)). Checkpoint names use the Mamba-style
"backbone." prefix with per-layer ``mixer.*`` (nemotron_h.py:588
backbone->model rename)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import (FullAttentionSpec,
                                              KVCacheSpec, MambaSpec)
from vllm_tpu.models.bamba import BambaArgs, BambaForCausalLM
from vllm_tpu.models.mamba2 import _pick_chunk, mamba2_mixer, packed_segments
from vllm_tpu.ops.attention import attention, write_kv_cache
from vllm_tpu.ops.layernorm import rms_norm
from vllm_tpu.ops.linear import linear
from vllm_tpu.ops.rotary import RopeConfig


class NemotronHForCausalLM(BambaForCausalLM):

    def __init__(self, model_config: ModelConfig) -> None:
        hf = model_config.resolve_hf_config()
        pattern = str(hf.hybrid_override_pattern)
        L = len(pattern)
        head_dim = hf.hidden_size // hf.num_attention_heads
        eps = float(getattr(hf, "layer_norm_epsilon", None)
                    or getattr(hf, "rms_norm_eps", 1e-5))
        args = BambaArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=L,
            attn_layers=tuple(i for i, c in enumerate(pattern)
                              if c == "*"),
            num_heads=hf.num_attention_heads,
            num_kv_heads=getattr(hf, "num_key_value_heads", None)
            or hf.num_attention_heads,
            head_dim=head_dim,
            rope=RopeConfig.from_hf_config(hf, head_dim),  # unused: NoPE
            mamba_heads=int(getattr(hf, "mamba_num_heads", 128)),
            mamba_head_dim=int(getattr(hf, "mamba_head_dim", 64)),
            mamba_groups=int(getattr(hf, "mamba_n_groups", None)
                             or getattr(hf, "n_groups", 1)),
            state_size=int(getattr(hf, "ssm_state_size", 128)),
            conv_kernel=int(getattr(hf, "mamba_d_conv", None)
                            or getattr(hf, "conv_kernel", 4)),
            mamba_inter=int(getattr(hf, "mamba_expand", 2) *
                            hf.hidden_size),
            chunk_size=int(getattr(hf, "mamba_chunk_size", None)
                           or getattr(hf, "chunk_size", 256)),
            intermediate_size=hf.intermediate_size,
            act=getattr(hf, "mlp_hidden_act", "relu2"),
            rms_eps=eps,
            tie_embeddings=bool(getattr(hf, "tie_word_embeddings",
                                        False)),
        )
        super().__init__(model_config, args=args)
        self.pattern = pattern
        self.num_mamba_layers = pattern.count("M")

    # ------------------------------------------------------------- forward

    def forward(self, params, input_ids, kv_caches, metadata, lora=None,
                embed_override=None):
        a = self.args
        T = input_ids.shape[0]
        ssm_gi = next((i for i, c in enumerate(kv_caches)
                       if isinstance(c, tuple)), None)
        attn_gi = next((i for i, c in enumerate(kv_caches)
                        if not isinstance(c, tuple)), None)
        conv_states = ssm_states = None
        if ssm_gi is not None:
            conv_states, ssm_states = kv_caches[ssm_gi]
            num_slots = conv_states.shape[1] - 1
            seg, seg_start, pad_mask = packed_segments(metadata, T,
                                                       num_slots)
            chunk = _pick_chunk(T, a.chunk_size)
        attn_kv = kv_caches[attn_gi] if attn_gi is not None else None
        nq, nk, d = a.num_heads, a.num_kv_heads, a.head_dim

        x = self.embed(params, input_ids)
        mi = ai = 0
        for li, ch in enumerate(self.pattern):
            lp = jax.tree.map(jnp.asarray, params["layers"][li])
            h = rms_norm(x, lp["norm"], a.rms_eps)
            if ch == "M":
                out, new_conv, new_ssm = mamba2_mixer(
                    h, lp, conv_states[mi], ssm_states[mi], seg,
                    seg_start, pad_mask, num_heads=a.mamba_heads,
                    head_dim=a.mamba_head_dim, n_groups=a.mamba_groups,
                    state_size=a.state_size,
                    intermediate_size=a.mamba_inter, rms_eps=a.rms_eps,
                    chunk=chunk)
                conv_states = conv_states.at[mi].set(new_conv)
                ssm_states = ssm_states.at[mi].set(new_ssm)
                mi += 1
            elif ch == "*":
                qkv = linear(h, lp["qkv"])
                q, k, v = jnp.split(qkv, [nq * d, (nq + nk) * d], axis=-1)
                q = q.reshape(T, nq, d)
                k = k.reshape(T, nk, d)
                v = v.reshape(T, nk, d)
                # NoPE: nemotron attention has no positional embedding
                attn_kv = write_kv_cache(attn_kv, k, v,
                                         metadata.slot_mapping, layer=ai)
                o = attention(q, attn_kv, metadata, self.scale, layer=ai)
                out = linear(o.reshape(T, nq * d), lp["o"])
                ai += 1
            else:  # "-": relu-squared MLP
                up = linear(h, lp["up"])
                up = jnp.square(jax.nn.relu(up.astype(jnp.float32))
                                ).astype(h.dtype)
                out = linear(up, lp["down"])
            x = x + out

        x = rms_norm(x, params["final_ln"], a.rms_eps)
        new_caches = [None] * len(kv_caches)
        if ssm_gi is not None:
            new_caches[ssm_gi] = (conv_states, ssm_states)
        if attn_gi is not None:
            new_caches[attn_gi] = attn_kv
        return x, new_caches

    # ------------------------------------------------------------ kv specs

    def get_kv_cache_specs(self, block_size: int,
                           cache_dtype: str) -> dict[str, KVCacheSpec]:
        a = self.args
        el = 2 if self.dtype == jnp.bfloat16 else 4
        conv_bytes = (a.conv_kernel - 1) * a.conv_dim * el
        ssm_bytes = a.mamba_heads * a.mamba_head_dim * a.state_size * 4
        specs: dict[str, KVCacheSpec] = {}
        for i, ch in enumerate(self.pattern):
            if ch == "M":
                specs[f"layers.{i}"] = MambaSpec(
                    block_size=block_size,
                    state_size_bytes=conv_bytes + ssm_bytes)
            elif ch == "*":
                specs[f"layers.{i}"] = FullAttentionSpec(
                    block_size=block_size, num_kv_heads=a.num_kv_heads,
                    head_size=a.head_dim, dtype=cache_dtype)
        return specs

    # ------------------------------------------------------------- weights

    def load_weights(self, weights_iter) -> dict:
        a = self.args
        npd = np.float32 if self.dtype == jnp.float32 else np.dtype(
            "bfloat16")
        layers: list[dict] = [{} for _ in range(a.num_layers)]
        params: dict = {"layers": layers}
        qkv_parts: dict[int, dict] = {}
        for name, w in weights_iter:
            w = np.asarray(w)
            name = name.removeprefix("backbone.")
            if name == "embeddings.weight":
                params["embed"] = {"w": w.astype(npd)}
            elif name == "norm_f.weight":
                params["final_ln"] = w.astype(npd)
            elif name == "lm_head.weight":
                params["lm_head"] = {"w": w.T.astype(npd)}
            elif name.startswith("layers."):
                parts = name.split(".")
                li = int(parts[1])
                sub = ".".join(parts[2:])
                lp = layers[li]
                if sub == "norm.weight":
                    lp["norm"] = w.astype(npd)
                elif sub == "mixer.up_proj.weight":
                    lp["up"] = {"w": w.T.astype(npd)}
                elif sub == "mixer.down_proj.weight":
                    lp["down"] = {"w": w.T.astype(npd)}
                elif sub == "mixer.in_proj.weight":
                    lp["in_proj"] = {"w": w.T.astype(npd)}
                elif sub == "mixer.conv1d.weight":
                    lp["conv_w"] = w[:, 0, :].astype(npd)
                elif sub == "mixer.conv1d.bias":
                    lp["conv_b"] = w.astype(npd)
                elif sub == "mixer.dt_bias":
                    lp["dt_bias"] = w.astype(np.float32)
                elif sub == "mixer.A_log":
                    lp["A_log"] = w.astype(np.float32)
                elif sub == "mixer.D":
                    lp["D"] = w.astype(np.float32)
                elif sub == "mixer.norm.weight":
                    lp["mixer_norm"] = w.astype(npd)
                elif sub == "mixer.out_proj.weight":
                    lp["out_proj"] = {"w": w.T.astype(npd)}
                elif sub in ("mixer.q_proj.weight", "mixer.k_proj.weight",
                             "mixer.v_proj.weight"):
                    qkv_parts.setdefault(li, {})[sub.split(".")[1][0]] = w.T
                elif sub == "mixer.o_proj.weight":
                    lp["o"] = {"w": w.T.astype(npd)}
        for li, parts in qkv_parts.items():
            layers[li]["qkv"] = {"w": np.concatenate(
                [parts["q"], parts["k"], parts["v"]], axis=1).astype(npd)}
        if a.tie_embeddings and "lm_head" not in params:
            params["lm_head"] = {"w": params["embed"]["w"].T.copy()}
        return params
