"""Mamba2 (state-space) causal LM, TPU-native (reference:
vllm/model_executor/models/mamba2.py + layers/mamba/mamba_mixer2.py).

Pure-SSM serving: instead of a paged KV cache, each request carries a
constant-size recurrent state (conv taps + SSM state) in per-request
slot rows; prefill and decode both run through the segment-aware
chunked SSD scan over the packed token stream, so mixed
prefill/decode batches need no host-side splitting (the reference
splits into varlen-prefill and single-step-update kernel calls).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import KVCacheSpec, MambaSpec
from vllm_tpu.ops.attention import AttentionMetadata
from vllm_tpu.ops.layernorm import rms_norm
from vllm_tpu.ops.linear import embedding_lookup, linear
from vllm_tpu.ops.mamba import (causal_conv1d_segmented, gated_rms_norm,
                                ssd_chunked_segmented)


@dataclass(frozen=True)
class Mamba2Args:
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int  # H
    head_dim: int  # P
    state_size: int  # N
    n_groups: int  # G
    conv_kernel: int  # K
    intermediate_size: int  # H * P
    rms_eps: float
    chunk_size: int
    tie_embeddings: bool
    time_step_min: float
    time_step_max: float

    @property
    def conv_dim(self) -> int:
        return self.intermediate_size + 2 * self.n_groups * self.state_size

    @staticmethod
    def from_hf_config(hf) -> "Mamba2Args":
        inter = int(getattr(hf, "expand", 2) * hf.hidden_size)
        limit = getattr(hf, "time_step_limit", (0.0, float("inf")))
        return Mamba2Args(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=hf.num_hidden_layers,
            num_heads=hf.num_heads,
            head_dim=hf.head_dim,
            state_size=hf.state_size,
            n_groups=getattr(hf, "n_groups", 1),
            conv_kernel=getattr(hf, "conv_kernel", 4),
            intermediate_size=inter,
            rms_eps=float(getattr(hf, "layer_norm_epsilon", 1e-5)),
            chunk_size=int(getattr(hf, "chunk_size", 256)),
            tie_embeddings=bool(getattr(hf, "tie_word_embeddings", True)),
            time_step_min=float(limit[0]),
            time_step_max=float(limit[1]),
        )


def _pick_chunk(T: int, preferred: int) -> int:
    for c in (preferred, 128, 64, 32, 16, 8, 4, 2, 1):
        if c <= T and T % c == 0:
            return c
    return 1


def packed_segments(metadata: AttentionMetadata, T: int, num_slots: int):
    """Per-token segment routing over the packed stream: returns
    (seg i32[T] state-slot per token, seg_start i32[T] packed index of
    the token's request span start, pad_mask bool[T]). Padding tokens
    route to the scratch slot ``num_slots``."""
    qsl = metadata.query_start_loc
    Rq = qsl.shape[0] - 1
    t = jnp.arange(T, dtype=jnp.int32)
    seg_row = jnp.clip(
        jnp.searchsorted(qsl, t, side="right").astype(jnp.int32) - 1, 0,
        Rq)
    seg_row = jnp.where(t >= qsl[-1], Rq, seg_row)
    seg_start = qsl[jnp.clip(seg_row, 0, Rq - 1)]
    pad_mask = (seg_row == Rq)
    if metadata.state_slots is not None:
        slots_ext = jnp.concatenate([
            metadata.state_slots.astype(jnp.int32),
            jnp.full((1,), num_slots, jnp.int32)
        ])
        seg = slots_ext[seg_row]
    else:
        seg = jnp.minimum(seg_row, num_slots)
    return seg, seg_start, pad_mask


def mamba2_mixer(h, mp, conv_state, ssm_state, seg, seg_start, pad_mask,
                 *, num_heads, head_dim, n_groups, state_size,
                 intermediate_size, rms_eps, chunk,
                 time_step_min=0.0, time_step_max=float("inf")):
    """One Mamba2 mixer over a packed stream (reference:
    mamba_mixer2.py MambaMixer2.forward). ``mp`` holds this layer's
    plain (unstacked) arrays. Returns (out [T, hidden], new_conv,
    new_ssm)."""
    T = h.shape[0]
    conv_dim = intermediate_size + 2 * n_groups * state_size
    proj = linear(h, mp["in_proj"])
    z, xBC, dt = jnp.split(
        proj, [intermediate_size, intermediate_size + conv_dim], axis=-1)
    xBC, new_conv = causal_conv1d_segmented(xBC, mp["conv_w"],
                                            mp["conv_b"], seg, seg_start,
                                            conv_state)
    xBC = jax.nn.silu(xBC.astype(jnp.float32)).astype(h.dtype)
    xm, B, C = jnp.split(
        xBC,
        [intermediate_size, intermediate_size + n_groups * state_size],
        axis=-1)
    dt = jax.nn.softplus(dt.astype(jnp.float32) + mp["dt_bias"])
    dt = jnp.clip(dt, time_step_min, time_step_max)
    dt = jnp.where(pad_mask[:, None], 0.0, dt)
    A = -jnp.exp(mp["A_log"].astype(jnp.float32))
    y, new_ssm = ssd_chunked_segmented(
        xm.reshape(T, num_heads, head_dim), dt, A,
        B.reshape(T, n_groups, state_size),
        C.reshape(T, n_groups, state_size), seg, ssm_state,
        chunk_size=chunk)
    y = y + mp["D"][None, :, None] * xm.reshape(T, num_heads, head_dim)
    y = y.reshape(T, intermediate_size)
    if "mixer_norm" in mp:
        y = gated_rms_norm(y, z, mp["mixer_norm"], rms_eps)
    else:
        # norm-free gate (FalconH1 with mamba_rms_norm=False:
        # modeling_falcon_h1.py:772 — out = scan_output * silu(gate))
        y = (y.astype(jnp.float32) *
             jax.nn.silu(z.astype(jnp.float32))).astype(h.dtype)
    return linear(y, mp["out_proj"]), new_conv, new_ssm


class Mamba2ForCausalLM:
    """Functional Mamba2 model (reference: models/mamba2.py). The
    "kv cache" for this model is the tuple (conv_states
    [L, R+1, K-1, conv_dim], ssm_states [L, R+1, H, P, N]) — row per
    request slot, last row is scratch for padding tokens."""

    is_ssm = True

    def __init__(self, model_config: ModelConfig,
                 args: Optional[Mamba2Args] = None) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        self.args = args or Mamba2Args.from_hf_config(hf)
        self.dtype = jnp.bfloat16 if model_config.dtype == "bfloat16" \
            else jnp.float32

    # ------------------------------------------------------------- forward

    def embed(self, params: dict, input_ids: jnp.ndarray) -> jnp.ndarray:
        return embedding_lookup(input_ids, params["embed"]["w"])

    def state_shapes(self, num_slots: int) -> tuple[tuple, tuple]:
        a = self.args
        return ((a.num_layers, num_slots + 1, a.conv_kernel - 1,
                 a.conv_dim),
                (a.num_layers, num_slots + 1, a.num_heads, a.head_dim,
                 a.state_size))

    def init_states(self, num_slots: int):
        conv_shape, ssm_shape = self.state_shapes(num_slots)
        return (jnp.zeros(conv_shape, self.dtype),
                jnp.zeros(ssm_shape, jnp.float32))

    def forward(
        self,
        params: dict,
        input_ids: jnp.ndarray,  # i32[T]
        kv_caches,  # [ (conv_states, ssm_states) ]
        metadata: AttentionMetadata,
        lora=None,
        embed_override=None,
    ):
        a = self.args
        T = input_ids.shape[0]
        conv_states, ssm_states = kv_caches[0]
        R = conv_states.shape[1] - 1  # request slots (minus scratch row)

        seg, seg_start, pad_mask = packed_segments(metadata, T, R)

        x = self.embed(params, input_ids)
        lp = jax.tree.map(jnp.asarray, params["layers"])
        chunk = _pick_chunk(T, a.chunk_size)

        def layer_step(carry, li):
            x, conv_states, ssm_states = carry
            h = rms_norm(x, lp["norm"][li], a.rms_eps)
            proj = linear(h, lp["in_proj"], layer=li)
            z, xBC, dt = jnp.split(
                proj, [a.intermediate_size,
                       a.intermediate_size + a.conv_dim], axis=-1)
            xBC, new_conv = causal_conv1d_segmented(
                xBC, lp["conv_w"][li], lp["conv_b"][li], seg, seg_start,
                conv_states[li])
            conv_states = conv_states.at[li].set(new_conv)
            xBC = jax.nn.silu(xBC.astype(jnp.float32)).astype(x.dtype)
            xm, B, C = jnp.split(
                xBC, [a.intermediate_size,
                      a.intermediate_size + a.n_groups * a.state_size],
                axis=-1)
            dt = jax.nn.softplus(
                dt.astype(jnp.float32) + lp["dt_bias"][li])
            dt = jnp.clip(dt, a.time_step_min, a.time_step_max)
            dt = jnp.where(pad_mask[:, None], 0.0, dt)
            A = -jnp.exp(lp["A_log"][li].astype(jnp.float32))
            y, new_ssm = ssd_chunked_segmented(
                xm.reshape(T, a.num_heads, a.head_dim), dt, A,
                B.reshape(T, a.n_groups, a.state_size),
                C.reshape(T, a.n_groups, a.state_size), seg,
                ssm_states[li], chunk_size=chunk)
            ssm_states = ssm_states.at[li].set(new_ssm)
            y = y + lp["D"][li][None, :, None] * \
                xm.reshape(T, a.num_heads, a.head_dim)
            y = gated_rms_norm(y.reshape(T, a.intermediate_size), z,
                               lp["mixer_norm"][li], a.rms_eps)
            out = linear(y, lp["out_proj"], layer=li)
            return (x + out, conv_states, ssm_states), None

        (x, conv_states, ssm_states), _ = jax.lax.scan(
            layer_step, (x, conv_states, ssm_states),
            jnp.arange(a.num_layers))
        x = rms_norm(x, params["final_ln"], a.rms_eps)
        return x, [(conv_states, ssm_states)]

    def compute_logits(self, params: dict,
                       hidden: jnp.ndarray) -> jnp.ndarray:
        w = params["lm_head"]["w"] if "lm_head" in params \
            else params["embed"]["w"].T
        return jnp.dot(hidden, w.astype(hidden.dtype))

    # -------------------------------------------------------------- specs

    def get_kv_cache_specs(self, block_size: int,
                           cache_dtype: str) -> dict[str, KVCacheSpec]:
        a = self.args
        el = 2 if self.dtype == jnp.bfloat16 else 4
        conv_bytes = (a.conv_kernel - 1) * a.conv_dim * el
        ssm_bytes = a.num_heads * a.head_dim * a.state_size * 4
        return {
            f"layers.{i}": MambaSpec(
                block_size=block_size,
                state_size_bytes=conv_bytes + ssm_bytes)
            for i in range(a.num_layers)
        }

    # ------------------------------------------------------------- loading

    def load_weights(self, weights_iter) -> dict:
        a = self.args
        npd = np.float32 if self.dtype == jnp.float32 else np.dtype(
            "bfloat16")
        L = a.num_layers
        layers = {
            "norm": np.empty((L, a.hidden_size), npd),
            "in_proj": {"w": np.empty(
                (L, a.hidden_size,
                 a.intermediate_size + a.conv_dim + a.num_heads), npd)},
            "conv_w": np.empty((L, a.conv_dim, a.conv_kernel), npd),
            "conv_b": np.empty((L, a.conv_dim), npd),
            "dt_bias": np.empty((L, a.num_heads), np.float32),
            "A_log": np.empty((L, a.num_heads), np.float32),
            "D": np.empty((L, a.num_heads), np.float32),
            "mixer_norm": np.empty((L, a.intermediate_size), npd),
            "out_proj": {"w": np.empty(
                (L, a.intermediate_size, a.hidden_size), npd)},
        }
        params: dict = {"layers": layers}
        for name, w in weights_iter:
            w = np.asarray(w)
            if name == "backbone.embeddings.weight":
                params["embed"] = {"w": w.astype(npd)}
            elif name == "backbone.norm_f.weight":
                params["final_ln"] = w.astype(npd)
            elif name == "lm_head.weight":
                params["lm_head"] = {"w": w.T.astype(npd)}
            elif name.startswith("backbone.layers."):
                parts = name.split(".")
                li = int(parts[2])
                sub = ".".join(parts[3:])
                if sub == "norm.weight":
                    layers["norm"][li] = w
                elif sub == "mixer.in_proj.weight":
                    layers["in_proj"]["w"][li] = w.T
                elif sub == "mixer.conv1d.weight":
                    layers["conv_w"][li] = w[:, 0, :]
                elif sub == "mixer.conv1d.bias":
                    layers["conv_b"][li] = w
                elif sub == "mixer.dt_bias":
                    layers["dt_bias"][li] = w
                elif sub == "mixer.A_log":
                    layers["A_log"][li] = w
                elif sub == "mixer.D":
                    layers["D"][li] = w
                elif sub == "mixer.norm.weight":
                    layers["mixer_norm"][li] = w
                elif sub == "mixer.out_proj.weight":
                    layers["out_proj"]["w"][li] = w.T
        if a.tie_embeddings and "lm_head" not in params:
            params["lm_head"] = {"w": params["embed"]["w"].T.copy()}
        return params
