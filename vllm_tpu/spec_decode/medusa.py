"""Medusa speculative heads (reference:
vllm/model_executor/models/medusa.py + v1/spec_decode medusa wiring).

K independent residual-MLP heads predict the next K tokens from the
target model's LAST accepted hidden state — no draft KV cache and no
recursion, so the proposal is a handful of matmuls fused into the same
jitted step as verification (cheapest drafting after ngram).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.ops.attention import AttentionMetadata


class MedusaProposer:
    """Same propose() contract as EagleProposer; draft_kv is unused and
    passed through."""

    needs_draft_kv = False

    def __init__(self, target_model, spec_config, cache_config) -> None:
        self.target = target_model
        self.spec_config = spec_config
        self.num_speculative_tokens = spec_config.num_speculative_tokens

        hf: dict = {}
        path = spec_config.model
        if path and os.path.isdir(path):
            cfg_file = os.path.join(path, "config.json")
            if os.path.exists(cfg_file):
                with open(cfg_file) as f:
                    hf = json.load(f)
        t = target_model.args
        self.num_heads = int(hf.get("medusa_num_heads",
                                    spec_config.num_speculative_tokens))
        self.num_layers = int(hf.get("medusa_num_layers", 1))
        self.hidden_size = int(hf.get("hidden_size", t.hidden_size))
        self.vocab_size = int(hf.get("vocab_size", t.vocab_size))

    def get_kv_cache_spec(self, cache_dtype: str):
        return None  # no draft KV

    def load_weights(self, dtype) -> dict:
        """Medusa checkpoint: per head i, resblocks
        ``medusa_head.{i}.{j}.linear.{weight,bias}`` and an lm head
        ``medusa_head.{i}.{num_layers}.weight`` (original medusa repo
        layout; vllm's blocks.{i}/lm_heads.{i} aliases accepted)."""
        from vllm_tpu.models.weight_utils import weights_iterator

        npd = np.float32 if dtype == jnp.float32 else np.dtype("bfloat16")
        K, L, H, V = (self.num_heads, self.num_layers, self.hidden_size,
                      self.vocab_size)
        params = {
            "res_w": np.zeros((K, L, H, H), npd),
            "res_b": np.zeros((K, L, H), npd),
            "lm_head": np.zeros((K, H, V), npd),
        }
        path = self.spec_config.model
        for name, w in weights_iterator(path):
            w = np.asarray(w)
            parts = name.split(".")
            if parts[0] in ("medusa_head", "medusa_heads"):
                i = int(parts[1])
                if parts[2] == str(L) or parts[-2] == str(L):
                    params["lm_head"][i] = w.T.astype(npd)
                else:
                    j = int(parts[2])
                    if name.endswith("linear.weight") or \
                            name.endswith(f"{j}.weight"):
                        params["res_w"][i, j] = w.T.astype(npd)
                    else:
                        params["res_b"][i, j] = w.astype(npd)
            elif parts[0] == "blocks":
                i, j = int(parts[1]), int(parts[3])
                if name.endswith("weight"):
                    params["res_w"][i, j] = w.T.astype(npd)
                else:
                    params["res_b"][i, j] = w.astype(npd)
            elif parts[0] == "lm_heads":
                params["lm_head"][int(parts[1])] = w.T.astype(npd)
        return jax.tree.map(jnp.asarray, params)

    def propose(
        self,
        draft_params: dict,
        target_params: dict,
        draft_kv: Optional[jnp.ndarray],
        input_ids: jnp.ndarray,  # i32[T]
        target_hidden: jnp.ndarray,  # [T, H] final hidden (post-norm)
        metadata: AttentionMetadata,
        emitted: jnp.ndarray,  # i32[R, 1+S]
        num_emitted: jnp.ndarray,  # i32[R]
        num_drafts: jnp.ndarray,  # i32[R]
        max_model_len: int,
    ):
        """Returns (draft_tokens i32[R, S], draft_kv unchanged)."""
        R = metadata.seq_lens.shape[0]
        qsl = metadata.query_start_loc
        num_rejected = num_drafts + 1 - num_emitted
        accepted_last = jnp.maximum(qsl[1:] - 1 - num_rejected, 0)
        h = target_hidden[accepted_last]  # [R, H]

        # all K heads at once: resblocks x = x + silu(W x + b)
        x = jnp.broadcast_to(h[None], (self.num_heads, R, h.shape[-1]))
        for j in range(self.num_layers):
            y = jnp.einsum("krh,khd->krd", x,
                           draft_params["res_w"][:, j].astype(x.dtype))
            y = y + draft_params["res_b"][:, j][:, None, :].astype(x.dtype)
            x = x + jax.nn.silu(y.astype(jnp.float32)).astype(x.dtype)
        logits = jnp.einsum("krh,khv->krv", x,
                            draft_params["lm_head"].astype(x.dtype))
        drafts = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [K, R]
        S = self.num_speculative_tokens
        return drafts.T[:, :S], draft_kv
