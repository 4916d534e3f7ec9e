"""IBM MLPSpeculator drafting (reference:
vllm/model_executor/models/mlp_speculator.py — "Accelerating Production
LLMs with Combined Token/Embedding Speculators", arXiv:2404.19124).

K chained MLP stages predict the next K tokens from the target model's
LAST accepted hidden state plus the last accepted token embedding:

  state_0 = target_hidden            (optionally L2-normed / sqrt(2))
  state_i = gelu(LN_i(proj_i(state_{i-1}) + c * emb_i(tok_{i-1})))
  tok_i   = argmax(head_i(state_i)),  c = emb_weight / state_weight

No draft KV cache and no attention — like Medusa the proposal is a few
matmuls fused into the jitted step, but stages are CHAINED through the
sampled token, so they unroll sequentially (K is small, typically 3-4).
"""

from __future__ import annotations

import json
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.ops.attention import AttentionMetadata


def _mlp_spec_ln(x, w, b, eps=1e-6):
    """MLPSpeculatorLayerNorm: rms-style over the last axis + scale/shift
    (weight/bias may be None for the scale_input entry norm)."""
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt((xf * xf).mean(-1, keepdims=True) + eps)
    out = xf.astype(x.dtype)
    if w is not None:
        out = out * w + b
    return out


class MLPSpeculatorProposer:
    """Same propose() contract as MedusaProposer (no draft KV)."""

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
        self.n_predict = int(hf.get("n_predict",
                                    spec_config.num_speculative_tokens))
        self.emb_dim = int(hf.get("emb_dim", t.hidden_size))
        self.inner_dim = int(hf.get("inner_dim", 0)) or self.emb_dim
        self.vocab_size = int(hf.get("vocab_size", t.vocab_size))
        self.tie_weights = bool(hf.get("tie_weights", False))
        self.scale_input = bool(hf.get("scale_input", False))
        self.state_weight = 0.5 ** (0.5 / self.n_predict)
        self.emb_weight = math.sqrt(
            (1 - self.state_weight ** 2) * (self.inner_dim / 2))

    def get_kv_cache_spec(self, cache_dtype: str):
        return None  # no draft KV

    def load_weights(self, dtype) -> dict:
        """Checkpoint layout: per stage i ``emb.{i}.weight`` [V, inner],
        ``proj.{i}.weight`` [inner, emb|inner], ``head.{i}.weight``
        [V, inner], ``ln.{i}.{weight,bias}`` [inner]; tied checkpoints
        store only stage 0 (+ proj.1) and share the rest. An optional
        ``speculator.`` prefix is stripped (reference load_weights)."""
        from vllm_tpu.models.weight_utils import weights_iterator

        npd = np.float32 if dtype == jnp.float32 else np.dtype("bfloat16")
        K, E, N, V = (self.n_predict, self.emb_dim, self.inner_dim,
                      self.vocab_size)
        params: dict = {
            "emb": np.zeros((K, V, N), npd),
            # proj_0 maps emb_dim -> inner; later stages inner -> inner.
            # Stored separately so mismatched emb_dim keeps clean shapes.
            "proj0": np.zeros((E, N), npd),
            "proj": np.zeros((max(K - 1, 1), N, N), npd),
            "head": np.zeros((K, N, V), npd),
            "ln_w": np.zeros((K, N), npd),
            "ln_b": np.zeros((K, N), npd),
        }
        path = self.spec_config.model
        if not path or not os.path.isdir(path):
            rng = np.random.default_rng(11)
            for k in ("emb", "proj0", "proj", "head"):
                params[k] = (rng.standard_normal(params[k].shape) *
                             0.02).astype(npd)
            params["ln_w"] += 1
            return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)

        seen: dict[str, np.ndarray] = {}
        for name, w in weights_iterator(path):
            seen[name.removeprefix("speculator.")] = np.asarray(w)
        for i in range(K):
            j = i if not self.tie_weights else 0
            pj = i if not self.tie_weights else min(i, 1)
            params["emb"][i] = seen[f"emb.{j}.weight"].astype(npd)
            params["head"][i] = seen[f"head.{j}.weight"].T.astype(npd)
            params["ln_w"][i] = seen[f"ln.{j}.weight"].astype(npd)
            params["ln_b"][i] = seen[f"ln.{j}.bias"].astype(npd)
            if i == 0:
                params["proj0"] = seen["proj.0.weight"].T.astype(npd)
            else:
                params["proj"][i - 1] = \
                    seen[f"proj.{pj}.weight"].T.astype(npd)
        return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)

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
        state = target_hidden[accepted_last]  # [R, emb_dim]
        tok = emitted[jnp.arange(R),
                      jnp.maximum(num_emitted - 1, 0)]  # [R]

        if self.scale_input:
            state = _mlp_spec_ln(state, None, None) / (2 ** 0.5)
        c = jnp.asarray(self.emb_weight / self.state_weight, state.dtype)
        drafts = []
        for i in range(self.n_predict):
            z = draft_params["emb"][i][tok]  # [R, inner]
            proj = (draft_params["proj0"] if i == 0 else
                    draft_params["proj"][i - 1])
            s = state.astype(proj.dtype) @ proj + c * z
            state = jax.nn.gelu(
                _mlp_spec_ln(s, draft_params["ln_w"][i],
                             draft_params["ln_b"][i]).astype(jnp.float32),
                approximate=False).astype(s.dtype)
            logits = state @ draft_params["head"][i]
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            drafts.append(tok)
        S = self.num_speculative_tokens
        out = jnp.stack(drafts, axis=1)[:, :S]
        if S > self.n_predict:  # pad (scheduler asked for more stages)
            out = jnp.pad(out, ((0, 0), (0, S - self.n_predict)))
        return out, draft_kv
