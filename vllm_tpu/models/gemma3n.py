"""Gemma 3n — Google's AltUp / Laurel / per-layer-embedding LM
(reference behavior parity: vllm/model_executor/models/gemma3n.py
Gemma3nForConditionalGeneration — text-only, like the reference, which
skips the audio/vision towers at load: gemma3n.py:805).

Per layer (gemma3n.py:455-519):
  predictions = altup.predict(h4)            # 4-way alternating updates
  act = input_ln(predictions[0]);  laurel = x + ln(x @ A @ B)
  attn = post_attn_ln(attention(act))        # per-head q/k norm,
                                             # UNWEIGHTED v norm, scale=1
  attn_laurel = (predictions[0] + attn + laurel(act)) / sqrt(2)
  ffw = post_ffw_ln(mlp(pre_ffw_ln(attn_laurel)))  # gaussian-topk
                                             # sparse gelu on early layers
  corrected = altup.correct(predictions, attn_laurel + ffw)
  gated = gelu(corrected[0]*scale @ W_gate) * per_layer_input[li]
  corrected[1:] += post_pl_ln(gated @ W_proj)

KV sharing: the last ``num_kv_shared_layers`` layers reuse the KV cache
of the last non-shared layer of the same attention type and never write
their own (gemma3n.py:309). Magnitude-matched altup embed/unembed with
eps 1e-5 follows HF (modeling_gemma3n.py:1650 — the reference's
finfo-min eps is dead code), as does per_layer_projection_scale =
H**-0.5 (modeling_gemma3n.py:1563)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import FullAttentionSpec, KVCacheSpec
from vllm_tpu.ops.attention import attention, write_kv_cache
from vllm_tpu.ops.layernorm import rms_norm
from vllm_tpu.ops.linear import embedding_lookup, linear
from vllm_tpu.ops.rotary import RopeConfig, apply_rope, compute_inv_freq

# icdf of the standard normal at the target sparsity is precomputed for
# the only value shipped (0.95); scipy is not a dependency
_ICDF = {0.95: 1.6448536269514722}


def _gelu_tanh(x):
    return jax.nn.gelu(x.astype(jnp.float32),
                       approximate=True).astype(x.dtype)


class Gemma3nForConditionalGeneration:

    def __init__(self, model_config: ModelConfig) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        t = getattr(hf, "text_config", None) or hf
        self.hf = t
        self.dtype = jnp.bfloat16 if model_config.dtype == "bfloat16" \
            else jnp.float32
        self.H = int(t.hidden_size)
        self.L = int(t.num_hidden_layers)
        self.nq = int(t.num_attention_heads)
        self.nk = int(t.num_key_value_heads)
        self.d = int(getattr(t, "head_dim", self.H // self.nq))
        self.inter = list(t.intermediate_size) if isinstance(
            t.intermediate_size, (list, tuple)) \
            else [int(t.intermediate_size)] * self.L
        self.eps = float(t.rms_norm_eps)
        self.vocab = int(t.vocab_size)
        self.vocab_pl = int(t.vocab_size_per_layer_input)
        self.Hp = int(t.hidden_size_per_layer_input)
        self.n_altup = int(t.altup_num_inputs)
        self.active = int(t.altup_active_idx)
        self.laurel_rank = int(t.laurel_rank)
        self.sparsity = list(getattr(t, "activation_sparsity_pattern",
                                     None) or [0.0] * self.L)
        self.layer_types = list(t.layer_types)
        self.window = int(t.sliding_window)
        self.num_shared = int(getattr(t, "num_kv_shared_layers", 0))
        self.soft_cap = getattr(t, "final_logit_softcapping", None)

        rope = RopeConfig.from_hf_config(t, self.d)
        self.inv_freq, self.rope_mscale = compute_inv_freq(rope)
        local = RopeConfig(head_size=self.d, rotary_dim=rope.rotary_dim,
                           max_position=rope.max_position,
                           base=float(getattr(t, "rope_local_base_freq",
                                              10000.0)), scaling=None)
        self.local_inv_freq, _ = compute_inv_freq(local)

        # kv ownership: shared layers point at the last non-shared
        # layer of the same type; owners get cache indices in order
        first_shared = self.L - self.num_shared
        owners = list(range(first_shared))
        self.cache_index = {li: i for i, li in enumerate(owners)}
        self.kv_target = {}
        for li in range(first_shared, self.L):
            prev = [i for i in owners
                    if self.layer_types[i] == self.layer_types[li]]
            self.kv_target[li] = self.cache_index[prev[-1]]

    # ------------------------------------------------------------- helpers

    def _sparse_gelu_mul(self, gate_up, li):
        gate, up = jnp.split(gate_up, 2, axis=-1)
        sp = float(self.sparsity[li])
        if sp > 0.0:
            g = gate.astype(jnp.float32)
            mean = g.mean(-1, keepdims=True)
            std = jnp.sqrt(((g - mean) ** 2).mean(-1, keepdims=True))
            mult = _ICDF.get(sp) or math.sqrt(2) * _erfinv(2 * sp - 1)
            gate = jax.nn.relu(g - (mean + std * mult)).astype(gate.dtype)
        return _gelu_tanh(gate) * up

    def _modalities(self, lp, x):
        r = rms_norm(x, lp["router_norm"], self.eps) * (1.0 / self.H)
        return jnp.tanh(linear(r, lp["router"]).astype(jnp.float32)
                        ).astype(x.dtype)

    def _renorm(self, x, target_mag):
        mag = jnp.sqrt(jnp.maximum(
            jnp.mean(x.astype(jnp.float32) ** 2, -1, keepdims=True),
            1e-5))
        return (x.astype(jnp.float32) * target_mag / mag).astype(x.dtype)

    # ------------------------------------------------------------- forward

    def embed(self, params, input_ids):
        x = embedding_lookup(input_ids, params["embed"]["w"])
        return x * jnp.asarray(math.sqrt(self.H), x.dtype)

    def forward(self, params, input_ids, kv_caches, metadata, lora=None,
                embed_override=None):
        T = input_ids.shape[0]
        kv = kv_caches[0]
        nq, nk, d = self.nq, self.nk, self.d

        x0 = self.embed(params, input_ids)
        if embed_override is not None:
            idx, vecs = embed_override
            x0 = x0.at[idx].set(vecs.astype(x0.dtype))

        # per-layer inputs [T, L, Hp]
        pl_ids = jnp.where(
            (input_ids >= 0) & (input_ids < self.vocab_pl), input_ids, 0)
        pl_emb = embedding_lookup(pl_ids, params["embed_pl"]) * \
            jnp.asarray(math.sqrt(self.Hp), x0.dtype)
        pl_emb = pl_emb.reshape(T, self.L, self.Hp)
        pl_proj = (linear(x0, params["plm_proj"]) *
                   jnp.asarray(self.H ** -0.5, x0.dtype)
                   ).reshape(T, self.L, self.Hp)
        pl_proj = rms_norm(pl_proj, params["pl_proj_norm"], self.eps)
        per_layer = (pl_proj + pl_emb) * jnp.asarray(
            1 / math.sqrt(2), x0.dtype)

        # altup embed: magnitude-matched projections of x0
        target = jnp.sqrt(jnp.mean(x0.astype(jnp.float32) ** 2, -1,
                                   keepdims=True))
        hs = [x0]
        for i in range(1, self.n_altup):
            hs.append(self._renorm(
                x0 @ jnp.asarray(params["altup_proj"][i - 1]), target))
        h = jnp.stack(hs, axis=0)  # [A, T, H]

        for li in range(self.L):
            lp = jax.tree.map(jnp.asarray, params["layers"][li])
            sliding = self.layer_types[li] == "sliding_attention"
            inv_freq = self.local_inv_freq if sliding else self.inv_freq

            # altup predict
            mod = self._modalities(lp, h[self.active])
            coefs = linear(mod, lp["pred_coef"]).reshape(
                T, self.n_altup, self.n_altup)
            predictions = jnp.einsum("ith,tji->jth", h, coefs) + h
            active = predictions[self.active]
            act_n = rms_norm(active, lp["input_ln"], self.eps)

            laurel = act_n + rms_norm(
                linear(linear(act_n, lp["laurel_A"]), lp["laurel_B"]),
                lp["laurel_norm"], self.eps)

            # attention (q/k per-head norm, unweighted v norm, scale=1)
            qkv = linear(act_n, lp["qkv"])
            q, k, v = jnp.split(qkv, [nq * d, (nq + nk) * d], axis=-1)
            q = rms_norm(q.reshape(T, nq, d), lp["q_norm"], self.eps)
            k = rms_norm(k.reshape(T, nk, d), lp["k_norm"], self.eps)
            v = v.reshape(T, nk, d)
            vf = v.astype(jnp.float32)
            v = (vf * jax.lax.rsqrt(
                jnp.mean(vf * vf, -1, keepdims=True) + self.eps)
                 ).astype(v.dtype)
            q, k = apply_rope(q, k, metadata.positions, inv_freq, True,
                              self.rope_mscale)
            if li in self.kv_target:
                ci = self.kv_target[li]  # shared: read-only
            else:
                ci = self.cache_index[li]
                kv = write_kv_cache(kv, k, v, metadata.slot_mapping,
                                    layer=ci)
            attn = attention(q, kv, metadata, 1.0, layer=ci,
                             sliding_window=self.window if sliding
                             else None)
            attn = linear(attn.reshape(T, nq * d), lp["o"])
            attn = rms_norm(attn, lp["post_attn_ln"], self.eps)
            attn_laurel = (active + attn + laurel) * jnp.asarray(
                1 / math.sqrt(2), x0.dtype)

            # mlp
            h2 = rms_norm(attn_laurel, lp["pre_ffw_ln"], self.eps)
            ffw = linear(self._sparse_gelu_mul(
                linear(h2, lp["gate_up"]), li), lp["down"])
            ffw = rms_norm(ffw, lp["post_ffw_ln"], self.eps)
            activated = attn_laurel + ffw

            # altup correct
            mod = self._modalities(lp, activated)
            ccoefs = linear(mod, lp["corr_coef"]).astype(jnp.float32) \
                + 1.0
            innovation = activated - predictions[self.active]
            corrected = predictions + (
                innovation[None] * ccoefs.T[:, :, None]).astype(h.dtype)

            # per-layer input mix into the passive lanes
            first = corrected[self.active] * jnp.asarray(
                lp["correct_scale"], x0.dtype)
            gated = _gelu_tanh(linear(first, lp["pl_gate"])) * \
                per_layer[:, li]
            gated = rms_norm(linear(gated, lp["pl_proj"]),
                             lp["pl_norm"], self.eps)
            h = corrected.at[1:].add(gated[None])

        # altup unembed
        target = jnp.sqrt(jnp.mean(h[0].astype(jnp.float32) ** 2, -1,
                                   keepdims=True))
        outs = [h[0]]
        for i in range(1, self.n_altup):
            outs.append(self._renorm(
                h[i] @ jnp.asarray(params["altup_unembed"][i - 1]),
                target))
        x = jnp.mean(jnp.stack(outs, 0), axis=0)
        x = rms_norm(x, params["final_ln"], self.eps)
        return x, [kv]

    def compute_logits(self, params, hidden):
        logits = jnp.dot(hidden,
                         params["embed"]["w"].T.astype(hidden.dtype))
        if self.soft_cap:
            cap = float(self.soft_cap)
            logits = jnp.tanh(logits.astype(jnp.float32) / cap) * cap
        return logits

    # ------------------------------------------------------------ kv specs

    def get_kv_cache_specs(self, block_size: int,
                           cache_dtype: str) -> dict[str, KVCacheSpec]:
        # full-length retention for every OWNED layer (sliding is
        # enforced by the attention mask); shared layers own nothing
        return {
            f"layers.{li}": FullAttentionSpec(
                block_size=block_size, num_kv_heads=self.nk,
                head_size=self.d, dtype=cache_dtype)
            for li in self.cache_index
        }

    # ------------------------------------------------------------- weights

    def load_weights(self, weights_iter) -> dict:
        npd = np.float32 if self.dtype == jnp.float32 else np.dtype(
            "bfloat16")
        layers: list[dict] = [{} for _ in range(self.L)]
        params: dict = {
            "layers": layers,
            "altup_proj": [None] * (self.n_altup - 1),
            "altup_unembed": [None] * (self.n_altup - 1),
        }
        qkv_parts: dict[int, dict] = {}
        gu_parts: dict[int, dict] = {}
        lmap = {
            "input_layernorm.weight": "input_ln",
            "post_attention_layernorm.weight": "post_attn_ln",
            "pre_feedforward_layernorm.weight": "pre_ffw_ln",
            "post_feedforward_layernorm.weight": "post_ffw_ln",
            "self_attn.q_norm.weight": "q_norm",
            "self_attn.k_norm.weight": "k_norm",
            "laurel.post_laurel_norm.weight": "laurel_norm",
            "post_per_layer_input_norm.weight": "pl_norm",
            "altup.router_norm.weight": "router_norm",
            "altup.correct_output_scale": "correct_scale",
        }
        wmap = {
            "self_attn.o_proj.weight": "o",
            "mlp.down_proj.weight": "down",
            "laurel.linear_left.weight": "laurel_A",
            "laurel.linear_right.weight": "laurel_B",
            "per_layer_input_gate.weight": "pl_gate",
            "per_layer_projection.weight": "pl_proj",
            "altup.modality_router.weight": "router",
            "altup.prediction_coefs.weight": "pred_coef",
            "altup.correction_coefs.weight": "corr_coef",
        }
        for name, w in weights_iter:
            w = np.asarray(w)
            name = name.removeprefix("model.")
            name = name.removeprefix("language_model.")
            # HF save_pretrained re-applies its checkpoint-conversion
            # mapping inside this name ("...model." -> gets the
            # language_model infix); normalize both spellings
            name = name.replace("per_layer_model.language_model_",
                                "per_layer_model_")
            if name == "embed_tokens.weight":
                params["embed"] = {"w": w.astype(npd)}
            elif name == "embed_tokens_per_layer.weight":
                params["embed_pl"] = w.astype(npd)
            elif name == "per_layer_model_projection.weight":
                params["plm_proj"] = {"w": w.T.astype(npd)}
            elif name == "per_layer_projection_norm.weight":
                params["pl_proj_norm"] = w.astype(npd)
            elif name == "norm.weight":
                params["final_ln"] = w.astype(npd)
            elif name.startswith("altup_projections."):
                params["altup_proj"][int(name.split(".")[1])] = \
                    w.T.astype(npd)
            elif name.startswith("altup_unembed_projections."):
                params["altup_unembed"][int(name.split(".")[1])] = \
                    w.T.astype(npd)
            elif name.startswith("layers."):
                parts = name.split(".")
                li = int(parts[1])
                sub = ".".join(parts[2:])
                lp = layers[li]
                if sub in lmap:
                    lp[lmap[sub]] = w.astype(
                        np.float32 if lmap[sub] == "correct_scale"
                        else npd)
                elif sub in wmap:
                    lp[wmap[sub]] = {"w": w.T.astype(npd)}
                elif sub in ("self_attn.q_proj.weight",
                             "self_attn.k_proj.weight",
                             "self_attn.v_proj.weight"):
                    qkv_parts.setdefault(li, {})[sub.split(".")[1][0]] \
                        = w.T
                elif sub in ("mlp.gate_proj.weight",
                             "mlp.up_proj.weight"):
                    gu_parts.setdefault(li, {})[sub.split(".")[1][0]] \
                        = w.T
        for li, p in qkv_parts.items():
            layers[li]["qkv"] = {"w": np.concatenate(
                [p["q"], p["k"], p["v"]], axis=1).astype(npd)}
        for li, p in gu_parts.items():
            layers[li]["gate_up"] = {"w": np.concatenate(
                [p["g"], p["u"]], axis=1).astype(npd)}
        return params


def _erfinv(x: float) -> float:
    """Scalar inverse-erf (Winitzki approximation) for sparsity values
    outside the precomputed table."""
    a = 0.147
    ln1mx2 = math.log(1 - x * x)
    t1 = 2 / (math.pi * a) + ln1mx2 / 2
    return math.copysign(
        math.sqrt(math.sqrt(t1 * t1 - ln1mx2 / a) - t1), x)


Gemma3nForCausalLM = Gemma3nForConditionalGeneration
