"""Mllama (Llama 3.2 Vision) — cross-attention VLM (reference behavior
parity: vllm/model_executor/models/mllama.py).

Unlike embedding-injection VLMs, Mllama feeds vision features to
dedicated CROSS-ATTENTION decoder layers. Serving layout:

- the vision tower (tiled ViT: gated tile/positional embeddings, local
  transformer with intermediate-layer taps, gated global transformer)
  runs once per request in the runner's multimodal hook
  (``encode_image_mm``) and returns projected features in TEXT hidden
  space, one row per (valid tile x patch);
- the text model projects those features to per-cross-layer K/V and
  persists them in per-request STATE SLOTS (the same mechanism Whisper
  and BART use: ``uses_cross_embed``/``is_ssm``); self-attention layers
  use the ordinary paged KV cache;
- text-only requests mask the cross-attention contribution and the
  cross-layer MLP to zero (the reference's
  full_text_row_masked_out_mask), so mixed image/text batches serve
  together.

The image placeholder token is NOT expanded (vision tokens never enter
the embedding stream)."""

from __future__ import annotations

import math
from types import SimpleNamespace

import numpy as np

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import (FullAttentionSpec,
                                              KVCacheSpec, MambaSpec)
from vllm_tpu.models.llama import _np_dtype
from vllm_tpu.ops.attention import AttentionMetadata, attention, \
    write_kv_cache
from vllm_tpu.ops.layernorm import rms_norm
from vllm_tpu.ops.rotary import RopeConfig, apply_rope, compute_inv_freq


def _ln(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu)**2).mean(-1, keepdims=True)
    return ((x - mu) / jnp.sqrt(var + eps)) * w + b


class MllamaForConditionalGeneration:

    is_ssm = True  # per-request cross-KV (+length) state slots
    uses_cross_embed = True

    def __init__(self, model_config: ModelConfig) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        tc, vc = hf.text_config, hf.vision_config
        self.dtype = jnp.bfloat16 if model_config.dtype == "bfloat16" \
            else jnp.float32

        # ------- text
        self.H = tc.hidden_size
        self.L = tc.num_hidden_layers
        self.cross_layers = sorted(int(i) for i in
                                   tc.cross_attention_layers)
        self._cross_index = {li: ci for ci, li in
                             enumerate(self.cross_layers)}
        self.nq = tc.num_attention_heads
        self.nk = tc.num_key_value_heads
        self.d = self.H // self.nq
        self.I = tc.intermediate_size
        self.eps = float(tc.rms_norm_eps)
        self.V = tc.vocab_size
        self.scale = self.d**-0.5
        self.rope = RopeConfig.from_hf_config(tc, self.d)
        self.inv_freq, self.rope_mscale = compute_inv_freq(self.rope)
        self.image_token_index = int(getattr(hf, "image_token_index",
                                             None) or 128256)

        # ------- vision
        self.v_hidden = vc.hidden_size
        self.v_layers = vc.num_hidden_layers
        self.v_global_layers = vc.num_global_layers
        self.v_heads = vc.attention_heads
        self.v_inter = vc.intermediate_size
        self.v_patch = vc.patch_size
        self.v_tiles = vc.max_num_tiles
        self.v_np = (vc.image_size // vc.patch_size)**2 + 1
        self.v_eps = float(getattr(vc, "norm_eps", 1e-5))
        self.v_interm = [int(i) for i in vc.intermediate_layers_indices]
        self.v_out_dim = int(getattr(
            vc, "vision_output_dim",
            self.v_hidden * (1 + len(self.v_interm))))
        self.v_ar_ids = int(getattr(vc, "max_aspect_ratio_id", 8)) + 1

        self.args = SimpleNamespace(
            vocab_size=self.V,
            hidden_size=self.H,
            max_position=int(getattr(tc, "max_position_embeddings",
                                     131072)),
            max_source_positions=self.v_tiles * self.v_np,
        )

    # --------------------------------------------------------- vision

    def _vit_layer(self, lp, x, bias, gates=None):
        """One (optionally gated) ViT block over [T, D]."""
        T = x.shape[0]
        nh = self.v_heads
        hd = self.v_hidden // nh
        h = _ln(x, lp["ln1_w"], lp["ln1_b"], self.v_eps)
        q = (h @ lp["q_w"]).reshape(T, nh, hd)
        k = (h @ lp["k_w"]).reshape(T, nh, hd)
        v = (h @ lp["v_w"]).reshape(T, nh, hd)
        s = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) / math.sqrt(hd)
        s = s + bias  # [1, 1, T] additive tile-validity mask
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", p,
                       v.astype(jnp.float32)).astype(x.dtype)
        o = o.reshape(T, nh * hd) @ lp["o_w"]
        if gates is not None:
            o = jnp.tanh(gates[0]) * o
        x = x + o
        h = _ln(x, lp["ln2_w"], lp["ln2_b"], self.v_eps)
        h = jax.nn.gelu((h @ lp["fc1_w"] + lp["fc1_b"]).astype(
            jnp.float32), approximate=False).astype(x.dtype)
        h = h @ lp["fc2_w"] + lp["fc2_b"]
        if gates is not None:
            h = jnp.tanh(gates[1]) * h
        return x + h

    def encode_image_mm(self, params, mm_inputs: dict) -> np.ndarray:
        """[media, tiles, C, H, W] (+aspect ids/mask) -> projected
        features [sum(valid_tiles) * num_patches, text_hidden]."""
        vp = params["vision"]
        pv = np.asarray(mm_inputs["pixel_values"], np.float32)
        while pv.ndim > 5:
            pv = pv[0]
        if pv.ndim == 4:  # [tiles, C, H, W] single image
            pv = pv[None]
        ar_ids = np.asarray(mm_inputs.get("aspect_ratio_ids", [[1]]),
                            np.int32).reshape(-1)
        ar_mask = np.asarray(
            mm_inputs.get("aspect_ratio_mask",
                          np.ones(pv.shape[:2], np.int32)),
            np.int32).reshape(pv.shape[0], pv.shape[1])
        media, tiles, C, Hpx, Wpx = pv.shape
        P = self.v_patch
        hh, ww = Hpx // P, Wpx // P
        D = self.v_hidden
        npp = self.v_np

        outs = []
        for m in range(media):
            x = jnp.asarray(pv[m]).reshape(tiles, C, hh, P, ww, P)
            x = x.transpose(0, 2, 4, 1, 3, 5).reshape(
                tiles, hh * ww, C * P * P)
            x = x.astype(vp["patch_w"].dtype) @ vp["patch_w"]
            # gated pre-tile embedding
            pre = vp["pre_tile_emb"][ar_ids[m]].reshape(tiles, 1, D)
            x = x + jnp.tanh(vp["pre_tile_gate"]) * pre
            # class token
            cls = jnp.broadcast_to(vp["class_emb"], (tiles, 1, D))
            x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)
            # gated positional embeddings
            g = jnp.tanh(vp["pos_gate"])
            x = x + (1 - g) * vp["pos_emb"][None]
            x = x + g * vp["tile_pos_emb"][ar_ids[m]].reshape(
                tiles, npp, D)
            x = _ln(x, vp["ln_pre_w"], vp["ln_pre_b"], 1e-5)

            # HF pads each tile's patch run to a multiple of 8 with
            # ZERO tokens and only masks (query, key) pairs where BOTH
            # are invalid — so valid queries DO attend the pads (each
            # contributes exp(0) to the softmax) and the pads evolve
            # through the layers like real tokens. Replicate exactly.
            pad = (-npp) % 8
            np8 = npp + pad
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            T = tiles * np8
            x = x.reshape(T, D)
            tile_valid = jnp.repeat(jnp.asarray(ar_mask[m]) > 0, np8)
            pos_valid = jnp.tile(jnp.arange(np8) < npp, tiles)
            inv = ~(tile_valid & pos_valid)
            bias = jnp.where(inv[:, None] & inv[None, :], -1e30,
                             0.0)[None]

            interm = []
            for li in range(self.v_layers):
                x = self._vit_layer(vp["layers"][li], x, bias)
                if li in self.v_interm:
                    interm.append(x)
            x = _ln(x, vp["ln_post_w"], vp["ln_post_b"], 1e-5)
            x = x.reshape(tiles, np8, D)
            post = vp["post_tile_emb"][ar_ids[m]].reshape(tiles, 1, D)
            x = x + jnp.tanh(vp["post_tile_gate"]) * post
            x = x.reshape(T, D)
            for li in range(self.v_global_layers):
                lp = vp["global_layers"][li]
                x = self._vit_layer(lp, x, bias,
                                    gates=(lp["gate_attn"],
                                           lp["gate_ffn"]))
            # drop the pads, then concat [global output, intermediate
            # taps]; taps are stacked d-major (torch stack(-1), flatten)
            x = x.reshape(tiles, np8, D)[:, :npp].reshape(
                tiles * npp, D)
            interm = [t.reshape(tiles, np8, D)[:, :npp].reshape(
                tiles * npp, D) for t in interm]
            rest = jnp.stack(interm, axis=-1).reshape(tiles * npp, -1)
            feats = jnp.concatenate([x, rest], axis=-1)
            proj = feats.astype(params["projector"]["w"].dtype) @ \
                params["projector"]["w"] + params["projector"]["b"]
            proj = proj.reshape(tiles, npp, -1)
            keep = np.nonzero(ar_mask[m])[0]
            outs.append(np.asarray(proj[keep].reshape(
                len(keep) * npp, -1), np.float32))
        return np.concatenate(outs, axis=0)

    # --------------------------------------------------------- states

    def init_states(self, num_slots: int):
        T_src = self.args.max_source_positions
        cross_kv = jnp.zeros((len(self.cross_layers), num_slots + 1,
                              T_src, 2 * self.nk, self.d), self.dtype)
        cross_len = jnp.zeros((num_slots + 1,), jnp.int32)
        return (cross_kv, cross_len)

    def get_kv_cache_specs(self, block_size: int,
                           cache_dtype: str) -> dict[str, KVCacheSpec]:
        el = 2 if self.dtype == jnp.bfloat16 else 4
        n_self = self.L - len(self.cross_layers)
        specs: dict[str, KVCacheSpec] = {
            f"layers.{i}": FullAttentionSpec(
                block_size=block_size, num_kv_heads=self.nk,
                head_size=self.d, dtype=cache_dtype)
            for i in range(n_self)
        }
        cross_bytes = (len(self.cross_layers) *
                       self.args.max_source_positions * 2 * self.nk *
                       self.d * el)
        specs["cross_kv"] = MambaSpec(block_size=block_size,
                                      state_size_bytes=cross_bytes + 4)
        return specs

    # --------------------------------------------------------- forward

    def embed(self, params, input_ids):
        return params["embed"][input_ids]

    def forward(self, params, input_ids, kv_caches,
                metadata: AttentionMetadata, lora=None,
                embed_override=None, cross_embed=None):
        T = input_ids.shape[0]
        nq, nk, d, eps = self.nq, self.nk, self.d, self.eps
        g = nq // nk
        ssm_gi = next(i for i, c in enumerate(kv_caches)
                      if isinstance(c, tuple))
        attn_gi = next(i for i, c in enumerate(kv_caches)
                       if not isinstance(c, tuple))
        cross_kv, cross_len = kv_caches[ssm_gi]
        self_kv = kv_caches[attn_gi]
        num_slots = cross_kv.shape[1] - 1
        T_src = cross_kv.shape[2]

        if cross_embed is not None:
            slots, embeds, lens = cross_embed
            embeds = embeds.astype(self.dtype)
            safe = jnp.minimum(slots, num_slots)
            cross_len = cross_len.at[safe].set(lens)
            B = embeds.shape[0]
            for ci, li in enumerate(self.cross_layers):
                lp = params["layers"][li]
                k = (embeds @ lp["xk_w"]).reshape(B, -1, nk, d)
                k = rms_norm(k, lp["k_norm"], eps)
                v = (embeds @ lp["xv_w"]).reshape(B, -1, nk, d)
                kv = jnp.concatenate([k, v], axis=2)  # [B, Ts, 2nk, d]
                cross_kv = cross_kv.at[ci, safe].set(
                    kv.astype(cross_kv.dtype))

        # token -> request state slot (for gathering cross K/V)
        R = metadata.seq_lens.shape[0]
        token_ids = jnp.arange(T, dtype=jnp.int32)
        token_req = jnp.clip(
            jnp.searchsorted(metadata.query_start_loc, token_ids,
                             side="right") - 1, 0, R - 1)
        token_slot = (metadata.state_slots[token_req]
                      if metadata.state_slots is not None else token_req)
        token_slot = jnp.minimum(token_slot, num_slots)
        tok_len = cross_len[token_slot]  # [T]
        row_live = (tok_len > 0)[:, None]  # full_text_row_masked_out

        x = self.embed(params, input_ids)
        if embed_override is not None:
            idx, vecs = embed_override
            ext = jnp.concatenate(
                [x, jnp.zeros((1, x.shape[1]), x.dtype)])
            x = ext.at[idx].set(vecs.astype(x.dtype))[:x.shape[0]]

        si = 0
        for li in range(self.L):
            lp = params["layers"][li]
            if li in self._cross_index:
                ci = self._cross_index[li]
                h = rms_norm(x, lp["input_ln"], eps)
                q = (h @ lp["xq_w"]).reshape(T, nq, d)
                q = rms_norm(q, lp["q_norm"], eps)
                ckv = cross_kv[ci][token_slot]  # [T, Ts, 2nk, d]
                ck = ckv[:, :, :nk].astype(jnp.float32)
                cv = ckv[:, :, nk:].astype(jnp.float32)
                qg = q.reshape(T, nk, g, d).astype(jnp.float32)
                s = jnp.einsum("tkgd,tskd->tkgs", qg * self.scale, ck)
                smask = (jnp.arange(T_src)[None, :] <
                         tok_len[:, None])[:, None, None, :]
                s = jnp.where(smask, s, -1e30)
                p = jax.nn.softmax(s, axis=-1)
                o = jnp.einsum("tkgs,tskd->tkgd", p, cv).astype(x.dtype)
                o = o.reshape(T, nq * d) @ lp["xo_w"]
                o = jnp.where(row_live, o, 0)
                x = x + jnp.tanh(lp["gate_attn"]) * o
                h = rms_norm(x, lp["post_ln"], eps)
                act = jax.nn.silu((h @ lp["gate_w"]).astype(
                    jnp.float32)).astype(x.dtype) * (h @ lp["up_w"])
                mlp = act @ lp["down_w"]
                mlp = jnp.where(row_live, mlp, 0)
                x = x + jnp.tanh(lp["gate_mlp"]) * mlp
            else:
                h = rms_norm(x, lp["input_ln"], eps)
                q = (h @ lp["q_w"]).reshape(T, nq, d)
                k = (h @ lp["k_w"]).reshape(T, nk, d)
                v = (h @ lp["v_w"]).reshape(T, nk, d)
                q, k = apply_rope(q, k, metadata.positions,
                                  self.inv_freq, self.rope.is_neox_style,
                                  self.rope_mscale)
                self_kv = write_kv_cache(self_kv, k, v,
                                         metadata.slot_mapping, layer=si)
                o = attention(q, self_kv, metadata, self.scale, layer=si)
                x = x + o.reshape(T, nq * d) @ lp["o_w"]
                h = rms_norm(x, lp["post_ln"], eps)
                act = jax.nn.silu((h @ lp["gate_w"]).astype(
                    jnp.float32)).astype(x.dtype) * (h @ lp["up_w"])
                x = x + act @ lp["down_w"]
                si += 1

        x = rms_norm(x, params["final_ln"], eps)
        new_caches = [None] * len(kv_caches)
        new_caches[ssm_gi] = (cross_kv, cross_len)
        new_caches[attn_gi] = self_kv
        return x, new_caches

    def compute_logits(self, params, hidden):
        return jnp.dot(hidden,
                       params["lm_head"].T.astype(hidden.dtype))

    # --------------------------------------------------------- weights

    def _alloc(self, np_dtype) -> dict:
        H, D, I = self.H, self.v_hidden, self.I
        nq, nk, d = self.nq, self.nk, self.d
        vI = self.v_inter
        P = self.v_patch

        def vit_layer(gated):
            lp = {
                "ln1_w": np.ones(D, np_dtype),
                "ln1_b": np.zeros(D, np_dtype),
                "ln2_w": np.ones(D, np_dtype),
                "ln2_b": np.zeros(D, np_dtype),
                "q_w": np.zeros((D, D), np_dtype),
                "k_w": np.zeros((D, D), np_dtype),
                "v_w": np.zeros((D, D), np_dtype),
                "o_w": np.zeros((D, D), np_dtype),
                "fc1_w": np.zeros((D, vI), np_dtype),
                "fc1_b": np.zeros(vI, np_dtype),
                "fc2_w": np.zeros((vI, D), np_dtype),
                "fc2_b": np.zeros(D, np_dtype),
            }
            if gated:
                lp["gate_attn"] = np.zeros(1, np_dtype)
                lp["gate_ffn"] = np.zeros(1, np_dtype)
            return lp

        layers = []
        for li in range(self.L):
            if li in self._cross_index:
                layers.append({
                    "input_ln": np.ones(H, np_dtype),
                    "post_ln": np.ones(H, np_dtype),
                    "xq_w": np.zeros((H, nq * d), np_dtype),
                    "xk_w": np.zeros((H, nk * d), np_dtype),
                    "xv_w": np.zeros((H, nk * d), np_dtype),
                    "xo_w": np.zeros((nq * d, H), np_dtype),
                    "q_norm": np.ones(d, np_dtype),
                    "k_norm": np.ones(d, np_dtype),
                    "gate_attn": np.zeros(1, np_dtype),
                    "gate_mlp": np.zeros(1, np_dtype),
                    "gate_w": np.zeros((H, I), np_dtype),
                    "up_w": np.zeros((H, I), np_dtype),
                    "down_w": np.zeros((I, H), np_dtype),
                })
            else:
                layers.append({
                    "input_ln": np.ones(H, np_dtype),
                    "post_ln": np.ones(H, np_dtype),
                    "q_w": np.zeros((H, nq * d), np_dtype),
                    "k_w": np.zeros((H, nk * d), np_dtype),
                    "v_w": np.zeros((H, nk * d), np_dtype),
                    "o_w": np.zeros((nq * d, H), np_dtype),
                    "gate_w": np.zeros((H, I), np_dtype),
                    "up_w": np.zeros((H, I), np_dtype),
                    "down_w": np.zeros((I, H), np_dtype),
                })
        return {
            "embed": np.zeros((self.V + 8, H), np_dtype),
            "final_ln": np.ones(H, np_dtype),
            "lm_head": np.zeros((self.V, H), np_dtype),
            "layers": layers,
            "projector": {
                "w": np.zeros((self.v_out_dim, H), np_dtype),
                "b": np.zeros(H, np_dtype),
            },
            "vision": {
                "patch_w": np.zeros((3 * P * P, D), np_dtype),
                "class_emb": np.zeros(D, np_dtype),
                "pos_emb": np.zeros((self.v_np, D), np_dtype),
                "pos_gate": np.zeros(1, np_dtype),
                "tile_pos_emb": np.zeros(
                    (self.v_ar_ids, self.v_tiles * self.v_np * D),
                    np_dtype),
                "pre_tile_emb": np.zeros(
                    (self.v_ar_ids, self.v_tiles * D), np_dtype),
                "pre_tile_gate": np.zeros(1, np_dtype),
                "post_tile_emb": np.zeros(
                    (self.v_ar_ids, self.v_tiles * D), np_dtype),
                "post_tile_gate": np.zeros(1, np_dtype),
                "ln_pre_w": np.ones(D, np_dtype),
                "ln_pre_b": np.zeros(D, np_dtype),
                "ln_post_w": np.ones(D, np_dtype),
                "ln_post_b": np.zeros(D, np_dtype),
                "layers": [vit_layer(False)
                           for _ in range(self.v_layers)],
                "global_layers": [vit_layer(True)
                                  for _ in range(self.v_global_layers)],
            },
        }

    _VIT_MAP = {
        "input_layernorm.weight": ("ln1_w", False),
        "input_layernorm.bias": ("ln1_b", False),
        "post_attention_layernorm.weight": ("ln2_w", False),
        "post_attention_layernorm.bias": ("ln2_b", False),
        "self_attn.q_proj.weight": ("q_w", True),
        "self_attn.k_proj.weight": ("k_w", True),
        "self_attn.v_proj.weight": ("v_w", True),
        "self_attn.o_proj.weight": ("o_w", True),
        "mlp.fc1.weight": ("fc1_w", True),
        "mlp.fc1.bias": ("fc1_b", False),
        "mlp.fc2.weight": ("fc2_w", True),
        "mlp.fc2.bias": ("fc2_b", False),
        "gate_attn": ("gate_attn", False),
        "gate_ffn": ("gate_ffn", False),
    }

    _TEXT_SELF_MAP = {
        "input_layernorm.weight": ("input_ln", False),
        "post_attention_layernorm.weight": ("post_ln", False),
        "self_attn.q_proj.weight": ("q_w", True),
        "self_attn.k_proj.weight": ("k_w", True),
        "self_attn.v_proj.weight": ("v_w", True),
        "self_attn.o_proj.weight": ("o_w", True),
        "mlp.gate_proj.weight": ("gate_w", True),
        "mlp.up_proj.weight": ("up_w", True),
        "mlp.down_proj.weight": ("down_w", True),
    }

    _TEXT_CROSS_MAP = {
        "input_layernorm.weight": ("input_ln", False),
        "post_attention_layernorm.weight": ("post_ln", False),
        "cross_attn.q_proj.weight": ("xq_w", True),
        "cross_attn.k_proj.weight": ("xk_w", True),
        "cross_attn.v_proj.weight": ("xv_w", True),
        "cross_attn.o_proj.weight": ("xo_w", True),
        "cross_attn.q_norm.weight": ("q_norm", False),
        "cross_attn.k_norm.weight": ("k_norm", False),
        "cross_attn_attn_gate": ("gate_attn", False),
        "cross_attn_mlp_gate": ("gate_mlp", False),
        "mlp.gate_proj.weight": ("gate_w", True),
        "mlp.up_proj.weight": ("up_w", True),
        "mlp.down_proj.weight": ("down_w", True),
    }

    def load_weights(self, weights_iter) -> dict:
        np_dtype = _np_dtype(self.model_config.dtype)
        params = self._alloc(np_dtype)
        D = self.v_hidden
        vis = params["vision"]
        seen_lm_head = False
        for name, w in weights_iter:
            w = np.asarray(w)
            name = name.removeprefix("model.")
            if name.startswith("vision_model."):
                sub = name[len("vision_model."):]
                if sub == "patch_embedding.weight":
                    vis["patch_w"][...] = w.reshape(D, -1).T.astype(
                        np_dtype)
                elif sub == "class_embedding":
                    vis["class_emb"][...] = w.astype(np_dtype)
                elif sub == "gated_positional_embedding.embedding":
                    vis["pos_emb"][...] = w.astype(np_dtype)
                elif sub == "gated_positional_embedding.gate":
                    vis["pos_gate"][...] = w.reshape(1).astype(np_dtype)
                elif sub == ("gated_positional_embedding."
                             "tile_embedding.weight"):
                    vis["tile_pos_emb"][...] = w.astype(np_dtype)
                elif sub == ("pre_tile_positional_embedding."
                             "embedding.weight"):
                    vis["pre_tile_emb"][...] = w.astype(np_dtype)
                elif sub == "pre_tile_positional_embedding.gate":
                    vis["pre_tile_gate"][...] = w.reshape(1).astype(
                        np_dtype)
                elif sub == ("post_tile_positional_embedding."
                             "embedding.weight"):
                    vis["post_tile_emb"][...] = w.astype(np_dtype)
                elif sub == "post_tile_positional_embedding.gate":
                    vis["post_tile_gate"][...] = w.reshape(1).astype(
                        np_dtype)
                elif sub == "layernorm_pre.weight":
                    vis["ln_pre_w"][...] = w.astype(np_dtype)
                elif sub == "layernorm_pre.bias":
                    vis["ln_pre_b"][...] = w.astype(np_dtype)
                elif sub == "layernorm_post.weight":
                    vis["ln_post_w"][...] = w.astype(np_dtype)
                elif sub == "layernorm_post.bias":
                    vis["ln_post_b"][...] = w.astype(np_dtype)
                elif sub.startswith(("transformer.layers.",
                                     "global_transformer.layers.")):
                    which = ("layers" if sub.startswith("transformer.")
                             else "global_layers")
                    parts = sub.split(".")
                    li = int(parts[2])
                    leaf = ".".join(parts[3:])
                    if leaf in self._VIT_MAP:
                        key, transpose = self._VIT_MAP[leaf]
                        vis[which][li][key][...] = \
                            (w.T if transpose else
                             w.reshape(vis[which][li][key].shape)) \
                            .astype(np_dtype)
                continue
            if name == "multi_modal_projector.weight":
                params["projector"]["w"][...] = w.T.astype(np_dtype)
                continue
            if name == "multi_modal_projector.bias":
                params["projector"]["b"][...] = w.astype(np_dtype)
                continue
            if name.startswith("language_model."):
                sub = name[len("language_model."):]
                sub = sub.removeprefix("model.")
                if sub == "embed_tokens.weight":
                    params["embed"][:w.shape[0]] = w.astype(np_dtype)
                elif sub == "norm.weight":
                    params["final_ln"][...] = w.astype(np_dtype)
                elif sub == "lm_head.weight":
                    params["lm_head"][...] = w.astype(np_dtype)
                    seen_lm_head = True
                elif sub.startswith("layers."):
                    parts = sub.split(".")
                    li = int(parts[1])
                    leaf = ".".join(parts[2:])
                    m = (self._TEXT_CROSS_MAP if li in self._cross_index
                         else self._TEXT_SELF_MAP)
                    if leaf in m:
                        key, transpose = m[leaf]
                        dst = params["layers"][li][key]
                        dst[...] = (w.T if transpose else
                                    w.reshape(dst.shape)).astype(np_dtype)
                continue
            if name == "lm_head.weight":
                params["lm_head"][...] = w.astype(np_dtype)
                seen_lm_head = True
        if not seen_lm_head:
            params["lm_head"][...] = params["embed"][:self.V]
        return params

    def init_dummy_params(self, seed: int = 0) -> dict:
        rng = np.random.default_rng(seed)
        params = self._alloc(np.float32)

        def fill(leaf):
            if getattr(leaf, "ndim", 0) >= 2:
                return (rng.standard_normal(leaf.shape) * 0.4 /
                        np.sqrt(leaf.shape[-1])).astype(np.float32)
            return leaf

        return jax.tree.map(fill, params)
