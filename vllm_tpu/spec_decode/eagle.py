"""EAGLE speculative decoding — device-side draft proposer.

Reference behavior parity: vllm/v1/spec_decode/eagle.py EagleProposer +
vllm/model_executor/models/llama_eagle.py (draft = fc([embed(tok);
target_hidden]) -> llama decoder layer without input_layernorm -> logits;
token stream shifted left by one with the freshly sampled token at each
request's end; then an autoregressive loop proposes the remaining drafts
one token per request).

TPU-native design: the whole proposer is a pure function traced INTO the
runner's jitted step — catch-up pass over the ragged batch reuses the same
attention metadata/slot mapping as the target forward (draft KV mirrors
target token positions in its own paged cache), and the S-1 decode
iterations are statically unrolled single-token ragged-attention calls.
Rejected-draft positions are excluded by shrinking per-request seq_lens
(the reference compacts the batch host-side; static shapes make masking
the better fit here). Lookahead KV slots come from the scheduler
(allocate_slots(num_lookahead_tokens), kv_cache_manager.py).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.core.kv_cache_interface import FullAttentionSpec
from vllm_tpu.ops.attention import (AttentionMetadata, attention,
                                    write_kv_cache)
from vllm_tpu.ops.activation import GATED_ACTIVATIONS
from vllm_tpu.ops.layernorm import rms_norm
from vllm_tpu.ops.linear import embedding_lookup, linear, lm_head_logits
from vllm_tpu.ops.rotary import RopeConfig, apply_rope, compute_inv_freq

logger = logging.getLogger(__name__)


class EagleProposer:
    """Holds the draft layer's static config + weight loading; the
    ``propose`` method is pure/jittable."""

    def __init__(self, target_model, spec_config, cache_config) -> None:
        self.target = target_model
        self.spec_config = spec_config
        self.block_size = cache_config.block_size
        self.num_speculative_tokens = spec_config.num_speculative_tokens

        hf = None
        path = spec_config.model
        if path and os.path.isdir(path):
            cfg_file = os.path.join(path, "config.json")
            if os.path.exists(cfg_file):
                with open(cfg_file) as f:
                    raw = json.load(f)
                hf = raw.get("model", raw)  # eagle ckpts may nest
        t = target_model.args
        if hf is None:
            hf = {}
        self.hidden = int(hf.get("hidden_size", t.hidden_size))
        self.num_heads = int(hf.get("num_attention_heads", t.num_heads))
        self.num_kv_heads = int(
            hf.get("num_key_value_heads", t.num_kv_heads))
        self.head_dim = int(
            hf.get("head_dim",
                   self.hidden // self.num_heads if self.num_heads else
                   t.head_dim))
        self.inter = int(hf.get("intermediate_size", t.intermediate_size))
        self.rms_eps = float(hf.get("rms_norm_eps", t.rms_eps))
        self.act = hf.get("hidden_act", t.act)
        # rope follows the target (eagle drafts share positional scheme)
        self.inv_freq = target_model.inv_freq
        self.rope_mscale = target_model.rope_mscale
        self.is_neox = t.rope.is_neox_style
        self.scale = 1.0 / (self.head_dim ** 0.5)

    # ------------------------------------------------------------ weights

    def param_shapes(self) -> dict:
        H, I = self.hidden, self.inter
        nq, nk, d = self.num_heads, self.num_kv_heads, self.head_dim
        return {
            "fc": {"w": (2 * H, H)},
            "qkv": {"w": (H, (nq + 2 * nk) * d)},
            "o": {"w": (nq * d, H)},
            "gate_up": {"w": (H, 2 * I)},
            "down": {"w": (I, H)},
            "post_ln": (H,),
        }

    def init_dummy_params(self, seed: int = 0) -> dict:
        rng = np.random.default_rng(seed + 7)

        def mk(shape):
            if len(shape) == 1:
                return np.ones(shape, np.float32)
            return (rng.standard_normal(shape).astype(np.float32) *
                    (0.4 / np.sqrt(shape[0])))

        return jax.tree.map(mk, self.param_shapes(),
                            is_leaf=lambda x: isinstance(x, tuple))

    def load_weights(self, dtype) -> dict:
        """Stream the draft checkpoint (fc + one decoder layer); embed and
        lm_head are shared with the target (llama_eagle.py shares embed
        when PP is off)."""
        path = self.spec_config.model
        if not path or not os.path.isdir(path):
            logger.warning("eagle: no draft checkpoint at %r, "
                           "using dummy weights", path)
            params = self.init_dummy_params()
        else:
            from vllm_tpu.models.weight_utils import weights_iterator

            shapes = self.param_shapes()
            params = jax.tree.map(
                lambda s: np.zeros(s, np.float32), shapes,
                is_leaf=lambda x: isinstance(x, tuple))
            lmap = {
                "fc.weight": ("fc", True),
                "layers.0.self_attn.o_proj.weight": ("o", True),
                "layers.0.mlp.down_proj.weight": ("down", True),
                "layers.0.post_attention_layernorm.weight":
                    ("post_ln", False),
            }
            nq, nk, d = self.num_heads, self.num_kv_heads, self.head_dim
            I = self.inter
            fused = {
                "layers.0.self_attn.q_proj.weight": ("qkv", 0, nq * d),
                "layers.0.self_attn.k_proj.weight":
                    ("qkv", nq * d, nk * d),
                "layers.0.self_attn.v_proj.weight":
                    ("qkv", (nq + nk) * d, nk * d),
                "layers.0.mlp.gate_proj.weight": ("gate_up", 0, I),
                "layers.0.mlp.up_proj.weight": ("gate_up", I, I),
            }
            for name, w in weights_iterator(path):
                name = name.removeprefix("model.")
                w = np.asarray(w, np.float32)
                if name in lmap:
                    key, transpose = lmap[name]
                    w = w.T if transpose else w
                    if key in ("post_ln",):
                        params[key][...] = w
                    else:
                        params[key]["w"][...] = w
                elif name in fused:
                    key, start, length = fused[name]
                    params[key]["w"][:, start:start + length] = w.T
        return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)

    def get_kv_cache_spec(self, cache_dtype: str) -> FullAttentionSpec:
        return FullAttentionSpec(block_size=self.block_size,
                                 num_kv_heads=self.num_kv_heads,
                                 head_size=self.head_dim,
                                 dtype=cache_dtype)

    # ------------------------------------------------------------ forward

    def _layer(self, dp: dict, x: jnp.ndarray, kv: jnp.ndarray,
               metadata: AttentionMetadata) -> tuple[jnp.ndarray,
                                                     jnp.ndarray]:
        # kv is the full [1, N, 2K, page, D] draft stack (layer 0)
        """EAGLE decoder layer: no input_layernorm (llama_eagle.py:38),
        no final norm — returns hidden + residual."""
        nq, nk, d = self.num_heads, self.num_kv_heads, self.head_dim
        T = x.shape[0]
        qkv = linear(x, dp["qkv"])
        q, k, v = jnp.split(qkv, [nq * d, (nq + nk) * d], axis=-1)
        q = q.reshape(T, nq, d)
        k = k.reshape(T, nk, d)
        v = v.reshape(T, nk, d)
        q, k = apply_rope(q, k, metadata.positions, self.inv_freq,
                          self.is_neox, self.rope_mscale)
        kv = write_kv_cache(kv, k, v, metadata.slot_mapping, layer=0)
        attn = attention(q, kv, metadata, self.scale, layer=0)
        x = x + linear(attn.reshape(T, nq * d), dp["o"])
        h = rms_norm(x, dp["post_ln"], self.rms_eps)
        gate_up = linear(h, dp["gate_up"])
        x = x + linear(GATED_ACTIVATIONS[self.act](gate_up), dp["down"])
        return x, kv

    def _fuse(self, draft_params: dict, embed: jnp.ndarray,
              hidden: jnp.ndarray) -> jnp.ndarray:
        """Combine (token embedding, previous hidden) into the draft
        layer input. EAGLE: raw concat -> fc (llama_eagle.py:44)."""
        return linear(
            jnp.concatenate([embed, hidden.astype(embed.dtype)],
                            axis=-1), draft_params["fc"])

    def _head_hidden(self, draft_params: dict,
                     h: jnp.ndarray) -> jnp.ndarray:
        """Hidden -> lm-head input (EAGLE: identity; MTP: final norm)."""
        return h

    def propose(
        self,
        draft_params: dict,
        target_params: dict,
        draft_kv: jnp.ndarray,  # [1, N, 2Kd, page, Dd]
        input_ids: jnp.ndarray,  # i32[T] target tokens this step
        target_hidden: jnp.ndarray,  # [T, H] pre-norm final hidden
        metadata: AttentionMetadata,
        emitted: jnp.ndarray,  # i32[R, 1+S] verified tokens
        num_emitted: jnp.ndarray,  # i32[R]
        num_drafts: jnp.ndarray,  # i32[R]
        max_model_len: int,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (draft_tokens i32[R, S], new draft_kv)."""
        S = self.num_speculative_tokens
        R = metadata.seq_lens.shape[0]
        qsl = metadata.query_start_loc
        rows = jnp.arange(R, dtype=jnp.int32)

        num_rejected = num_drafts + 1 - num_emitted  # [R]
        accepted_last = jnp.maximum(qsl[1:] - 1 - num_rejected, 0)
        # Shift tokens left; place each request's last verified token at
        # its accepted end (eagle.py:103-107).
        shifted = jnp.concatenate([input_ids[1:], input_ids[-1:]])
        corr = emitted[rows, jnp.maximum(num_emitted - 1, 0)]
        shifted = shifted.at[accepted_last].set(corr)

        embed = embedding_lookup(shifted, target_params["embed"]["w"])
        h = self._fuse(draft_params, embed, target_hidden)

        # catch-up pass over the full ragged batch: rejected tail tokens
        # stay in the stream but seq_lens exclude them from attention.
        seq_acc = jnp.maximum(metadata.seq_lens - num_rejected, 0)
        md0 = dataclasses.replace(metadata, seq_lens=seq_acc)
        h_out, kv = self._layer(draft_params, h, draft_kv, md0)

        logits = lm_head_logits(
            self._head_hidden(draft_params, h_out[accepted_last]),
            target_params["lm_head"])
        token = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [R]
        drafts = [token]
        h_prev = h_out[accepted_last]  # [R, H]

        if S > 1:
            # static per-shape decode-loop metadata scaffolding
            from vllm_tpu.ops.pallas.ragged_paged_attention import \
                build_logical_blocks

            qsl_dec = np.arange(R + 1, dtype=np.int32)
            lb_seq, lb_q_start = build_logical_blocks(qsl_dec, R, R)
            bs = self.block_size

        for j in range(1, S):
            pos_j = seq_acc + j - 1  # draft token j-1 sits here
            ok = pos_j < max_model_len
            posc = jnp.where(ok, pos_j, 0)
            block_ids = metadata.block_tables[rows, posc // bs]
            # masked-out rows write into the null block (id 0, slot 0)
            slots = jnp.where(ok, block_ids * bs + posc % bs, 0)
            md_j = AttentionMetadata(
                slot_mapping=slots,
                block_tables=metadata.block_tables,
                query_start_loc=jnp.asarray(qsl_dec),
                seq_lens=jnp.where(ok, seq_acc + j, 1),
                positions=posc,
                lb_seq=jnp.asarray(lb_seq),
                lb_q_start=jnp.asarray(lb_q_start),
            )
            embed = embedding_lookup(drafts[-1],
                                     target_params["embed"]["w"])
            h_in = self._fuse(draft_params, embed, h_prev)
            h_out, kv = self._layer(draft_params, h_in, kv, md_j)
            logits = lm_head_logits(
                self._head_hidden(draft_params, h_out),
                target_params["lm_head"])
            drafts.append(jnp.argmax(logits, axis=-1).astype(jnp.int32))
            h_prev = h_out

        return jnp.stack(drafts, axis=1), kv


class Eagle3Proposer(EagleProposer):
    """EAGLE-3 drafting (reference: models/llama_eagle3.py +
    v1/spec_decode/eagle.py eagle3 paths).

    Differences from EAGLE-1:
    - the TARGET model taps three layer inputs (aux hidden states,
      llama.py:584-589); the proposer's ``fc`` combines the [T, 3*H_t]
      concat into the draft hidden once per verify pass,
    - the draft layer consumes cat(input_ln(embeds), hidden_norm(h))
      (a 2H-wide qkv) with the residual taken from the UN-normed h,
    - the draft carries its own final norm, lm_head over a reduced
      draft vocabulary, a d2t offset table mapping draft argmax ids to
      target token ids, and (optionally) its own embedding table.
    """

    def __init__(self, target_model, spec_config, cache_config) -> None:
        super().__init__(target_model, spec_config, cache_config)
        hf = {}
        path = spec_config.model
        if path and os.path.isdir(path):
            cfg_file = os.path.join(path, "config.json")
            if os.path.exists(cfg_file):
                with open(cfg_file) as f:
                    hf = json.load(f)
        t = target_model.args
        self.target_hidden = int(hf.get("target_hidden_size",
                                        t.hidden_size))
        self.draft_vocab = int(hf.get("draft_vocab_size",
                                      hf.get("vocab_size",
                                             t.vocab_size)))
        self.vocab_size = int(hf.get("vocab_size", t.vocab_size))
        self.aux_layer_ids = tuple(
            hf.get("eagle_aux_hidden_state_layer_ids") or
            target_model.get_eagle3_aux_hidden_state_layers())

    def param_shapes(self) -> dict:
        H, I = self.hidden, self.inter
        nq, nk, d = self.num_heads, self.num_kv_heads, self.head_dim
        return {
            "fc": {"w": (3 * self.target_hidden, H)},
            "input_ln": (H,),
            "hidden_norm": (H,),
            "qkv": {"w": (2 * H, (nq + 2 * nk) * d)},
            "o": {"w": (nq * d, H)},
            "gate_up": {"w": (H, 2 * I)},
            "down": {"w": (I, H)},
            "post_ln": (H,),
            "final_norm": (H,),
            "embed": {"w": (self.vocab_size, H)},
            "lm_head": {"w": (H, self.draft_vocab)},
        }

    def init_dummy_params(self, seed: int = 0) -> dict:
        params = super().init_dummy_params(seed)
        params["d2t"] = np.zeros((self.draft_vocab,), np.int32)
        return params

    def load_weights(self, dtype) -> dict:
        path = self.spec_config.model
        if not path or not os.path.isdir(path):
            logger.warning("eagle3: no draft checkpoint at %r, "
                           "using dummy weights", path)
            params = self.init_dummy_params()
        else:
            from vllm_tpu.models.weight_utils import weights_iterator

            shapes = self.param_shapes()
            params = jax.tree.map(
                lambda s: np.zeros(s, np.float32), shapes,
                is_leaf=lambda x: isinstance(x, tuple))
            params["d2t"] = np.zeros((self.draft_vocab,), np.int32)
            seen_embed = False
            nq, nk, d = self.num_heads, self.num_kv_heads, self.head_dim
            I = self.inter
            lmap = {
                "fc.weight": ("fc", True),
                "layers.0.input_layernorm.weight": ("input_ln", False),
                "layers.0.hidden_norm.weight": ("hidden_norm", False),
                "layers.0.self_attn.o_proj.weight": ("o", True),
                "layers.0.mlp.down_proj.weight": ("down", True),
                "layers.0.post_attention_layernorm.weight":
                    ("post_ln", False),
                "norm.weight": ("final_norm", False),
                "lm_head.weight": ("lm_head", True),
                "embed_tokens.weight": ("embed", False),
            }
            fused = {
                "layers.0.self_attn.q_proj.weight": ("qkv", 0, nq * d),
                "layers.0.self_attn.k_proj.weight":
                    ("qkv", nq * d, nk * d),
                "layers.0.self_attn.v_proj.weight":
                    ("qkv", (nq + nk) * d, nk * d),
                "layers.0.mlp.gate_proj.weight": ("gate_up", 0, I),
                "layers.0.mlp.up_proj.weight": ("gate_up", I, I),
            }
            for name, w in weights_iterator(path):
                name = name.removeprefix("model.")
                name = name.replace("midlayer.", "layers.0.")
                if name in ("d2t", "d2t.weight"):
                    params["d2t"] = np.asarray(w, np.int32)
                    continue
                if name in ("t2d", "t2d.weight"):
                    continue
                w = np.asarray(w, np.float32)
                if name in lmap:
                    key, transpose = lmap[name]
                    w = w.T if transpose else w
                    if key == "embed":
                        seen_embed = True
                    if isinstance(params[key], dict):
                        params[key]["w"][...] = w
                    else:
                        params[key][...] = w
                elif name in fused:
                    key, start, length = fused[name]
                    params[key]["w"][:, start:start + length] = w.T
            if not seen_embed:
                # share the target's embedding table (reference
                # llama_eagle3.py skip_substrs embed_tokens)
                params["embed"]["w"][...] = 0.0
                self._share_target_embed = True
        d2t = params.pop("d2t")
        out = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
        out["d2t"] = jnp.asarray(d2t, jnp.int32)
        return out

    _share_target_embed = False

    def _embed_w(self, draft_params, target_params):
        if self._share_target_embed:
            return target_params["embed"]["w"]
        return draft_params["embed"]["w"]

    def _layer3(self, dp, embeds, hidden, kv, metadata):
        """Returns (prenorm [T,H] — next-step hidden, normed [T,H] —
        logits input, kv)."""
        nq, nk, d = self.num_heads, self.num_kv_heads, self.head_dim
        T = embeds.shape[0]
        e = rms_norm(embeds, dp["input_ln"], self.rms_eps)
        hn = rms_norm(hidden.astype(embeds.dtype), dp["hidden_norm"],
                      self.rms_eps)
        qkv = linear(jnp.concatenate([e, hn], axis=-1), dp["qkv"])
        q, k, v = jnp.split(qkv, [nq * d, (nq + nk) * d], axis=-1)
        q = q.reshape(T, nq, d)
        k = k.reshape(T, nk, d)
        v = v.reshape(T, nk, d)
        q, k = apply_rope(q, k, metadata.positions, self.inv_freq,
                          self.is_neox, self.rope_mscale)
        kv = write_kv_cache(kv, k, v, metadata.slot_mapping, layer=0)
        attn = attention(q, kv, metadata, self.scale, layer=0)
        r = hidden.astype(embeds.dtype) + \
            linear(attn.reshape(T, nq * d), dp["o"])
        h = rms_norm(r, dp["post_ln"], self.rms_eps)
        gate_up = linear(h, dp["gate_up"])
        mlp = linear(GATED_ACTIVATIONS[self.act](gate_up), dp["down"])
        prenorm = r + mlp
        normed = rms_norm(prenorm, dp["final_norm"], self.rms_eps)
        return prenorm, normed, kv

    def _draft_argmax(self, dp, normed):
        logits = lm_head_logits(normed, dp["lm_head"])
        draft_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # d2t stores per-draft-id OFFSETS to target token ids
        return draft_ids + dp["d2t"][draft_ids]

    def _fuse(self, draft_params: dict, embed: jnp.ndarray,
              hidden: jnp.ndarray) -> jnp.ndarray:
        """Combine (token embedding, previous hidden) into the draft
        layer input. EAGLE: raw concat -> fc (llama_eagle.py:44)."""
        return linear(
            jnp.concatenate([embed, hidden.astype(embed.dtype)],
                            axis=-1), draft_params["fc"])

    def _head_hidden(self, draft_params: dict,
                     h: jnp.ndarray) -> jnp.ndarray:
        """Hidden -> lm-head input (EAGLE: identity; MTP: final norm)."""
        return h

    def propose(
        self,
        draft_params: dict,
        target_params: dict,
        draft_kv: jnp.ndarray,
        input_ids: jnp.ndarray,  # i32[T]
        target_hidden: jnp.ndarray,  # [T, 3*H_t] concat of aux taps
        metadata: AttentionMetadata,
        emitted: jnp.ndarray,
        num_emitted: jnp.ndarray,
        num_drafts: jnp.ndarray,
        max_model_len: int,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        S = self.num_speculative_tokens
        R = metadata.seq_lens.shape[0]
        qsl = metadata.query_start_loc
        rows = jnp.arange(R, dtype=jnp.int32)

        num_rejected = num_drafts + 1 - num_emitted
        accepted_last = jnp.maximum(qsl[1:] - 1 - num_rejected, 0)
        shifted = jnp.concatenate([input_ids[1:], input_ids[-1:]])
        corr = emitted[rows, jnp.maximum(num_emitted - 1, 0)]
        shifted = shifted.at[accepted_last].set(corr)

        embed_w = self._embed_w(draft_params, target_params)
        embeds = embedding_lookup(shifted, embed_w)
        hidden = linear(target_hidden.astype(embeds.dtype),
                        draft_params["fc"])  # combine_hidden_states

        seq_acc = jnp.maximum(metadata.seq_lens - num_rejected, 0)
        md0 = dataclasses.replace(metadata, seq_lens=seq_acc)
        prenorm, normed, kv = self._layer3(draft_params, embeds, hidden,
                                           draft_kv, md0)
        token = self._draft_argmax(draft_params, normed[accepted_last])
        drafts = [token]
        h_prev = prenorm[accepted_last]

        if S > 1:
            from vllm_tpu.ops.pallas.ragged_paged_attention import \
                build_logical_blocks

            qsl_dec = np.arange(R + 1, dtype=np.int32)
            lb_seq, lb_q_start = build_logical_blocks(qsl_dec, R, R)
            bs = self.block_size

        for j in range(1, S):
            pos_j = seq_acc + j - 1
            ok = pos_j < max_model_len
            posc = jnp.where(ok, pos_j, 0)
            block_ids = metadata.block_tables[rows, posc // bs]
            slots = jnp.where(ok, block_ids * bs + posc % bs, 0)
            md_j = AttentionMetadata(
                slot_mapping=slots,
                block_tables=metadata.block_tables,
                query_start_loc=jnp.asarray(qsl_dec),
                seq_lens=jnp.where(ok, seq_acc + j, 1),
                positions=posc,
                lb_seq=jnp.asarray(lb_seq),
                lb_q_start=jnp.asarray(lb_q_start),
            )
            embeds = embedding_lookup(drafts[-1], embed_w)
            prenorm, normed, kv = self._layer3(draft_params, embeds,
                                               h_prev, kv, md_j)
            drafts.append(self._draft_argmax(draft_params, normed))
            h_prev = prenorm
        return jnp.stack(drafts, axis=1), kv


class MTPProposer(EagleProposer):
    """Multi-Token-Prediction draft (reference behavior parity:
    vllm/model_executor/models/mimo_mtp.py MiMoMultiTokenPredictorLayer;
    deepseek_mtp.py shares the shape with an MLA block).

    vs EAGLE: the token embedding and previous hidden are EACH RMS-
    normed before the 2H->H input projection (token_layernorm /
    hidden_layernorm), the draft decoder layer is a FULL pre-norm layer
    (input_layernorm kept), and a final_layernorm feeds the shared
    lm_head. Serves MiMo-7B-class MTP checkpoints (one predict layer,
    GQA block); embed + lm_head are shared with the target."""

    def param_shapes(self) -> dict:
        H = self.hidden
        shapes = super().param_shapes()
        shapes.update({
            "enorm": (H,),
            "hnorm": (H,),
            "input_ln": (H,),
            "final_norm": (H,),
        })
        return shapes

    def _fuse(self, draft_params, embed, hidden):
        e = rms_norm(embed, draft_params["enorm"], self.rms_eps)
        hh = rms_norm(hidden.astype(embed.dtype), draft_params["hnorm"],
                      self.rms_eps)
        return linear(jnp.concatenate([e, hh], axis=-1),
                      draft_params["fc"])

    def _head_hidden(self, draft_params, h):
        return rms_norm(h, draft_params["final_norm"], self.rms_eps)

    def _layer(self, dp, x, kv, metadata):
        # full pre-norm decoder layer (mtp_block keeps input_layernorm,
        # unlike the EAGLE layer)
        nq, nk, d = self.num_heads, self.num_kv_heads, self.head_dim
        T = x.shape[0]
        h0 = rms_norm(x, dp["input_ln"], self.rms_eps)
        qkv = linear(h0, dp["qkv"])
        q, k, v = jnp.split(qkv, [nq * d, (nq + nk) * d], axis=-1)
        q = q.reshape(T, nq, d)
        k = k.reshape(T, nk, d)
        v = v.reshape(T, nk, d)
        q, k = apply_rope(q, k, metadata.positions, self.inv_freq,
                          self.is_neox, self.rope_mscale)
        kv = write_kv_cache(kv, k, v, metadata.slot_mapping, layer=0)
        attn = attention(q, kv, metadata, self.scale, layer=0)
        x = x + linear(attn.reshape(T, nq * d), dp["o"])
        h = rms_norm(x, dp["post_ln"], self.rms_eps)
        gate_up = linear(h, dp["gate_up"])
        x = x + linear(GATED_ACTIVATIONS[self.act](gate_up), dp["down"])
        return x, kv

    def load_weights(self, dtype) -> dict:
        path = self.spec_config.model
        if not path or not os.path.isdir(path):
            logger.warning("mtp: no draft checkpoint at %r, "
                           "using dummy weights", path)
            return jax.tree.map(lambda x: jnp.asarray(x, dtype),
                                self.init_dummy_params())
        from vllm_tpu.models.weight_utils import weights_iterator

        shapes = self.param_shapes()
        params = jax.tree.map(
            lambda s: np.zeros(s, np.float32), shapes,
            is_leaf=lambda x: isinstance(x, tuple))
        nq, nk, d = self.num_heads, self.num_kv_heads, self.head_dim
        I = self.inter
        flat = {
            "token_layernorm.weight": "enorm",
            "hidden_layernorm.weight": "hnorm",
            "enorm.weight": "enorm",
            "hnorm.weight": "hnorm",
            "final_layernorm.weight": "final_norm",
            "shared_head.norm.weight": "final_norm",
        }
        mat = {
            "input_proj.weight": "fc",
            "eh_proj.weight": "fc",
            "mtp_block.self_attn.o_proj.weight": "o",
            "mtp_block.mlp.down_proj.weight": "down",
        }
        lnmap = {
            "mtp_block.input_layernorm.weight": "input_ln",
            "mtp_block.post_attention_layernorm.weight": "post_ln",
        }
        fused = {
            "mtp_block.self_attn.q_proj.weight": ("qkv", 0, nq * d),
            "mtp_block.self_attn.k_proj.weight": ("qkv", nq * d, nk * d),
            "mtp_block.self_attn.v_proj.weight":
                ("qkv", (nq + nk) * d, nk * d),
            "mtp_block.mlp.gate_proj.weight": ("gate_up", 0, I),
            "mtp_block.mlp.up_proj.weight": ("gate_up", I, I),
        }
        for name, w in weights_iterator(path):
            name = name.removeprefix("model.")
            # strip the mtp-layer index prefix (mtp_layers.N. or
            # layers.N. — MTP weights sit past num_hidden_layers)
            parts = name.split(".")
            if parts[0] in ("mtp_layers", "layers") and len(parts) > 2:
                name = ".".join(parts[2:])
            w = np.asarray(w, np.float32)
            if name in flat:
                params[flat[name]][...] = w
            elif name in mat:
                params[mat[name]]["w"][...] = w.T
            elif name in lnmap:
                params[lnmap[name]][...] = w
            elif name in fused:
                key, start, length = fused[name]
                params[key]["w"][:, start:start + length] = w.T
        return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
