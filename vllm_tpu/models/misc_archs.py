"""Falcon / GPT-J / Persimmon / Bloom / MPT — NeoX-skeleton variants
(reference behavior parity: vllm/model_executor/models/{falcon,gpt_j,
persimmon,bloom,mpt}.py; each re-expressed as a small NeoxArgs reshuffle).

Bloom and MPT use ALiBi position bias (no rope); both Pallas kernels
carry the bias hook (slope_h * (col - pos) on the score matrix), so
ALiBi models serve paged like everyone else (r03; VERDICT r02 item 9).
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np

from vllm_tpu.models.neox import GPTNeoXForCausalLM, NeoxArgs
from vllm_tpu.ops.rotary import RopeConfig


class FalconForCausalLM(GPTNeoXForCausalLM):
    """Falcon 7B/40B/180B (reference: models/falcon.py). Parallel
    attention+MLP residual; 7B shares one input LN (multi_query), the
    new decoder architecture uses separate ln_attn/ln_mlp. The fused
    query_key_value weight interleaves KV GROUPS: [nkv, q_per_group + 2,
    head_dim]."""

    _EMBED = "transformer.word_embeddings.weight"
    _FINAL_W = "transformer.ln_f.weight"
    _FINAL_B = "transformer.ln_f.bias"
    _LM_HEAD = "lm_head.weight"
    _LAYER_PREFIX = "transformer.h"

    def parse_args(self, hf) -> NeoxArgs:
        nq = hf.num_attention_heads
        head_dim = hf.hidden_size // nq
        self._new_arch = bool(getattr(hf, "new_decoder_architecture",
                                      False))
        if self._new_arch:
            nk = int(getattr(hf, "num_kv_heads", nq) or nq)
        elif bool(getattr(hf, "multi_query", True)):
            nk = 1
        else:
            nk = nq
        rope = RopeConfig(
            head_size=head_dim,
            rotary_dim=head_dim if not getattr(hf, "alibi", False) else 0,
            max_position=getattr(hf, "max_position_embeddings", 2048),
            base=float(getattr(hf, "rope_theta", 10000.0)),
            scaling=getattr(hf, "rope_scaling", None),
        )
        return NeoxArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=hf.num_hidden_layers,
            num_heads=nq,
            num_kv_heads=nk,
            head_dim=head_dim,
            intermediate_size=getattr(hf, "ffn_hidden_size", None)
            or 4 * hf.hidden_size,
            ln_eps=float(getattr(hf, "layer_norm_epsilon", 1e-5)),
            rope=rope,
            parallel_residual=bool(getattr(hf, "parallel_attn", True)),
            # 7B-style shares one LN between attention and MLP branches
            shared_input_ln=not self._new_arch,
            act="gelu",
            qkv_bias=bool(getattr(hf, "bias", False)),
            o_bias=bool(getattr(hf, "bias", False)),
            mlp_bias=bool(getattr(hf, "bias", False)),
            alibi=bool(getattr(hf, "alibi", False)),
            tie_embeddings=True,
            max_position=getattr(hf, "max_position_embeddings", 2048),
        )

    def _hf_layer_map(self):
        m = {
            "self_attention.query_key_value.weight": ("qkv.w",
                                                      "falcon_qkv", True),
            "self_attention.query_key_value.bias": ("qkv.b", "falcon_qkv",
                                                    False),
            "self_attention.dense.weight": ("o.w", "", True),
            "self_attention.dense.bias": ("o.b", "", False),
            "mlp.dense_h_to_4h.weight": ("up.w", "", True),
            "mlp.dense_h_to_4h.bias": ("up.b", "", False),
            "mlp.dense_4h_to_h.weight": ("down.w", "", True),
            "mlp.dense_4h_to_h.bias": ("down.b", "", False),
        }
        if self._new_arch:
            m["ln_attn.weight"] = ("input_ln_w", "", False)
            m["ln_attn.bias"] = ("input_ln_b", "", False)
            m["ln_mlp.weight"] = ("post_ln_w", "", False)
            m["ln_mlp.bias"] = ("post_ln_b", "", False)
        else:
            m["input_layernorm.weight"] = ("input_ln_w", "", False)
            m["input_layernorm.bias"] = ("input_ln_b", "", False)
        return m

    def _place(self, dest_layers, key, part, li, w, np_dtype):
        if part != "falcon_qkv":
            return super()._place(dest_layers, key, part, li, w, np_dtype)
        a = self.args
        nq, nk, d = a.num_heads, a.num_kv_heads, a.head_dim
        gq = nq // nk  # query heads per kv group
        obj = dest_layers
        *path, leaf = key.split(".")
        for p in path:
            obj = obj[p]
        if w.ndim == 2:  # transposed [H, (nq + 2nk) * d]
            wr = w.reshape(w.shape[0], nk, gq + 2, d)
            q = wr[:, :, :gq].reshape(w.shape[0], nq * d)
            k = wr[:, :, gq].reshape(w.shape[0], nk * d)
            v = wr[:, :, gq + 1].reshape(w.shape[0], nk * d)
            obj[leaf][li] = np.concatenate([q, k, v],
                                           axis=1).astype(np_dtype)
        else:
            wr = w.reshape(nk, gq + 2, d)
            q = wr[:, :gq].reshape(nq * d)
            k = wr[:, gq].reshape(nk * d)
            v = wr[:, gq + 1].reshape(nk * d)
            obj[leaf][li] = np.concatenate([q, k, v]).astype(np_dtype)


class GPTJForCausalLM(GPTNeoXForCausalLM):
    """GPT-J 6B (reference: models/gpt_j.py): parallel residual sharing
    one LN, interleaved (gptj-style) partial rotary, biased MLP + biased
    lm_head, separate unbiased q/k/v projections."""

    _EMBED = "transformer.wte.weight"
    _FINAL_W = "transformer.ln_f.weight"
    _FINAL_B = "transformer.ln_f.bias"
    _LM_HEAD = "lm_head.weight"
    _LM_HEAD_B = "lm_head.bias"
    _LAYER_PREFIX = "transformer.h"

    def parse_args(self, hf) -> NeoxArgs:
        nq = hf.num_attention_heads
        head_dim = hf.hidden_size // nq
        rope = RopeConfig(
            head_size=head_dim,
            rotary_dim=int(getattr(hf, "rotary_dim", None) or head_dim),
            max_position=getattr(hf, "n_positions", 2048),
            base=10000.0,
            is_neox_style=False,  # gptj interleaves rotary pairs
        )
        return NeoxArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=hf.num_hidden_layers,
            num_heads=nq,
            num_kv_heads=nq,
            head_dim=head_dim,
            intermediate_size=getattr(hf, "n_inner", None)
            or 4 * hf.hidden_size,
            ln_eps=float(getattr(hf, "layer_norm_epsilon", 1e-5)),
            rope=rope,
            parallel_residual=True,
            shared_input_ln=True,
            act=getattr(hf, "activation_function", "gelu_new"),
            qkv_bias=False,
            o_bias=False,
            mlp_bias=True,
            lm_head_bias=True,
            max_position=getattr(hf, "n_positions", 2048),
        )

    def _hf_layer_map(self):
        return {
            "ln_1.weight": ("input_ln_w", "", False),
            "ln_1.bias": ("input_ln_b", "", False),
            "attn.q_proj.weight": ("qkv.w", "q", True),
            "attn.k_proj.weight": ("qkv.w", "k", True),
            "attn.v_proj.weight": ("qkv.w", "v", True),
            "attn.out_proj.weight": ("o.w", "", True),
            "mlp.fc_in.weight": ("up.w", "", True),
            "mlp.fc_in.bias": ("up.b", "", False),
            "mlp.fc_out.weight": ("down.w", "", True),
            "mlp.fc_out.bias": ("down.b", "", False),
        }


class PersimmonForCausalLM(GPTNeoXForCausalLM):
    """Persimmon 8B (reference: models/persimmon.py): sequential
    residual, per-head q/k LayerNorm WITH bias, partial rotary, relu^2
    MLP, biases everywhere."""

    _EMBED = "model.embed_tokens.weight"
    _FINAL_W = "model.final_layernorm.weight"
    _FINAL_B = "model.final_layernorm.bias"
    _LM_HEAD = "lm_head.weight"
    _LAYER_PREFIX = "model.layers"

    def parse_args(self, hf) -> NeoxArgs:
        nq = hf.num_attention_heads
        head_dim = hf.hidden_size // nq
        rope = RopeConfig(
            head_size=head_dim,
            rotary_dim=int(head_dim *
                           float(getattr(hf, "partial_rotary_factor",
                                         0.5))),
            max_position=getattr(hf, "max_position_embeddings", 2048),
            base=float(getattr(hf, "rope_theta", 25000.0)),
        )
        return NeoxArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=hf.num_hidden_layers,
            num_heads=nq,
            num_kv_heads=nq,
            head_dim=head_dim,
            intermediate_size=hf.intermediate_size,
            ln_eps=float(getattr(hf, "layer_norm_eps", 1e-5)),
            rope=rope,
            parallel_residual=False,
            act=getattr(hf, "hidden_act", "relu2"),
            qk_norm=bool(getattr(hf, "qk_layernorm", True)),
            qk_norm_bias=True,
            max_position=getattr(hf, "max_position_embeddings", 2048),
        )

    def _hf_layer_map(self):
        return {
            "input_layernorm.weight": ("input_ln_w", "", False),
            "input_layernorm.bias": ("input_ln_b", "", False),
            "post_attention_layernorm.weight": ("post_ln_w", "", False),
            "post_attention_layernorm.bias": ("post_ln_b", "", False),
            "self_attn.query_key_value.weight": ("qkv.w", "neox_qkv",
                                                 True),
            "self_attn.query_key_value.bias": ("qkv.b", "neox_qkv",
                                               False),
            "self_attn.q_layernorm.weight": ("q_norm", "headnorm", False),
            "self_attn.q_layernorm.bias": ("q_norm_b", "headnorm", False),
            "self_attn.k_layernorm.weight": ("k_norm", "headnorm", False),
            "self_attn.k_layernorm.bias": ("k_norm_b", "headnorm", False),
            "self_attn.dense.weight": ("o.w", "", True),
            "self_attn.dense.bias": ("o.b", "", False),
            "mlp.dense_h_to_4h.weight": ("up.w", "", True),
            "mlp.dense_h_to_4h.bias": ("up.b", "", False),
            "mlp.dense_4h_to_h.weight": ("down.w", "", True),
            "mlp.dense_4h_to_h.bias": ("down.b", "", False),
        }

    def _place(self, dest_layers, key, part, li, w, np_dtype):
        if part == "headnorm":
            # HF stores one [head_dim] LN broadcast over heads
            a = self.args
            n = a.num_heads if key.startswith("q_norm") else a.num_kv_heads
            obj = dest_layers[key]
            obj[li] = np.broadcast_to(w, (n, a.head_dim)).astype(np_dtype)
            return
        return super()._place(dest_layers, key, part, li, w, np_dtype)


class BloomForCausalLM(GPTNeoXForCausalLM):
    """Bloom (reference: models/bloom.py): ALiBi, embedding LayerNorm,
    per-head-interleaved fused qkv, sequential residual, tied lm head."""

    _EMBED = "transformer.word_embeddings.weight"
    _FINAL_W = "transformer.ln_f.weight"
    _FINAL_B = "transformer.ln_f.bias"
    _LM_HEAD = "lm_head.weight"
    _EMBED_LN_W = "transformer.word_embeddings_layernorm.weight"
    _EMBED_LN_B = "transformer.word_embeddings_layernorm.bias"
    _LAYER_PREFIX = "transformer.h"

    def parse_args(self, hf) -> NeoxArgs:
        nq = hf.n_head if hasattr(hf, "n_head") else \
            hf.num_attention_heads
        H = hf.hidden_size
        return NeoxArgs(
            vocab_size=hf.vocab_size,
            hidden_size=H,
            num_layers=getattr(hf, "n_layer", None)
            or hf.num_hidden_layers,
            num_heads=nq,
            num_kv_heads=nq,
            head_dim=H // nq,
            intermediate_size=4 * H,
            ln_eps=float(getattr(hf, "layer_norm_epsilon", 1e-5)),
            rope=RopeConfig(head_size=H // nq, rotary_dim=0,
                            max_position=2048),
            parallel_residual=False,
            act="gelu",
            alibi=True,
            embed_ln=True,
            tie_embeddings=True,
        )

    def _hf_layer_map(self):
        return {
            "input_layernorm.weight": ("input_ln_w", "", False),
            "input_layernorm.bias": ("input_ln_b", "", False),
            "post_attention_layernorm.weight": ("post_ln_w", "", False),
            "post_attention_layernorm.bias": ("post_ln_b", "", False),
            "self_attention.query_key_value.weight": ("qkv.w", "neox_qkv",
                                                      True),
            "self_attention.query_key_value.bias": ("qkv.b", "neox_qkv",
                                                    False),
            "self_attention.dense.weight": ("o.w", "", True),
            "self_attention.dense.bias": ("o.b", "", False),
            "mlp.dense_h_to_4h.weight": ("up.w", "", True),
            "mlp.dense_h_to_4h.bias": ("up.b", "", False),
            "mlp.dense_4h_to_h.weight": ("down.w", "", True),
            "mlp.dense_4h_to_h.bias": ("down.b", "", False),
        }


class MptForCausalLM(GPTNeoXForCausalLM):
    """MPT 7B/30B (reference: models/mpt.py): ALiBi, no biases, flat
    (q|k|v) fused Wqkv, sequential residual, tied lm head."""

    _EMBED = "transformer.wte.weight"
    _FINAL_W = "transformer.norm_f.weight"
    _LAYER_PREFIX = "transformer.blocks"
    _LM_HEAD = "lm_head.weight"

    def parse_args(self, hf) -> NeoxArgs:
        nq = hf.n_heads
        H = hf.d_model
        attn_cfg = getattr(hf, "attn_config", None) or {}
        if not isinstance(attn_cfg, dict):
            attn_cfg = attn_cfg.to_dict()
        kv_n = attn_cfg.get("kv_n_heads", nq)
        return NeoxArgs(
            vocab_size=hf.vocab_size,
            hidden_size=H,
            num_layers=hf.n_layers,
            num_heads=nq,
            num_kv_heads=int(kv_n or nq),
            head_dim=H // nq,
            intermediate_size=getattr(hf, "expansion_ratio", 4) * H,
            ln_eps=1e-5,
            rope=RopeConfig(head_size=H // nq, rotary_dim=0,
                            max_position=2048),
            parallel_residual=False,
            act="gelu",
            ln_bias=False,
            qkv_bias=False,
            o_bias=False,
            mlp_bias=False,
            alibi=bool(attn_cfg.get("alibi", True)),
            tie_embeddings=True,
        )

    def _hf_layer_map(self):
        return {
            "norm_1.weight": ("input_ln_w", "", False),
            "norm_2.weight": ("post_ln_w", "", False),
            "attn.Wqkv.weight": ("qkv.w", "", True),  # flat q|k|v
            "attn.out_proj.weight": ("o.w", "", True),
            "ffn.up_proj.weight": ("up.w", "", True),
            "ffn.down_proj.weight": ("down.w", "", True),
        }


class BaiChuanForCausalLM(GPTNeoXForCausalLM):
    """Baichuan-7B (reference: models/baichuan.py BaiChuanForCausalLM —
    the camel-case arch string is the 7B rope variant): llama block with
    a fused W_pack qkv (plain q|k|v concat), RMSNorm, gated silu MLP,
    no biases. Remote-code-only on HF, so configs load through the
    generic PretrainedConfig fallback."""

    _EMBED = "model.embed_tokens.weight"
    _FINAL_W = "model.norm.weight"
    _FINAL_B = None
    _LM_HEAD = "lm_head.weight"
    _LAYER_PREFIX = "model.layers"

    def parse_args(self, hf) -> NeoxArgs:
        head_dim = hf.hidden_size // hf.num_attention_heads
        return NeoxArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=hf.num_hidden_layers,
            num_heads=hf.num_attention_heads,
            num_kv_heads=hf.num_attention_heads,
            head_dim=head_dim,
            intermediate_size=hf.intermediate_size,
            ln_eps=float(getattr(hf, "rms_norm_eps", 1e-6)),
            rope=RopeConfig(head_size=head_dim, rotary_dim=head_dim,
                            max_position=getattr(
                                hf, "max_position_embeddings", None)
                            or getattr(hf, "model_max_length", 4096),
                            base=float(getattr(hf, "rope_theta",
                                               10000.0))),
            norm_type="rms",
            parallel_residual=False,
            gated_mlp=True,
            act="silu",
            qkv_bias=False,
            o_bias=False,
            mlp_bias=False,
            tie_embeddings=bool(getattr(hf, "tie_word_embeddings",
                                        False)),
            max_position=getattr(hf, "max_position_embeddings", None)
            or getattr(hf, "model_max_length", 4096),
        )

    def _hf_layer_map(self):
        return {
            "input_layernorm.weight": ("input_ln_w", "", False),
            "post_attention_layernorm.weight": ("post_ln_w", "", False),
            # W_pack: [3H, H] plain concat on the output dim — matches
            # the fused qkv layout directly after transpose
            "self_attn.W_pack.weight": ("qkv.w", "", True),
            "self_attn.o_proj.weight": ("o.w", "", True),
            "mlp.gate_proj.weight": ("gate_up.w", "gate", True),
            "mlp.up_proj.weight": ("gate_up.w", "up2", True),
            "mlp.down_proj.weight": ("down.w", "", True),
        }


class BaichuanForCausalLM(BaiChuanForCausalLM):
    """Baichuan-13B / Baichuan2-13B (reference: models/baichuan.py
    BaichuanForCausalLM — lower-case arch string): same block with
    ALiBi position bias instead of rotary."""

    def parse_args(self, hf) -> NeoxArgs:
        args = super().parse_args(hf)
        return replace(args, alibi=True,
                       rope=replace(args.rope, rotary_dim=0))


class ChatGLMForCausalLM(GPTNeoXForCausalLM):
    """ChatGLM2/3 + GLM-4 chat (reference: models/chatglm.py): GLM block
    with multi-query attention, qkv bias, INTERLEAVED rotary over half
    the head dims, RMSNorm, fused swiglu dense_h_to_4h. Remote-code-only
    on HF (generic config fallback)."""

    _EMBED = "transformer.embedding.word_embeddings.weight"
    _FINAL_W = "transformer.encoder.final_layernorm.weight"
    _FINAL_B = None
    _LM_HEAD = "transformer.output_layer.weight"
    _LAYER_PREFIX = "transformer.encoder.layers"

    def parse_args(self, hf) -> NeoxArgs:
        nq = hf.num_attention_heads
        H = hf.hidden_size
        head_dim = H // nq
        nk = (hf.multi_query_group_num
              if getattr(hf, "multi_query_attention", False) else nq)
        return NeoxArgs(
            vocab_size=getattr(hf, "padded_vocab_size", None)
            or hf.vocab_size,
            hidden_size=H,
            num_layers=hf.num_layers,
            num_heads=nq,
            num_kv_heads=nk,
            head_dim=head_dim,
            intermediate_size=hf.ffn_hidden_size,
            ln_eps=float(getattr(hf, "layernorm_epsilon", 1e-5)),
            rope=RopeConfig(head_size=head_dim,
                            rotary_dim=head_dim // 2,
                            max_position=getattr(hf, "seq_length", 8192),
                            base=10000.0 * float(
                                getattr(hf, "rope_ratio", 1.0)),
                            is_neox_style=False),
            norm_type="rms" if getattr(hf, "rmsnorm", True) else "ln",
            parallel_residual=False,
            gated_mlp=True,
            act="silu",
            qkv_bias=bool(getattr(hf, "add_qkv_bias", True)),
            o_bias=False,
            mlp_bias=False,
            tie_embeddings=False,
            max_position=getattr(hf, "seq_length", 8192),
        )

    def _hf_layer_map(self):
        return {
            "input_layernorm.weight": ("input_ln_w", "", False),
            "post_attention_layernorm.weight": ("post_ln_w", "", False),
            # fused [q|k|v] on the output dim (nq*d + 2*nk*d)
            "self_attention.query_key_value.weight": ("qkv.w", "", True),
            "self_attention.query_key_value.bias": ("qkv.b", "", False),
            "self_attention.dense.weight": ("o.w", "", True),
            # fused swiglu: chunk0 = gate (silu'd), chunk1 = up
            "mlp.dense_h_to_4h.weight": ("gate_up.w", "", True),
            "mlp.dense_4h_to_h.weight": ("down.w", "", True),
        }


class OlmoForCausalLM(GPTNeoXForCausalLM):
    """OLMo v1 (reference: models/olmo.py): llama-shaped block with
    NON-PARAMETRIC LayerNorms (no weights in the checkpoint — allocs
    stay at one), gated SiLU MLP, no biases, optional q/k/v clamping
    (clip_qkv)."""

    _EMBED = "model.embed_tokens.weight"
    _FINAL_W = "model.norm.weight"  # never present (non-parametric)
    _FINAL_B = None
    _LM_HEAD = "lm_head.weight"
    _LAYER_PREFIX = "model.layers"

    def parse_args(self, hf) -> NeoxArgs:
        nq = hf.num_attention_heads
        nk = getattr(hf, "num_key_value_heads", None) or nq
        head_dim = hf.hidden_size // nq
        clip = getattr(hf, "clip_qkv", None)
        return NeoxArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=hf.num_hidden_layers,
            num_heads=nq,
            num_kv_heads=nk,
            head_dim=head_dim,
            intermediate_size=hf.intermediate_size,
            ln_eps=1e-5,  # OlmoLayerNorm hardcodes 1e-5
            rope=RopeConfig(head_size=head_dim, rotary_dim=head_dim,
                            max_position=getattr(
                                hf, "max_position_embeddings", 2048),
                            base=float(getattr(hf, "rope_theta",
                                               10000.0))),
            norm_type="ln",
            ln_bias=False,
            parallel_residual=False,
            gated_mlp=True,
            act="silu",
            qkv_bias=False,
            o_bias=False,
            mlp_bias=False,
            tie_embeddings=bool(getattr(hf, "tie_word_embeddings",
                                        False)),
            max_position=getattr(hf, "max_position_embeddings", 2048),
            clip_qkv=float(clip) if clip else None,
        )

    def _alloc(self) -> dict:
        params = super()._alloc()
        # non-parametric norms: fixed at one, absent from checkpoints
        params["layers"]["input_ln_w"][...] = 1
        params["layers"]["post_ln_w"][...] = 1
        params["final_ln_w"][...] = 1
        return params

    def _hf_layer_map(self):
        return {
            "self_attn.q_proj.weight": ("qkv.w", "q", True),
            "self_attn.k_proj.weight": ("qkv.w", "k", True),
            "self_attn.v_proj.weight": ("qkv.w", "v", True),
            "self_attn.o_proj.weight": ("o.w", "", True),
            "mlp.gate_proj.weight": ("gate_up.w", "gate", True),
            "mlp.up_proj.weight": ("gate_up.w", "up2", True),
            "mlp.down_proj.weight": ("down.w", "", True),
        }
