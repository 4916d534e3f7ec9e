"""Llama-family causal LM, functional JAX (reference behavior parity:
vllm/model_executor/models/llama.py:498 LlamaForCausalLM; architecture is
TPU-native, not a translation).

Design:
- params are a plain pytree; decoder layers are STACKED on a leading [L]
  axis and the forward pass is one ``lax.scan`` over layers — one layer
  gets traced/compiled regardless of depth (fast compiles, small HLO).
- one fused qkv projection and one fused gate_up projection per layer
  (analog of MergedColumnParallelLinear / QKVParallelLinear,
  reference linear.py:608,886) so the MXU sees few large matmuls.
- KV cache is a stacked array per group (head-major pages:
  [L, num_blocks, 2*num_kv_heads, page, head]), optionally split into
  KVSlabs; the scan carries hidden states and the current slab.
- covers Llama 1/2/3, Mistral (sliding window), Qwen2 (qkv bias),
  Qwen3 (qk-norm, head_dim override), Gemma-style options are separate
  subclasses via ModelArgs flags.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import (FullAttentionSpec, KVCacheSpec,
                                              SlidingWindowSpec)
from vllm_tpu.ops.activation import GATED_ACTIVATIONS
from vllm_tpu.ops.attention import AttentionMetadata, KVSlabs, attention, \
    write_kv_cache
from vllm_tpu.ops.layernorm import rms_norm
from vllm_tpu.ops.linear import embedding_lookup, linear, lm_head_logits
from vllm_tpu.ops.rotary import RopeConfig, apply_rope, compute_inv_freq


@dataclass(frozen=True)
class ModelArgs:
    """Static architecture hyperparameters parsed from the HF config."""

    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    intermediate_size: int
    rms_eps: float
    rope: RopeConfig
    act: str = "silu"
    attn_bias: bool = False
    o_bias: bool = False
    mlp_bias: bool = False
    qk_norm: bool = False
    tie_embeddings: bool = False
    sliding_window: Optional[int] = None
    # Gemma-style extras
    logit_soft_cap: Optional[float] = None
    attn_soft_cap: Optional[float] = None
    embedding_multiplier: Optional[float] = None
    attn_scale: Optional[float] = None
    max_position: int = 2048
    # Granite-style multipliers
    residual_multiplier: Optional[float] = None
    logits_scale: Optional[float] = None  # logits are MULTIPLIED by this

    @staticmethod
    def from_hf_config(hf) -> "ModelArgs":
        head_dim = getattr(hf, "head_dim", None) or (hf.hidden_size //
                                                     hf.num_attention_heads)
        return ModelArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=hf.num_hidden_layers,
            num_heads=hf.num_attention_heads,
            num_kv_heads=getattr(hf, "num_key_value_heads", None)
            or hf.num_attention_heads,
            head_dim=head_dim,
            intermediate_size=hf.intermediate_size,
            rms_eps=getattr(hf, "rms_norm_eps", 1e-6),
            rope=RopeConfig.from_hf_config(hf, head_dim),
            act=getattr(hf, "hidden_act", "silu"),
            # reference llama.py:267-274: `bias` (InternLM) implies
            # biases on qkv AND o; `qkv_bias` (InternLM3) overrides the
            # qkv side only
            attn_bias=bool(getattr(hf, "qkv_bias", None)
                           if getattr(hf, "qkv_bias", None) is not None
                           else (getattr(hf, "attention_bias", False)
                                 or getattr(hf, "bias", False))),
            o_bias=bool(getattr(hf, "attention_bias", False)
                        or getattr(hf, "bias", False)),
            mlp_bias=bool(getattr(hf, "mlp_bias", False)),
            tie_embeddings=bool(getattr(hf, "tie_word_embeddings", False)),
            sliding_window=getattr(hf, "sliding_window", None),
            max_position=getattr(hf, "max_position_embeddings", 2048),
        )


def _np_dtype(dtype: str):
    import ml_dtypes

    return {"bfloat16": ml_dtypes.bfloat16,
            "float32": np.float32}[dtype]


class LlamaForCausalLM:
    """Functional model: all methods taking params are pure/jittable."""

    # Standard stacked KV cache: the loader can self-calibrate
    # per-layer per-head dequant scales for low-precision caches
    # (models/loader.py calibrate_kv_scales). Subclasses with exotic
    # caches (MLA latents, SSM states) opt out.
    kv_scale_calibration = True

    # HF checkpoint name templates (subclasses override)
    _EMBED = "model.embed_tokens.weight"
    _FINAL_NORM = "model.norm.weight"
    _LM_HEAD = "lm_head.weight"
    _LAYER_PREFIX = "model.layers"

    def __init__(self, model_config: ModelConfig,
                 args: Optional[ModelArgs] = None) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        self.args = args or self.parse_args(hf)
        self.inv_freq, self.rope_mscale = compute_inv_freq(self.args.rope)
        self.dtype = jnp.bfloat16 if model_config.dtype == "bfloat16" \
            else jnp.float32
        self.scale = self.args.attn_scale or (1.0 /
                                              math.sqrt(self.args.head_dim))

    def parse_args(self, hf) -> ModelArgs:
        return ModelArgs.from_hf_config(hf)

    # ------------------------------------------------------------- forward

    def kv_slab_plan(self, num_layers: int,
                     layer_bytes: int) -> Optional[list[int]]:
        """Per-slab layer counts for a slabbed KV cache, or None to
        keep the single stacked allocation (ops/attention.KVSlabs — an
        experiment knob, off by default). Slab sizes are multiples of
        the layer_pattern length so each slab scans whole pattern
        groups. The runner calls this per KV group at cache-init time;
        model families whose forward indexes the stacked cache directly
        (Deepseek MLA, GqaMoE) override to None until adapted."""
        from vllm_tpu import envs

        limit_mb = envs.VLLM_TPU_KV_SLAB_MB
        if not limit_mb or getattr(self, "pp_size", 1) > 1:
            return None
        p = len(self.layer_pattern)
        per = max(1, int(limit_mb) * 2**20 // max(layer_bytes, 1))
        per = max(p, per - per % p)
        if per >= num_layers:
            return None
        return [min(per, num_layers - b)
                for b in range(0, num_layers, per)]

    def embed(self, params: dict, input_ids: jnp.ndarray) -> jnp.ndarray:
        x = embedding_lookup(input_ids, params["embed"]["w"])
        if self.args.embedding_multiplier:
            x = x * jnp.asarray(self.args.embedding_multiplier, x.dtype)
        return x

    # Repeating per-layer static-config pattern (e.g. Gemma-2 alternates
    # sliding-window and full-attention layers). Length p must divide
    # num_layers; the scan runs over layer *groups* of size p with an
    # unrolled static inner loop, so every layer keeps a static config
    # while the whole stack still compiles as one scan body.
    @property
    def layer_pattern(self) -> list[dict]:
        return [{}]

    def forward(
        self,
        params: dict,
        input_ids: jnp.ndarray,  # i32[T]
        kv_caches: list[jnp.ndarray],  # [ [L, N, 2K, P, D] ]
        metadata: AttentionMetadata,
        lora=None,  # None | (lora_params {tgt: {a,b}[L,S,..]}, token_lora)
        embed_override=None,  # None | (idx i32[M], vecs [M, H]):
        # replace token embeddings at positions idx (multimodal image
        # placeholders); padding entries use idx == T (scratch row)
    ) -> tuple[jnp.ndarray, list[jnp.ndarray]]:
        x = self.embed(params, input_ids)
        if embed_override is not None:
            idx, vecs = embed_override
            ext = jnp.concatenate(
                [x, jnp.zeros((1, x.shape[1]), x.dtype)])
            x = ext.at[idx].set(vecs.astype(x.dtype))[:x.shape[0]]
        pp = getattr(self, "pp_size", 1)
        if pp > 1:
            from vllm_tpu.parallel.pipeline import pipeline_layers

            assert not self.aux_hidden_state_layers, \
                "EAGLE-3 aux hidden capture not supported under pp"
            x, new_kv = pipeline_layers(self._run_layers,
                                        params["layers"], kv_caches[0], x,
                                        metadata, lora, self.mesh, pp)
        else:
            x, new_kv = self._run_layers(params["layers"], kv_caches[0],
                                         x, metadata, lora)
        aux = self._aux_out
        self._aux_out = None
        x = self._final_ln(params, x)
        if self.aux_hidden_state_layers:
            # EAGLE-3 taps: each layer's INPUT x at the configured ids
            # (reference llama.py:415 hidden+residual before the layer)
            return x, [new_kv], aux
        return x, [new_kv]

    def forward_stream(
        self,
        params: dict,
        input_ids: jnp.ndarray,  # i32[T] NEW batch (stage-0 injection)
        kv_caches: list[jnp.ndarray],
        md_stacked,  # AttentionMetadata with every array [pp, ...]
        resident: jnp.ndarray,  # [pp, T, H] in-flight activations
    ) -> tuple[jnp.ndarray, list[jnp.ndarray], jnp.ndarray]:
        """One resident-ring PP hop (see parallel/pipeline.py
        ``pipeline_stream_layers``): inject the new batch at stage 0,
        advance every in-flight batch one stage, and return the
        final-norm'ed hidden state of the batch that completed the
        stack this step (injected pp-1 steps ago)."""
        from vllm_tpu.parallel.pipeline import pipeline_stream_layers

        pp = self.pp_size
        x_in = self.embed(params, input_ids)
        exit_x, new_kv, resident = pipeline_stream_layers(
            self._run_layers, params["layers"], kv_caches[0], x_in,
            resident, md_stacked, self.mesh, pp)
        exit_x = self._final_ln(params, exit_x)
        return exit_x, [new_kv], resident

    def _run_layers(self, layer_params: dict, kv_stack,
                    x: jnp.ndarray, metadata: AttentionMetadata,
                    lora=None) -> tuple[jnp.ndarray, Any]:
        """Scan the (possibly stage-local) stacked decoder layers.

        The stacked KV cache rides the scan carry; each layer scatters
        its new rows in place at its layer index (never materializing
        per-layer copies or a fresh stacked buffer — a decode step
        touches only the written slots, which is the whole point of
        paged attention).

        ``kv_stack`` is either one [L, N, ...] array or a KVSlabs of
        per-layer-group slabs (see ops/attention.KVSlabs: the device
        DMA-streams >1GB allocations at less than half rate, so the
        runner splits the cache). Slabs run as a Python loop of
        per-slab scans; layer weights stay fully stacked (the MXU's
        weight-stream path shows no such penalty —
        tools/bench_weight_stream.py) and are indexed by GLOBAL layer
        id, while the attention kernels get slab-LOCAL indices via
        ``self._kv_slab_base`` (a trace-time constant consumed in
        _cached_attention)."""
        slabbed = isinstance(kv_stack, KVSlabs)
        slabs = kv_stack.slabs if slabbed else (kv_stack,)
        num_layers = sum(s.shape[0] for s in slabs)
        # tolerate host-numpy params (tests): traced-index needs jnp
        layer_params = jax.tree.map(jnp.asarray, layer_params)
        pattern = self.layer_pattern
        p = len(pattern)
        assert num_layers % p == 0
        aux_ids = None
        aux = None
        if self.aux_hidden_state_layers:
            aux_ids = jnp.asarray(self.aux_hidden_state_layers, jnp.int32)
            aux = jnp.zeros((len(self.aux_hidden_state_layers),
                             *x.shape), x.dtype)
        # EPLB: per-layer physical-expert token counts accumulated by
        # the MoE _mlp hook (mixtral.py) via the self._eplb_stats
        # tracer attribute, threaded through the scan carry
        stats = self._init_eplb_stats()

        def regroup(leaf):
            return leaf.reshape(num_layers // p, p, *leaf.shape[1:])

        if lora is not None:
            lora_params, token_lora = lora
            lora_layers = jax.tree.map(regroup, lora_params)
        else:
            lora_layers, token_lora = None, None

        # Layer weights are NOT scanned over: the body indexes the
        # stacked params with the layer id, which the quantized-matmul
        # and attention kernels consume directly from HBM via scalar
        # prefetch — scanning the weights as xs would materialize a
        # full per-layer copy of every weight each step.
        #
        # The body is built FRESH per slab: lax.scan caches the traced
        # jaxpr by body identity + avals, and every slab has identical
        # avals — a shared body object would silently reuse slab 0's
        # trace with its _kv_slab_base baked in.
        def make_body():
            def body(carry, scanned):
                h, kv, aux_c, stats_c = carry
                self._eplb_stats = stats_c
                gi, lora_g = scanned
                for i, cfg in enumerate(pattern):
                    if aux_c is not None:
                        # gi is the GLOBAL group index (slabs scan
                        # jnp.arange(g0, g1)), so gi*p+i is global
                        cond = ((gi * p + i) == aux_ids)[:, None, None]
                        aux_c = jnp.where(cond, h[None].astype(
                            aux_c.dtype), aux_c)
                    lora_ctx = None
                    if lora_g is not None:
                        lora_ctx = (jax.tree.map(lambda leaf: leaf[i],
                                                 lora_g), token_lora)
                    h, kv = self._decoder_layer(layer_params, h, kv,
                                                gi * p + i, metadata,
                                                lora_ctx=lora_ctx, **cfg)
                return (h, kv, aux_c, self._eplb_stats), None

            return body

        new_slabs = []
        base = 0
        for slab in slabs:
            nl = slab.shape[0]
            assert nl % p == 0, (nl, p)
            g0, g1 = base // p, (base + nl) // p
            group_idx = jnp.arange(g0, g1, dtype=jnp.int32)
            lora_slab = None if lora_layers is None else jax.tree.map(
                lambda leaf: leaf[g0:g1], lora_layers)
            self._kv_slab_base = base
            try:
                (x, slab, aux, stats), _ = jax.lax.scan(
                    make_body(), (x, slab, aux, stats),
                    (group_idx, lora_slab))
            finally:
                self._kv_slab_base = 0
            new_slabs.append(slab)
            base += nl
        self._aux_out = aux
        self._eplb_stats = None
        self._eplb_stats_out = stats
        return x, (KVSlabs(new_slabs) if slabbed else new_slabs[0])

    def _decoder_layer(self, lp: dict, x: jnp.ndarray, kv: jnp.ndarray,
                       li, metadata: AttentionMetadata,
                       sliding_window: Optional[int] = "default",
                       inv_freq=None, lora_ctx=None, rope_on: bool = True,
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
        from vllm_tpu.lora.ops import apply_lora

        args = self.args
        T = x.shape[0]
        nq, nk, d = args.num_heads, args.num_kv_heads, args.head_dim
        if sliding_window == "default":
            sliding_window = args.sliding_window
        if inv_freq is None:
            inv_freq = self.inv_freq

        h = self._ln(lp, "input_ln", li, x)
        qkv = apply_lora(h, linear(h, lp["qkv"], layer=li), lora_ctx,
                         "qkv")
        q, k, v = jnp.split(qkv, [nq * d, (nq + nk) * d], axis=-1)
        q = q.reshape(T, nq, d)
        k = k.reshape(T, nk, d)
        v = v.reshape(T, nk, d)
        if args.qk_norm:
            q, k = self._qk_norm(lp, li, q, k)
        if rope_on:  # NoPE layers (SmolLM3 et al.) skip rotary
            q, k = self._apply_rope_qk(q, k, metadata, inv_freq)
        attn_out, kv = self._cached_attention(
            lp, li, q, k, v, kv, metadata,
            sliding_window=sliding_window,
            logits_soft_cap=args.attn_soft_cap)
        res_mult = (jnp.asarray(args.residual_multiplier, x.dtype)
                    if args.residual_multiplier else None)
        attn_flat = attn_out.reshape(T, nq * d)
        attn_o = apply_lora(attn_flat, linear(attn_flat, lp["o"],
                                              layer=li), lora_ctx, "o")
        x = x + (attn_o if res_mult is None else attn_o * res_mult)

        h = self._ln(lp, "post_ln", li, x)
        ffw = self._mlp(lp, h, li, lora_ctx)
        x = x + (ffw if res_mult is None else ffw * res_mult)
        return x, kv

    def _ln(self, lp: dict, key: str, li, x: jnp.ndarray) -> jnp.ndarray:
        """Block-norm hook: default RMSNorm; subclasses may override
        with a different norm."""
        return rms_norm(x, lp[key][li], self.args.rms_eps)

    def _qk_norm(self, lp: dict, li, q: jnp.ndarray, k: jnp.ndarray):
        """q/k-norm hook: default per-head RMSNorm (Qwen3 et al.);
        Chameleon overrides with biased LayerNorm."""
        return (rms_norm(q, lp["q_norm"][li], self.args.rms_eps),
                rms_norm(k, lp["k_norm"][li], self.args.rms_eps))

    def _final_ln(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        return rms_norm(x, params["final_ln"], self.args.rms_eps)

    def _mlp(self, lp: dict, h: jnp.ndarray, li, lora_ctx=None):
        """Gated-MLP hook; ungated variants (Arcee, Apertus) override."""
        from vllm_tpu.lora.ops import apply_lora

        gate_up = apply_lora(h, linear(h, lp["gate_up"], layer=li),
                             lora_ctx, "gate_up")
        act = GATED_ACTIVATIONS[self.args.act](gate_up)
        return apply_lora(act, linear(act, lp["down"], layer=li),
                          lora_ctx, "down")

    # slab-local layer rebase for _cached_attention; _run_layers sets it
    # (a Python int, baked in at trace time) while scanning a KV slab
    _kv_slab_base = 0

    # EAGLE-3 aux hidden-state taps (reference llama.py:584-589): the
    # runner sets the layer ids; forward() then returns a third value
    # aux [n_taps, T, H] holding each tapped layer's input
    aux_hidden_state_layers: tuple = ()
    _aux_out = None
    # EPLB accumulators (see _run_layers; consumed by the runner step)
    _eplb_stats = None
    _eplb_stats_out = None

    def _init_eplb_stats(self):
        """MoE models with EPLB enabled override to return a zeroed
        [num_layers, num_physical] i32 accumulator."""
        return None

    def get_eagle3_aux_hidden_state_layers(self) -> tuple:
        L = self.args.num_layers
        return (2, L // 2, max(L - 3, 0))

    def _cached_attention(self, lp: dict, li, q, k, v, kv, metadata,
                          sliding_window=None, logits_soft_cap=None,
                          alibi_slopes=None, local_chunk=None,
                          scale=None):
        """KV-cache write + paged attention with the loader's calibrated
        per-layer per-head dequant scales when the cache is
        low-precision (models/loader.py calibrate_kv_scales; absent for
        full-precision caches). Shared by every arch that keeps the
        standard stacked [L, N, 2K, page, D] cache (``li`` is the GLOBAL
        layer id; the cache array may be a slab whose local index is
        ``li - self._kv_slab_base``)."""
        ksc = lp.get("kv_scale_k")
        k_scale = ksc[li] if ksc is not None else None
        v_scale = lp["kv_scale_v"][li] if ksc is not None else None
        kv_li = li - self._kv_slab_base if self._kv_slab_base else li
        kv = write_kv_cache(kv, k, v, metadata.slot_mapping,
                            k_scale=k_scale, v_scale=v_scale, layer=kv_li)
        out = attention(q, kv, metadata,
                        self.scale if scale is None else scale,
                        sliding_window=sliding_window,
                        logits_soft_cap=logits_soft_cap,
                        k_scale=k_scale, v_scale=v_scale, layer=kv_li,
                        local_chunk=local_chunk,
                        alibi_slopes=alibi_slopes)
        return out, kv

    def _apply_rope_qk(self, q, k, metadata, inv_freq=None):
        """Positional-encoding hook; MRoPE models override
        (reference: rotary_embedding.py MRotaryEmbedding)."""
        if inv_freq is None:
            inv_freq = self.inv_freq
        return apply_rope(q, k, metadata.positions, inv_freq,
                          self.args.rope.is_neox_style, self.rope_mscale)

    def compute_logits(self, params: dict,
                       hidden: jnp.ndarray) -> jnp.ndarray:
        logits = lm_head_logits(hidden, params["lm_head"],
                                self.args.logit_soft_cap)
        if self.args.logits_scale is not None:
            logits = logits * jnp.asarray(self.args.logits_scale,
                                          logits.dtype)
        return logits

    # -------------------------------------------------------------- kv spec

    def get_kv_cache_specs(self, block_size: int,
                           cache_dtype: str) -> dict[str, KVCacheSpec]:
        args = self.args
        specs: dict[str, KVCacheSpec] = {}
        for i in range(args.num_layers):
            if args.sliding_window:
                specs[f"layers.{i}"] = SlidingWindowSpec(
                    block_size=block_size,
                    num_kv_heads=args.num_kv_heads,
                    head_size=args.head_dim,
                    dtype=cache_dtype,
                    sliding_window=args.sliding_window)
            else:
                specs[f"layers.{i}"] = FullAttentionSpec(
                    block_size=block_size,
                    num_kv_heads=args.num_kv_heads,
                    head_size=args.head_dim,
                    dtype=cache_dtype)
        return specs

    # --------------------------------------------------------- weight load

    def _hf_layer_map(self) -> dict[str, tuple[str, str, bool]]:
        """HF suffix -> (our layer key, part, transpose).

        part: for fused destinations, which slice ("q"/"k"/"v",
        "gate"/"up"); "" for whole tensors.
        """
        return {
            "self_attn.q_proj.weight": ("qkv.w", "q", True),
            "self_attn.k_proj.weight": ("qkv.w", "k", True),
            "self_attn.v_proj.weight": ("qkv.w", "v", True),
            "self_attn.q_proj.bias": ("qkv.b", "q", False),
            "self_attn.k_proj.bias": ("qkv.b", "k", False),
            "self_attn.v_proj.bias": ("qkv.b", "v", False),
            "self_attn.o_proj.weight": ("o.w", "", True),
            "self_attn.o_proj.bias": ("o.b", "", False),
            "mlp.gate_proj.bias": ("gate_up.b", "gate", False),
            "mlp.up_proj.bias": ("gate_up.b", "up", False),
            "mlp.down_proj.bias": ("down.b", "", False),
            "self_attn.q_norm.weight": ("q_norm", "", False),
            "self_attn.k_norm.weight": ("k_norm", "", False),
            "mlp.gate_proj.weight": ("gate_up.w", "gate", True),
            "mlp.up_proj.weight": ("gate_up.w", "up", True),
            "mlp.down_proj.weight": ("down.w", "", True),
            "input_layernorm.weight": ("input_ln", "", False),
            "post_attention_layernorm.weight": ("post_ln", "", False),
        }

    def _alloc_layer_stack(self, np_dtype) -> dict:
        a = self.args
        L, H, I = a.num_layers, a.hidden_size, a.intermediate_size
        nq, nk, d = a.num_heads, a.num_kv_heads, a.head_dim
        layers: dict[str, Any] = {
            "input_ln": np.empty((L, H), np_dtype),
            "post_ln": np.empty((L, H), np_dtype),
            "qkv": {"w": np.empty((L, H, (nq + 2 * nk) * d), np_dtype)},
            "o": {"w": np.empty((L, nq * d, H), np_dtype)},
            "gate_up": {"w": np.empty((L, H, 2 * I), np_dtype)},
            "down": {"w": np.empty((L, I, H), np_dtype)},
        }
        # biases zero-init (not empty): archs with PARTIAL biases
        # (TeleChat2: down_proj only) leave the rest absent from the
        # checkpoint, and zero is the correct neutral
        if a.attn_bias:
            layers["qkv"]["b"] = np.zeros((L, (nq + 2 * nk) * d), np_dtype)
        if a.o_bias:
            layers["o"]["b"] = np.zeros((L, H), np_dtype)
        if a.mlp_bias:
            layers["gate_up"]["b"] = np.zeros((L, 2 * I), np_dtype)
            layers["down"]["b"] = np.zeros((L, H), np_dtype)
        if a.qk_norm:
            layers["q_norm"] = np.empty((L, d), np_dtype)
            layers["k_norm"] = np.empty((L, d), np_dtype)
        return layers

    def _fused_offset(self, part: str) -> tuple[int, int]:
        """(start, length) of a part inside its fused output dim."""
        a = self.args
        nq, nk, d, I = a.num_heads, a.num_kv_heads, a.head_dim, \
            a.intermediate_size
        table = {
            "q": (0, nq * d),
            "k": (nq * d, nk * d),
            "v": ((nq + nk) * d, nk * d),
            "gate": (0, I),
            "up": (I, I),
        }
        return table[part]

    def load_weights(self, weights_iter) -> dict:
        """Stream (name, np array) pairs into the stacked param pytree."""
        a = self.args
        np_dtype = _np_dtype(self.model_config.dtype)
        layers = self._alloc_layer_stack(np_dtype)
        params: dict[str, Any] = {
            "embed": {"w": np.empty((a.vocab_size, a.hidden_size),
                                    np_dtype)},
            "layers": layers,
            "final_ln": np.empty((a.hidden_size,), np_dtype),
            "lm_head": {"w": np.empty((a.hidden_size, a.vocab_size),
                                      np_dtype)},
        }
        lmap = self._hf_layer_map()
        prefix = self._LAYER_PREFIX + "."
        seen_lm_head = False
        for name, w in weights_iter:
            w = np.asarray(w)
            if name == self._EMBED:
                params["embed"]["w"][...] = w.astype(np_dtype)
                continue
            if name == self._FINAL_NORM:
                params["final_ln"][...] = w.astype(np_dtype)
                continue
            if name == self._LM_HEAD:
                params["lm_head"]["w"][...] = w.T.astype(np_dtype)
                seen_lm_head = True
                continue
            if not name.startswith(prefix):
                continue  # e.g. rotary inv_freq buffers
            rest = name[len(prefix):]
            layer_str, suffix = rest.split(".", 1)
            layer_idx = int(layer_str)
            entry = lmap.get(suffix)
            if entry is None:
                continue
            key, part, transpose = entry
            if transpose:
                w = w.T  # torch [out, in] -> [in, out]
            dest: Any = layers
            *path, leaf = key.split(".")
            for p_ in path:
                dest = dest[p_]
            if part:
                start, length = self._fused_offset(part)
                if leaf == "b":
                    dest[leaf][layer_idx, start:start + length] = \
                        w.astype(np_dtype)
                else:
                    dest[leaf][layer_idx, :, start:start + length] = \
                        w.astype(np_dtype)
            else:
                dest[leaf][layer_idx] = w.astype(np_dtype)
        if a.tie_embeddings and not seen_lm_head:
            params["lm_head"]["w"][...] = params["embed"]["w"].T
        return params

    # ---------------------------------------------- quantized checkpoints

    def load_quantized_weights(self, weights_iter, method: str) -> dict:
        """Ingest a GPTQ/AWQ checkpoint (SURVEY.md §2.4 contracts) into
        fused stacked quant params {w_q, scale, zero} consumable by the
        fused dequant-matmul kernel."""
        from vllm_tpu.models.quant_checkpoints import (unpack_awq,
                                                       unpack_gptq)

        a = self.args
        np_dtype = _np_dtype(self.model_config.dtype)
        tensors: dict[str, np.ndarray] = {}
        params: dict[str, Any] = {
            "embed": {"w": np.empty((a.vocab_size, a.hidden_size),
                                    np_dtype)},
            "final_ln": np.empty((a.hidden_size,), np_dtype),
            "lm_head": {"w": np.empty((a.hidden_size, a.vocab_size),
                                      np_dtype)},
        }
        seen_lm_head = False
        for name, w in weights_iter:
            w = np.asarray(w)
            if name == self._EMBED:
                params["embed"]["w"][...] = w.astype(np_dtype)
            elif name == self._FINAL_NORM:
                params["final_ln"][...] = w.astype(np_dtype)
            elif name == self._LM_HEAD:
                params["lm_head"]["w"][...] = w.T.astype(np_dtype)
                seen_lm_head = True
            else:
                tensors[name] = w
        if a.tie_embeddings and not seen_lm_head:
            params["lm_head"]["w"][...] = params["embed"]["w"].T

        L = a.num_layers
        nq, nk, d, H, I = (a.num_heads, a.num_kv_heads, a.head_dim,
                           a.hidden_size, a.intermediate_size)
        # (our key, [(hf proj name, out_slice_start, out_len)], K)
        fused = {
            "qkv": ([("self_attn.q_proj", 0, nq * d),
                     ("self_attn.k_proj", nq * d, nk * d),
                     ("self_attn.v_proj", (nq + nk) * d, nk * d)], H),
            "o": ([("self_attn.o_proj", 0, H)], nq * d),
            "gate_up": ([("mlp.gate_proj", 0, I),
                         ("mlp.up_proj", I, I)], H),
            "down": ([("mlp.down_proj", 0, H)], I),
        }
        layers: dict[str, Any] = {
            "input_ln": np.empty((L, H), np_dtype),
            "post_ln": np.empty((L, H), np_dtype),
        }
        for li in range(L):
            p = f"{self._LAYER_PREFIX}.{li}."
            layers["input_ln"][li] = tensors.pop(
                p + "input_layernorm.weight").astype(np_dtype)
            layers["post_ln"][li] = tensors.pop(
                p + "post_attention_layernorm.weight").astype(np_dtype)
            for key, (projs, K) in fused.items():
                for proj, start, length in projs:
                    base = p + proj
                    if method == "gptq":
                        g_idx = tensors.pop(base + ".g_idx", None)
                        unpacked = unpack_gptq(
                            tensors.pop(base + ".qweight"),
                            tensors.pop(base + ".qzeros"),
                            tensors.pop(base + ".scales"), g_idx)
                        if "perm" in unpacked:
                            # desc_act checkpoints: repack onto
                            # contiguous groups at load (gptq_shuffle
                            # analog; reference gptq.py:262)
                            from vllm_tpu.models.quant_checkpoints \
                                import requantize_act_order

                            unpacked = requantize_act_order(unpacked)
                    else:  # awq
                        unpacked = unpack_awq(
                            tensors.pop(base + ".qweight"),
                            tensors.pop(base + ".qzeros"),
                            tensors.pop(base + ".scales"))
                    G = unpacked["scale"].shape[0]
                    dest = layers.get(key)
                    if dest is None or "w_q" not in dest:
                        out_dim = sum(x[2] for x in projs)
                        layers[key] = dest = {
                            "w_q": np.empty((L, K, out_dim), np.int8),
                            "scale": np.empty((L, G, out_dim), np.float32),
                            "zero": np.empty((L, G, out_dim), np.float32),
                        }
                    dest["w_q"][li, :, start:start + length] = \
                        unpacked["w_q"]
                    dest["scale"][li, :, start:start + length] = \
                        unpacked["scale"]
                    dest["zero"][li, :, start:start + length] = \
                        unpacked["zero"]
        # GPTQ/AWQ codes are 4-bit: pack two per byte so decode streams
        # half the weight bytes (kernel: fused_packed_int4_matmul).
        from vllm_tpu.models.quant_checkpoints import pack_int4_np

        for key in fused:
            dest = layers.get(key)
            if dest is not None and "w_q" in dest:
                dest["w_p"] = pack_int4_np(dest.pop("w_q"))
        params["layers"] = layers
        return params

    def init_dummy_params(self, rng_seed: int = 0) -> dict:
        """Random params for --load-format dummy (benchmarks).

        Generated in native float32 (ml_dtypes bf16 casts on numpy are
        ~50x slower); the loader casts to the model dtype on device.
        """
        a = self.args
        rng = np.random.default_rng(rng_seed)
        np_dtype = np.float32

        # One random block tiled across each tensor: dummy weights only
        # need plausible magnitudes, and tiling fills at memcpy speed
        # instead of RNG speed (an 8B model is ~30 GB of f32 — the RNG
        # alone would take minutes).
        block = rng.standard_normal(1 << 22, dtype=np.float32) * \
            np.float32(0.02)

        def rand(*shape):
            n = int(np.prod(shape))
            reps = -(-n // block.size)
            out = np.tile(block, reps)[:n]
            return out.reshape(shape)

        layers = self._alloc_layer_stack(np_dtype)

        def fill(tree):
            for k, v in tree.items():
                if isinstance(v, dict):
                    fill(v)
                elif "ln" in k or "norm" in k:
                    tree[k] = np.ones_like(v)
                else:
                    tree[k] = rand(*v.shape)

        fill(layers)
        return {
            "embed": {"w": rand(a.vocab_size, a.hidden_size)},
            "layers": layers,
            "final_ln": np.ones((a.hidden_size,), np_dtype),
            "lm_head": {"w": rand(a.hidden_size, a.vocab_size)},
        }


class MistralForCausalLM(LlamaForCausalLM):
    pass  # sliding_window picked up from the HF config


class Qwen2ForCausalLM(LlamaForCausalLM):

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        # Qwen2 uses qkv bias (not flagged via attention_bias).
        return dataclass_replace(args, attn_bias=True)


class Qwen3ForCausalLM(LlamaForCausalLM):

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        return dataclass_replace(args, qk_norm=True, attn_bias=False)


def dataclass_replace(obj, **kwargs):
    import dataclasses

    return dataclasses.replace(obj, **kwargs)
