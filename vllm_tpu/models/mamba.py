"""Pure Mamba-1 language models: Mamba and FalconMamba (reference
behavior parity: vllm/model_executor/models/mamba.py,
falcon_mamba.py).

Every layer is a Mamba-1 selective-SSM mixer in a pre-norm residual
block — no attention, no paged KV; per-request conv/SSM state slots
carry the recurrence (the same MambaSpec mechanism Jamba/Mamba-2 use).
FalconMamba additionally applies WEIGHTLESS RMS norms to the selection
parameters B/C/dt (mixer_rms_eps)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import KVCacheSpec, MambaSpec
from vllm_tpu.models.jamba import mamba1_mixer
from vllm_tpu.models.mamba2 import _pick_chunk, packed_segments
from vllm_tpu.ops.attention import AttentionMetadata
from vllm_tpu.ops.layernorm import rms_norm
from vllm_tpu.ops.linear import embedding_lookup


@dataclass
class MambaArgs:
    vocab_size: int
    hidden_size: int
    num_layers: int
    d_inner: int
    d_state: int
    d_conv: int
    dt_rank: int
    rms_eps: float
    use_bias: bool
    use_conv_bias: bool
    tie_embeddings: bool
    mixer_rms: bool  # FalconMamba weightless B/C/dt norms
    mixer_rms_eps: float

    @staticmethod
    def from_hf_config(hf) -> "MambaArgs":
        H = hf.hidden_size
        d_inner = int(getattr(hf, "intermediate_size", None)
                      or int(getattr(hf, "expand", 2)) * H)
        dt_rank = getattr(hf, "time_step_rank", None)
        if dt_rank in (None, "auto"):
            dt_rank = -(-H // 16)
        return MambaArgs(
            vocab_size=hf.vocab_size,
            hidden_size=H,
            num_layers=hf.num_hidden_layers,
            d_inner=d_inner,
            d_state=int(getattr(hf, "state_size", 16)),
            d_conv=int(getattr(hf, "conv_kernel", 4)),
            dt_rank=int(dt_rank),
            rms_eps=float(getattr(hf, "layer_norm_epsilon", 1e-5)),
            use_bias=bool(getattr(hf, "use_bias", False)),
            use_conv_bias=bool(getattr(hf, "use_conv_bias", True)),
            tie_embeddings=bool(getattr(hf, "tie_word_embeddings",
                                        True)),
            mixer_rms=bool(getattr(hf, "mixer_rms_eps", None)),
            mixer_rms_eps=float(getattr(hf, "mixer_rms_eps", None)
                                or 1e-6),
        )


class MambaForCausalLM:

    is_ssm = True

    def __init__(self, model_config: ModelConfig,
                 args: Optional[MambaArgs] = None) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        self.args = args or MambaArgs.from_hf_config(hf)
        self.dtype = jnp.bfloat16 if model_config.dtype == "bfloat16" \
            else jnp.float32

    def embed(self, params: dict, input_ids: jnp.ndarray) -> jnp.ndarray:
        return embedding_lookup(input_ids, params["embed"]["w"])

    def init_states(self, num_slots: int):
        a = self.args
        return (jnp.zeros((a.num_layers, num_slots + 1, a.d_conv - 1,
                           a.d_inner), self.dtype),
                jnp.zeros((a.num_layers, num_slots + 1, a.d_inner,
                           a.d_state), jnp.float32))

    def get_kv_cache_specs(self, block_size: int,
                           cache_dtype: str) -> dict[str, KVCacheSpec]:
        a = self.args
        el = 2 if self.dtype == jnp.bfloat16 else 4
        conv_bytes = (a.d_conv - 1) * a.d_inner * el
        ssm_bytes = a.d_inner * a.d_state * 4
        return {
            f"layers.{i}": MambaSpec(
                block_size=block_size,
                state_size_bytes=conv_bytes + ssm_bytes)
            for i in range(a.num_layers)
        }

    def forward(self, params: dict, input_ids: jnp.ndarray, kv_caches,
                metadata: AttentionMetadata, lora=None,
                embed_override=None):
        a = self.args
        T = input_ids.shape[0]
        ssm_gi = next(i for i, c in enumerate(kv_caches)
                      if isinstance(c, tuple))
        conv_states, ssm_states = kv_caches[ssm_gi]
        num_slots = conv_states.shape[1] - 1
        seg, seg_start, pad_mask = packed_segments(metadata, T, num_slots)
        chunk = _pick_chunk(T, 64)

        x = self.embed(params, input_ids)
        for li in range(a.num_layers):
            lp = jax.tree.map(jnp.asarray, params["layers"][li])
            h = rms_norm(x, lp["input_ln"], a.rms_eps)
            out, new_conv, new_ssm = mamba1_mixer(
                h, lp, conv_states[li], ssm_states[li], seg, seg_start,
                pad_mask, d_inner=a.d_inner, d_state=a.d_state,
                dt_rank=a.dt_rank, rms_eps=a.mixer_rms_eps, chunk=chunk)
            conv_states = conv_states.at[li].set(new_conv)
            ssm_states = ssm_states.at[li].set(new_ssm)
            x = x + out

        x = rms_norm(x, params["final_ln"], a.rms_eps)
        new_caches = [None] * len(kv_caches)
        new_caches[ssm_gi] = (conv_states, ssm_states)
        return x, new_caches

    def compute_logits(self, params: dict,
                       hidden: jnp.ndarray) -> jnp.ndarray:
        w = params["lm_head"]["w"] if "lm_head" in params \
            else params["embed"]["w"].T
        return jnp.dot(hidden, w.astype(hidden.dtype))

    # ------------------------------------------------------------ weights

    def load_weights(self, weights_iter) -> dict:
        a = self.args
        npd = np.float32 if self.dtype == jnp.float32 else np.dtype(
            "bfloat16")
        layers: list[dict] = [{} for _ in range(a.num_layers)]
        params: dict = {"layers": layers}
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
                    lp["input_ln"] = w.astype(npd)
                elif sub == "mixer.in_proj.weight":
                    lp["in_proj"] = {"w": w.T.astype(npd)}
                elif sub == "mixer.in_proj.bias":
                    lp["in_proj"]["b"] = w.astype(npd)
                elif sub == "mixer.conv1d.weight":
                    lp["conv_w"] = w[:, 0, :].astype(npd)  # [D, K]
                elif sub == "mixer.conv1d.bias":
                    lp["conv_b"] = w.astype(npd)
                elif sub == "mixer.x_proj.weight":
                    lp["x_proj"] = {"w": w.T.astype(npd)}
                elif sub == "mixer.dt_proj.weight":
                    lp.setdefault("dt_proj", {})["w"] = w.T.astype(
                        np.float32)
                elif sub == "mixer.dt_proj.bias":
                    lp.setdefault("dt_proj", {})["b"] = w.astype(
                        np.float32)
                elif sub == "mixer.A_log":
                    lp["A_log"] = w.astype(np.float32)
                elif sub == "mixer.D":
                    lp["D"] = w.astype(np.float32)
                elif sub == "mixer.out_proj.weight":
                    lp["out_proj"] = {"w": w.T.astype(npd)}
                elif sub == "mixer.out_proj.bias":
                    lp["out_proj"]["b"] = w.astype(npd)
        if a.mixer_rms:
            # FalconMamba: weightless RMS on the selection params —
            # mamba1_mixer applies them when the keys are present
            for lp in layers:
                lp["dt_ln"] = np.ones(a.dt_rank, np.float32)
                lp["b_ln"] = np.ones(a.d_state, np.float32)
                lp["c_ln"] = np.ones(a.d_state, np.float32)
        return params

    def init_dummy_params(self, seed: int = 0) -> dict:
        a = self.args
        rng = np.random.default_rng(seed)

        def w(*shape):
            return (rng.standard_normal(shape) * 0.4 /
                    np.sqrt(shape[-1])).astype(np.float32)

        layers = []
        for _ in range(a.num_layers):
            lp = {
                "input_ln": np.ones(a.hidden_size, np.float32),
                "in_proj": {"w": w(a.hidden_size, 2 * a.d_inner)},
                "conv_w": w(a.d_inner, a.d_conv),
                "conv_b": np.zeros(a.d_inner, np.float32),
                "x_proj": {"w": w(a.d_inner,
                                  a.dt_rank + 2 * a.d_state)},
                "dt_proj": {"w": w(a.dt_rank, a.d_inner),
                            "b": np.zeros(a.d_inner, np.float32)},
                "A_log": np.log(np.tile(
                    np.arange(1, a.d_state + 1, dtype=np.float32),
                    (a.d_inner, 1))),
                "D": np.ones(a.d_inner, np.float32),
                "out_proj": {"w": w(a.d_inner, a.hidden_size)},
            }
            if a.mixer_rms:
                lp["dt_ln"] = np.ones(a.dt_rank, np.float32)
                lp["b_ln"] = np.ones(a.d_state, np.float32)
                lp["c_ln"] = np.ones(a.d_state, np.float32)
            layers.append(lp)
        return {
            "embed": {"w": w(a.vocab_size, a.hidden_size)},
            "final_ln": np.ones(a.hidden_size, np.float32),
            "layers": layers,
        }


class FalconMambaForCausalLM(MambaForCausalLM):
    """FalconMamba (reference: models/falcon_mamba.py): Mamba-1 with
    weightless RMS normalization of B/C/dt (config.mixer_rms_eps)."""

    def __init__(self, model_config: ModelConfig) -> None:
        hf = model_config.resolve_hf_config()
        args = MambaArgs.from_hf_config(hf)
        from dataclasses import replace
        args = replace(args, mixer_rms=True,
                       mixer_rms_eps=float(
                           getattr(hf, "mixer_rms_eps", None) or 1e-6))
        super().__init__(model_config, args)
