"""Qwen2 reward models (reference behavior parity:
vllm/model_executor/models/qwen2_rm.py).

Qwen2 decoder + a two-layer score head (Linear -> ReLU -> Linear)
applied to the LAST token's hidden state per request; served through
the pooling path (PoolingParams task="score"/"classify"). The process
reward model scores one step per request (the reference's per-step
pooling over separator tokens collapses to the request's final step in
this serving layout — documented limitation)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.models.llama import Qwen2ForCausalLM, _np_dtype
from vllm_tpu.ops.attention import AttentionMetadata


class Qwen2ForRewardModel(Qwen2ForCausalLM):

    _num_labels = 1

    def __init__(self, model_config: ModelConfig) -> None:
        super().__init__(model_config)

    def classify(self, params: dict, hidden: jnp.ndarray,
                 metadata: AttentionMetadata) -> jnp.ndarray:
        """[R, num_labels] reward scores from each request's last
        scheduled token."""
        qsl = metadata.query_start_loc
        last = hidden[jnp.maximum(qsl[1:] - 1, 0)]
        h = jax.nn.relu(last @ params["score0"]["w"] +
                        params["score0"]["b"])
        return h @ params["score2"]["w"] + params["score2"]["b"]

    def load_weights(self, weights_iter) -> dict:
        extra: dict[str, np.ndarray] = {}

        def tap(it):
            for name, w in it:
                if name.startswith("score."):
                    extra[name] = np.asarray(w)
                else:
                    yield name, w

        params = super().load_weights(tap(weights_iter))
        npd = _np_dtype(self.model_config.dtype)
        H = self.args.hidden_size
        params["score0"] = {
            "w": extra.get("score.0.weight",
                           np.zeros((H, H), np.float32)).T.astype(npd),
            "b": extra.get("score.0.bias",
                           np.zeros(H, np.float32)).astype(npd),
        }
        params["score2"] = {
            "w": extra.get("score.2.weight",
                           np.zeros((self._num_labels, H),
                                    np.float32)).T.astype(npd),
            "b": extra.get("score.2.bias",
                           np.zeros(self._num_labels,
                                    np.float32)).astype(npd),
        }
        return params


class Qwen2ForProcessRewardModel(Qwen2ForRewardModel):
    _num_labels = 2
