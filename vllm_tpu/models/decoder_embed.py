"""Decoder-only embedding models (reference: the reference registry
maps bare LlamaModel/Qwen2Model/MistralModel/Gemma2Model arch strings
onto the causal classes and serves them through the pooling path —
e5-mistral, gte-Qwen2, SFR-Embedding families).

Bare *Model checkpoints store weights WITHOUT the "model." prefix and
carry no lm_head; the wrappers rewrite names at load and tie the head
to the embedding so the (discarded) logits stay finite."""

from __future__ import annotations

from vllm_tpu.models.gemma import Gemma2ForCausalLM
from vllm_tpu.models.llama import LlamaForCausalLM, MistralForCausalLM, \
    Qwen2ForCausalLM


def _with_model_prefix(weights_iter):
    for name, w in weights_iter:
        if not name.startswith(("model.", "lm_head.")):
            name = "model." + name
        yield name, w


class _EmbeddingMixin:

    def load_weights(self, weights_iter):
        params = super().load_weights(_with_model_prefix(weights_iter))
        if not self.args.tie_embeddings:
            # no lm_head in a bare-backbone checkpoint: tie it so the
            # sampling path (whose outputs pooling discards) is finite
            lm = params["lm_head"]
            if isinstance(lm, dict) and "w" in lm:
                lm["w"][...] = params["embed"]["w"][
                    :lm["w"].shape[1]].T
        return params


class LlamaModel(_EmbeddingMixin, LlamaForCausalLM):
    pass


class MistralModel(_EmbeddingMixin, MistralForCausalLM):
    pass


class Qwen2Model(_EmbeddingMixin, Qwen2ForCausalLM):
    pass


class Gemma2Model(_EmbeddingMixin, Gemma2ForCausalLM):
    pass
