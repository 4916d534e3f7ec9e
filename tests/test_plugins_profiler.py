"""Plugin loader + layerwise profiler (reference:
vllm/plugins/__init__.py, vllm/profiler/layerwise_profile.py)."""

import numpy as np


def test_plugin_allowlist_and_idempotence(monkeypatch):
    import vllm_tpu.plugins as plugins

    monkeypatch.setattr(plugins, "_loaded", False)
    monkeypatch.setenv("VLLM_TPU_PLUGINS", "")
    assert plugins.load_general_plugins() == []
    # second call is a no-op
    assert plugins.load_general_plugins() == []
    assert plugins._allowed("x") is False
    monkeypatch.delenv("VLLM_TPU_PLUGINS")
    assert plugins._allowed("x") is True


def test_oot_model_registration(monkeypatch, tmp_path):
    """An entry-point-registered arch resolves through the registry."""
    import vllm_tpu.plugins as plugins
    from vllm_tpu.models import registry

    monkeypatch.setattr(
        plugins, "load_model_plugins",
        lambda: {"MyOOTForCausalLM": ("vllm_tpu.models.llama",
                                      "LlamaForCausalLM")})
    # resolve_model_cls consults plugins for unknown archs
    import importlib
    cls = registry.resolve_model_cls("MyOOTForCausalLM")
    assert cls.__name__ == "LlamaForCausalLM"


def test_layerwise_summarize_trace(tmp_path):
    """The context manager traces a jitted fn and parses op rows (CPU
    traces may expose no device ops; the API must still behave)."""
    import jax
    import jax.numpy as jnp

    from vllm_tpu.profiler import layerwise_profile

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x.T).sum()

    x = jnp.ones((128, 128))
    with layerwise_profile(str(tmp_path / "trace"), steps=2) as result:
        for _ in range(2):
            f(x).block_until_ready()
    assert result.steps == 2
    assert isinstance(result.device_total_ms_per_step(), float)
    result.print_table(3)  # must not raise
