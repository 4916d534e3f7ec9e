"""Model-weight loading pipeline (reference:
vllm/model_executor/model_loader/default_loader.py, tpu.py).

Streams checkpoint tensors -> model-specific param pytree -> load-time
quantization transform -> device placement (with TP shardings when a mesh
is present).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.config import EngineConfig

logger = logging.getLogger(__name__)

# Linear weights that get quantized (embed/lm_head/norms stay high-prec).
_QUANT_LAYER_KEYS = ("qkv", "o", "gate_up", "down")


def _quantize_stacked(w: np.ndarray, bits: int, group_size: int) -> dict:
    """Symmetric grouped quantization of a stacked weight [L, in, out],
    processed layer-by-layer to bound f32 temporaries (an 8B model's
    gate_up stack alone is 15 GB in f32)."""
    L, in_dim, out_dim = w.shape
    if group_size <= 0 or in_dim % group_size:
        group_size = in_dim
    G = in_dim // group_size
    qmax = 7.0 if bits == 4 else 127.0
    w_q = np.empty((L, in_dim, out_dim), np.int8)
    scale = np.empty((L, G, out_dim), np.float32)
    for li in range(L):
        wf = np.asarray(w[li], np.float32).reshape(G, group_size, out_dim)
        s = np.maximum(np.abs(wf).max(axis=1) / qmax, 1e-10)  # [G, out]
        q = np.clip(np.round(wf / s[:, None, :]), -qmax - 1, qmax)
        w_q[li] = q.reshape(in_dim, out_dim).astype(np.int8)
        scale[li] = s
    if bits == 4:
        # two nibbles per byte: halves weight HBM traffic on decode
        from vllm_tpu.models.quant_checkpoints import pack_int4_np

        return {"w_p": pack_int4_np(w_q), "scale": scale}
    return {"w_q": w_q, "scale": scale}


def _quantize_fp8_stacked(w: np.ndarray) -> dict:
    import ml_dtypes

    L = w.shape[0]
    wf = np.asarray(w, np.float32)
    scale = np.maximum(
        np.abs(wf).reshape(L, -1).max(axis=1) / 448.0, 1e-12)  # [L]
    q = np.clip(wf / scale[:, None, None], -448.0, 448.0)
    return {
        "w_q": q.astype(ml_dtypes.float8_e4m3fn),
        "w_scale": scale.astype(np.float32),
    }


def apply_load_time_quantization(params: dict, method: str,
                                 group_size: int = 128) -> dict:
    """In-place transform of layer linear weights for --quantization
    int8/int4/fp8 on an unquantized checkpoint (reference analog:
    tpu_int8.py:19 XLA-friendly weight-only quantization)."""
    layers = params["layers"]
    for key in _QUANT_LAYER_KEYS:
        p = layers.get(key)
        if p is None or "w" not in p:
            continue
        w = p.pop("w")
        if method in ("int8", "tpu_int8"):
            p.update(_quantize_stacked(w, 8, group_size))
        elif method == "int4":
            p.update(_quantize_stacked(w, 4, group_size))
        elif method == "fp8":
            q = _quantize_fp8_stacked(w)
            # per-layer scale: reshape to broadcast under scan ([L] -> [L])
            p.update(q)
        else:
            raise ValueError(f"unknown quantization method {method!r}")
    return params


def _requant_entry_w8a8(p: dict, wbits: int = 8):
    """One layer-stacked quantized linear {w_p|w_q, scale, zero?, b?}
    -> the execution layout: dequantize the grouped int4/int8 weights
    and requantize per output channel.

    wbits=8 -> {w8, chan_scale}: int8 MXU 2x matmul rate; requant error
    ~2^-8 relative, far under the int4 quantization error itself.
    wbits=4 -> {w4 (split-K-half packed signed nibbles), chan_scale}:
    HALF the weight HBM of w8a8 AND the int8 MXU rate
    (ops/quant.w4a8_matmul) — per-channel int4, so only for weights that
    were int4 to begin with. Host (numpy) and device (jnp) arrays both
    supported; processed layer-by-layer to bound f32 temporaries."""
    packed = "w_p" in p
    w = p["w_p"] if packed else p["w_q"]
    scale, zero = p["scale"], p.get("zero")
    on_device = isinstance(w, jnp.ndarray)
    stacked = w.ndim == 3
    if not stacked:
        w, scale = w[None], scale[None]
        zero = zero[None] if zero is not None else None

    def one(wl, sl, zl):
        xp = jnp if on_device else np
        if packed:
            from vllm_tpu.ops.quant import unpack_int4

            if on_device:
                q = unpack_int4(wl, signed=zl is None).astype(jnp.float32)
            else:
                w32 = wl.astype(np.int32)
                if zl is None:
                    lo = (w32 << 28) >> 28
                    hi = w32 >> 4
                else:
                    lo, hi = w32 & 0xF, (w32 >> 4) & 0xF
                q = np.concatenate([lo, hi], axis=0).astype(np.float32)
        else:
            q = wl.astype(xp.float32)
        K = q.shape[0]
        G = sl.shape[0]
        group = K // G
        q = q.reshape(G, group, -1)
        if zl is not None:
            q = q - zl[:, None, :]
        wf = (q * sl[:, None, :].astype(xp.float32)).reshape(K, -1)
        if wbits == 4:
            cs = xp.maximum(xp.abs(wf).max(axis=0) / 7.0, 1e-10)
            q4 = xp.clip(xp.round(wf / cs[None, :]), -8,
                         7).astype(xp.int32)
            lo, hi = q4[:K // 2], q4[K // 2:]
            pk = (lo & 0xF) | (hi << 4)
            return pk.astype(xp.int8), cs.astype(xp.float32)
        cs = xp.maximum(xp.abs(wf).max(axis=0) / 127.0, 1e-10)
        w8 = xp.clip(xp.round(wf / cs[None, :]), -127, 127)
        return w8.astype(xp.int8), cs.astype(xp.float32)

    if on_device:
        import jax

        # the slices ride as jit ARGUMENTS — closing over the stack
        # would bake it into the HLO as a literal (GBs shipped to the
        # compiler)
        one_j = jax.jit(one)
        pairs = [one_j(w[i], scale[i],
                       zero[i] if zero is not None else None)
                 for i in range(w.shape[0])]
        w8 = jnp.stack([a for a, _ in pairs])
        cs = jnp.stack([b for _, b in pairs])
    else:
        outs = [one(w[i], scale[i],
                    zero[i] if zero is not None else None)
                for i in range(w.shape[0])]
        w8 = np.stack([a for a, _ in outs])
        cs = np.stack([b for _, b in outs])
    if not stacked:
        w8, cs = w8[0], cs[0]
    out = {("w4" if wbits == 4 else "w8"): w8, "chan_scale": cs}
    if "b" in p:
        out["b"] = p["b"]
    return out


def convert_quant_exec(params: dict) -> dict:
    """Rewrite weight-only-quantized layer linears to the W8A8 execution
    layout when VLLM_TPU_QUANT_EXEC=w8a8 (the default; set "native" to
    keep packed int4 / grouped int8 and half the weight HBM)."""
    from vllm_tpu import envs

    mode = envs.VLLM_TPU_QUANT_EXEC
    if mode not in ("w8a8", "w4a8"):
        return params
    layers = params.get("layers") if isinstance(params, dict) else None
    if not isinstance(layers, dict):
        return params
    converted = False
    for key in _QUANT_LAYER_KEYS:
        p = layers.get(key)
        if isinstance(p, dict) and ("w_p" in p or
                                    ("w_q" in p and "scale" in p)):
            if mode == "w4a8" and "w_p" not in p:
                # int8 checkpoints don't round-trip through int4
                layers[key] = _requant_entry_w8a8(p)
            else:
                layers[key] = _requant_entry_w8a8(
                    p, wbits=4 if mode == "w4a8" else 8)
            converted = True
        elif isinstance(p, dict) and "w8" in p:
            converted = True  # emitted in the exec layout directly
    # For a weight-quantized model, the bf16 LM head is the single
    # largest remaining weight (1 GB for a 128k vocab at H=4096) —
    # per-channel int8 frees KV pages that directly bound batch
    # admission (measured: 180 vs 256 concurrent requests on the bench).
    head = params.get("lm_head")
    if converted and isinstance(head, dict) and "w" in head \
            and head.get("b") is None:
        w = head["w"]
        if isinstance(w, jnp.ndarray):
            # chunk over the vocab dim: a whole-array f32 temp is ~2 GB
            # for a 128k vocab and can tip a 16 GB chip mid-load
            def qcols(wc):
                wf = wc.astype(jnp.float32)
                c = jnp.maximum(jnp.max(jnp.abs(wf), axis=0) / 127.0,
                                1e-10)
                q = jnp.clip(jnp.round(wf / c[None, :]), -127,
                             127).astype(jnp.int8)
                return q, c

            qcols_j = jax.jit(qcols)
            V = w.shape[1]
            step = max(1, V // 8)
            parts = [qcols_j(w[:, i:i + step])
                     for i in range(0, V, step)]
            w8 = jnp.concatenate([a for a, _ in parts], axis=1)
            cs = jnp.concatenate([b for _, b in parts])
        else:
            wf = np.asarray(w, np.float32)
            cs = np.maximum(np.abs(wf).max(axis=0) / 127.0, 1e-10)
            w8 = np.clip(np.round(wf / cs[None, :]), -127,
                         127).astype(np.int8)
        params["lm_head"] = {"w8": w8, "chan_scale": cs}
    return params


def _device_dummy_params(model, model_config, quant: Optional[str],
                         group_size: int = 128,
                         mesh=None) -> Optional[Any]:
    """Dummy weights generated ON DEVICE with jax.random — the host path
    first-touches tens of GB of pages and ships them through the device
    tunnel (~6 min for an 8B model in this environment); on-device
    generation takes seconds. Quantized layouts are emitted directly
    (int8/int4 w_q + constant scales) without any f32 staging."""
    if not hasattr(model, "_alloc_layer_stack"):
        return None
    # The on-device generator emits the llama layer-stack structure; a
    # model that overrides init_dummy_params (DeepSeek's dense/MoE stack
    # split, etc.) declares a different structure — use its host path.
    from vllm_tpu.models.llama import LlamaForCausalLM

    if type(model).init_dummy_params is not \
            LlamaForCausalLM.init_dummy_params:
        return None
    if quant is not None and quant not in ("int8", "tpu_int8", "int4"):
        return None  # fp8 dummy keeps the host path
    import jax
    import jax.numpy as jnp

    a = model.args
    np_struct = model._alloc_layer_stack(np.float32)  # np.empty: no touch
    target = jnp.bfloat16 if model_config.dtype == "bfloat16" \
        else jnp.float32
    qbits = {"int8": 8, "tpu_int8": 8, "int4": 4}.get(quant or "")

    def build(key):
        counter = [0]

        def next_key():
            counter[0] += 1
            return jax.random.fold_in(key, counter[0])

        def gen_normal(shape, scale=0.02):
            return (jax.random.normal(next_key(), shape, target) *
                    jnp.asarray(scale, target))

        def gen_quant(shape):
            from vllm_tpu import envs

            L, in_dim, out_dim = shape
            g = group_size if group_size > 0 and in_dim % group_size == 0 \
                else in_dim
            qmax = 127 if qbits == 8 else 7
            # scale so dequantized magnitude ~ N(0, 0.02)-ish
            scale = jnp.full((L, in_dim // g, out_dim),
                             0.02 / (qmax * 0.58), jnp.float32)
            if envs.VLLM_TPU_QUANT_EXEC == "w8a8":
                # emit the execution layout directly: converting a
                # packed stack on device would briefly double-hold the
                # weights (OOM on a 16 GB chip for an 8B model)
                w8 = jax.random.randint(next_key(), shape, -qmax,
                                        qmax + 1, jnp.int8)
                cs = jnp.full((L, out_dim), 0.02 / (qmax * 0.58),
                              jnp.float32)
                if qbits == 8:
                    return {"w8": w8, "chan_scale": cs}
                # int4 semantics: values in [-7, 7] rescaled to int8
                return {"w8": (w8.astype(jnp.int32) * 18).astype(
                    jnp.int8), "chan_scale": cs / 18.0}
            if qbits == 4:
                # packed layout: uniform random bytes = uniform nibbles
                w_p = jax.random.randint(next_key(),
                                         (L, in_dim // 2, out_dim),
                                         -128, 128, jnp.int8)
                return {"w_p": w_p, "scale": scale}
            w_q = jax.random.randint(next_key(), shape, -qmax, qmax + 1,
                                     jnp.int8)
            return {"w_q": w_q, "scale": scale}

        layers: dict[str, Any] = {}
        for k, v in np_struct.items():
            if isinstance(v, dict):
                if qbits is not None and k in _QUANT_LAYER_KEYS:
                    sub = gen_quant(v["w"].shape)
                    if "b" in v:
                        sub["b"] = jnp.zeros(v["b"].shape, target)
                    layers[k] = sub
                else:
                    layers[k] = {
                        kk: (gen_normal(vv.shape) if kk in ("w", "w_q")
                             else jnp.zeros(vv.shape, target))
                        for kk, vv in v.items()
                    }
            elif "ln" in k or "norm" in k:
                layers[k] = jnp.ones(v.shape, target)
            else:
                layers[k] = gen_normal(v.shape)

        return {
            "embed": {"w": gen_normal((a.vocab_size, a.hidden_size))},
            "layers": layers,
            "final_ln": jnp.ones((a.hidden_size,), target),
            "lm_head": {"w": gen_normal((a.hidden_size, a.vocab_size))},
        }

    # one jitted program: a single device launch + compile round-trip
    params = jax.jit(build)(jax.random.PRNGKey(model_config.seed))
    jax.block_until_ready(params)
    return params


def resolve_model_dir(model: str) -> str:
    if os.path.isdir(model):
        return model
    # No network egress in this environment: require a local path or an
    # already-populated HF cache.
    try:
        from huggingface_hub import snapshot_download

        return snapshot_download(model, local_files_only=True)
    except Exception as e:
        raise FileNotFoundError(
            f"model {model!r} is not a local directory and is not in the "
            f"local HF cache ({e})") from e


def load_model_params(model, engine_config: EngineConfig,
                      mesh=None) -> Any:
    model_config = engine_config.model_config
    load_format = engine_config.load_config.load_format

    quant = model_config.quantization
    if load_format == "dummy":
        params = _device_dummy_params(model, model_config, quant,
                                      mesh=mesh)
        if params is None:  # model family without stacked-layer alloc
            params = model.init_dummy_params(model_config.seed)
            if quant is not None:
                params = apply_load_time_quantization(params, quant)
    elif load_format == "sharded_state":
        t0 = time.perf_counter()
        params = load_sharded_state(resolve_model_dir(model_config.model))
        logger.info("sharded state restored in %.1fs",
                    time.perf_counter() - t0)
    else:
        from vllm_tpu.models.quant_checkpoints import \
            detect_checkpoint_quantization
        from vllm_tpu.models.weight_utils import weights_iterator

        model_dir = resolve_model_dir(model_config.model)
        ckpt_quant = detect_checkpoint_quantization(
            getattr(model_config.resolve_hf_config(), "quantization_config",
                    None))
        t0 = time.perf_counter()
        if ckpt_quant in ("gptq", "awq"):
            params = model.load_quantized_weights(
                weights_iterator(model_dir), ckpt_quant)
        else:
            params = model.load_weights(weights_iterator(model_dir))
            if quant is not None:
                params = apply_load_time_quantization(params, quant)
        logger.info("checkpoint streamed in %.1fs", time.perf_counter() - t0)

    # W8A8 execution layout for weight-only-quantized linears (no-op for
    # unquantized params or VLLM_TPU_QUANT_EXEC=native).
    if isinstance(params, dict):
        params = convert_quant_exec(params)

    # Device placement (sharded when a mesh is given). Float32 leaves are
    # cast to the model dtype on device (host bf16 casts are slow).
    target = jnp.bfloat16 if model_config.dtype == "bfloat16" else None

    def put(x, sharding=None):
        arr = jnp.asarray(x)
        if target is not None and arr.dtype == jnp.float32:
            arr = arr.astype(target)
        return jax.device_put(arr, sharding) if sharding is not None \
            else jax.device_put(arr)

    if mesh is not None:
        from vllm_tpu.parallel.mesh import param_shardings

        shardings = param_shardings(
            params, mesh,
            enable_expert_parallel=engine_config.parallel_config
            .enable_expert_parallel)
        params = jax.tree.map(put, params, shardings)
    else:
        params = jax.tree.map(put, params)

    cache_dtype = engine_config.cache_config.cache_dtype
    if (cache_dtype in ("int8", "fp8", "fp8_e4m3", "fp8_e5m2")
            and getattr(model, "kv_scale_calibration", False)
            and isinstance(params, dict) and "layers" in params):
        if jax.process_count() > 1:
            logger.warning(
                "kv-scale calibration skipped under multi-host launch; "
                "low-precision KV cache runs at unit scale")
        else:
            t0 = time.perf_counter()
            ks, vs = calibrate_kv_scales(model, params, cache_dtype)
            params["layers"]["kv_scale_k"] = jax.device_put(ks)
            params["layers"]["kv_scale_v"] = jax.device_put(vs)
            logger.info("kv %s scales calibrated in %.1fs", cache_dtype,
                        time.perf_counter() - t0)
    return params


def calibrate_kv_scales(model, params, cache_dtype: str,
                        num_tokens: int = 256, block_size: int = 16,
                        seed: int = 0):
    """Per-layer per-head dequant scales for a low-precision KV cache.

    One full-precision-cache forward over random token ids (real
    embedding/weight statistics; K/V magnitudes are position-independent
    under RoPE) leaves every layer's K/V rows in the returned cache —
    reduce abs-max per (layer, kv_head) and map the observed range onto
    the cache dtype's. Write-side quantization divides by these scales
    (ops/attention.py write_kv_cache) and the read side folds them into
    q / the attention output exactly (ops/attention.py attention()).
    Reference analog: checkpoint-provided k_scale/v_scale consumed by
    csrc paged attention; here the engine self-calibrates at load
    because TPU serving must not depend on CUDA-tool-produced scales.
    """
    import numpy as np

    from vllm_tpu.ops.attention import AttentionMetadata
    from vllm_tpu.ops.pallas.ragged_paged_attention import \
        build_logical_blocks
    from vllm_tpu.utils import cdiv

    a = model.args
    T = int(min(num_tokens, getattr(a, "max_position", 2048)))
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, a.vocab_size, T, dtype=np.int64).astype(np.int32)
    nb = cdiv(T, block_size) + 1
    qsl = np.array([0, T], np.int32)
    lb_seq, lb_q_start = build_logical_blocks(qsl, T, 1)
    bt = np.arange(1, nb + 1, dtype=np.int32)[None]
    pos = np.arange(T, dtype=np.int32)
    slots = (bt[0][pos // block_size] * block_size +
             pos % block_size).astype(np.int32)
    md = AttentionMetadata(
        slot_mapping=jnp.asarray(slots),
        block_tables=jnp.asarray(bt),
        query_start_loc=jnp.asarray(qsl),
        seq_lens=jnp.asarray(np.array([T], np.int32)),
        positions=jnp.asarray(pos),
        lb_seq=jnp.asarray(lb_seq),
        lb_q_start=jnp.asarray(lb_q_start))
    kv = jnp.zeros((a.num_layers, nb + 2, 2 * a.num_kv_heads,
                    block_size, a.head_dim), model.dtype)

    # jit the whole calibration forward and reduce ON DEVICE: run eagerly
    # this is thousands of per-op dispatches (130s measured through the
    # remote-runtime tunnel) and a multi-MB cache fetch; jitted it is one
    # persistently-cacheable compile + a [L, 2K] fetch
    def _amax_fwd(p, ids_dev, kv_dev, md_dev):
        _, new_kv = model.forward(p, ids_dev, [kv_dev], md_dev)
        c = new_kv[0].astype(jnp.float32)
        return jnp.max(jnp.abs(c), axis=(1, 3, 4))  # [L, 2K]

    amax = np.asarray(jax.jit(_amax_fwd)(params, jnp.asarray(ids), kv, md))
    denom = {"int8": 127.0, "fp8": 448.0, "fp8_e4m3": 448.0,
             "fp8_e5m2": 57344.0}[cache_dtype]
    scales = np.maximum(amax, 1e-6) / denom
    K = a.num_kv_heads
    return (jnp.asarray(scales[:, :K], jnp.float32),
            jnp.asarray(scales[:, K:], jnp.float32))


# --------------------------------------------------------------- sharded state

_SHARDED_MANIFEST = "vllm_tpu_sharded_state.json"


def save_sharded_state(params, path: str) -> None:
    """Persist the fully-processed (quantized, fused, stacked) device
    param tree so a restart skips checkpoint streaming + re-quantization
    (reference: model_loader/sharded_state_loader.py ShardedStateLoader).

    One .npy per leaf (np.save handles ml_dtypes like bfloat16) + a json
    manifest recording the key path of each leaf.
    """
    import json

    import jax

    os.makedirs(path, exist_ok=True)
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    manifest = []
    for i, (kp, leaf) in enumerate(leaves):
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in kp)
        fname = f"shard_{i:05d}.npy"
        arr = np.asarray(leaf)
        dtype = str(arr.dtype)
        if arr.dtype.itemsize and not arr.dtype.isbuiltin:
            # custom dtypes (ml_dtypes bfloat16/fp8) round-trip as raw
            # bytes; the manifest records the true dtype
            arr = arr.view(np.uint8 if arr.dtype.itemsize == 1
                           else np.uint16)
        np.save(os.path.join(path, fname), arr, allow_pickle=False)
        manifest.append({"key": key, "file": fname, "dtype": dtype})
    with open(os.path.join(path, _SHARDED_MANIFEST), "w") as f:
        json.dump(manifest, f)


def has_sharded_state(path: str) -> bool:
    return os.path.exists(os.path.join(path, _SHARDED_MANIFEST))


def load_sharded_state(path: str):
    """Rebuild the param tree saved by save_sharded_state."""
    import json

    with open(os.path.join(path, _SHARDED_MANIFEST)) as f:
        manifest = json.load(f)
    params: dict = {}
    for ent in manifest:
        parts = ent["key"].split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        arr = np.load(os.path.join(path, ent["file"]),
                      allow_pickle=False)
        dtype = ent.get("dtype")
        if dtype and str(arr.dtype) != dtype:
            import ml_dtypes  # noqa: F401 — registers custom dtypes

            arr = arr.view(np.dtype(dtype))
        node[parts[-1]] = arr

    def listify(node):
        if isinstance(node, dict):
            node = {k: listify(v) for k, v in node.items()}
            if node and all(k.isdigit() for k in node):
                return [node[str(i)] for i in range(len(node))]
        return node

    return listify(params)
