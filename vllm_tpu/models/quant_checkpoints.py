"""GPTQ / AWQ / compressed-tensors / FP8 checkpoint ingestion.

Checkpoint contracts replicated from the reference (SURVEY.md §2.4):
- GPTQ  (vllm gptq.py:177-241): qweight int32 [K/8, N] packed along the
  INPUT dim (8 x 4-bit nibbles per int32, low-to-high), qzeros int32
  [K/group, N/8], scales fp16 [K/group, N], g_idx int32 [K] act-order
  group map. Dequant: w[k,n] = scales[g,n] * (q[k,n] - (qzeros[g,n] + 1)).
- AWQ   (vllm awq.py:158-195): qweight int32 [K, N/8] packed along the
  OUTPUT dim in the interleaved order [0,4,1,5,2,6,3,7], qzeros int32
  [K/group, N/8] same packing, scales [K/group, N].
  Dequant: w[k,n] = scales[g,n] * (q[k,n] - qzeros[g,n]).
- FP8 (vllm fp8.py:303-330): weight e4m3 [N, K] + scalar weight_scale
  (per-tensor) or weight_scale_inv blocks; optional input_scale.

At load these unpack into the engine's TPU layout (the analog of the
reference's gptq_shuffle / marlin repack step): w_q int8 [K, N] raw
codes, scale f32 [G, N], zero f32 [G, N]; act-order adds an input
permutation so groups are contiguous for the fused kernel.
"""

from __future__ import annotations

import numpy as np

AWQ_ORDER = np.array([0, 4, 1, 5, 2, 6, 3, 7])


def unpack_int32_nibbles(packed: np.ndarray, axis: int) -> np.ndarray:
    """int32 array -> uint8 nibbles expanded 8x along `axis` (low bits
    first)."""
    shifts = np.arange(8, dtype=np.uint32) * 4
    u = packed.astype(np.uint32)
    u = np.expand_dims(u, axis + 1)
    nibbles = (u >> shifts.reshape([-1 if i == axis + 1 else 1
                                    for i in range(u.ndim)])) & 0xF
    shape = list(packed.shape)
    shape[axis] = shape[axis] * 8
    return nibbles.reshape(shape).astype(np.uint8)


def unpack_gptq(qweight: np.ndarray, qzeros: np.ndarray,
                scales: np.ndarray,
                g_idx: np.ndarray | None) -> dict:
    """-> {w_q int8 [K,N], scale f32 [G,N], zero f32 [G,N], perm?}."""
    w = unpack_int32_nibbles(qweight, axis=0)  # [K, N] uint8 codes
    z = unpack_int32_nibbles(qzeros, axis=1)  # [G, N]
    zero = z.astype(np.float32) + 1.0  # the GPTQ +1 convention
    scale = scales.astype(np.float32)
    K = w.shape[0]
    G = scale.shape[0]
    group = K // G
    out = {
        "w_q": w.astype(np.int8),
        "scale": scale,
        "zero": zero,
    }
    if g_idx is not None and len(g_idx) and not np.array_equal(
            g_idx, np.arange(K) // group):
        # act-order: permute rows so each group's rows are contiguous;
        # the runtime applies the same permutation to the activations.
        perm = np.argsort(g_idx, kind="stable").astype(np.int32)
        out["w_q"] = out["w_q"][perm]
        out["perm"] = perm
    return out


def unpack_awq(qweight: np.ndarray, qzeros: np.ndarray,
               scales: np.ndarray) -> dict:
    def unpack_out(packed):
        n = unpack_int32_nibbles(packed, axis=packed.ndim - 1)
        # undo the AWQ interleave within each 8-lane pack
        shape = n.shape
        n = n.reshape(*shape[:-1], shape[-1] // 8, 8)
        inv = np.argsort(AWQ_ORDER)
        n = n[..., inv]
        return n.reshape(shape)

    w = unpack_out(qweight)  # [K, N]
    z = unpack_out(qzeros).astype(np.float32)  # [G, N]
    return {
        "w_q": w.astype(np.int8),
        "scale": scales.astype(np.float32),
        "zero": z,
    }


def requantize_act_order(unpacked: dict, bits: int = 4) -> dict:
    """Act-order (``desc_act=True``) repack: exact dequant through the
    g_idx group map, then an asymmetric requantization onto CONTIGUOUS
    groups in natural channel order (TPU load-time analog of the
    reference's gptq_shuffle, vllm gptq.py:262 — the serving layout
    indexes groups as k//group with no per-row indirection).

    The requant is the only lossy step: int4 codes re-gridded onto new
    group ranges. For the default w8a8 execution layout the codes are
    requantized per-channel int8 downstream, where this intermediate adds
    ~1e-3 relative error (tests/test_quant_checkpoints.py bounds it)."""
    w = dequant_reference(unpacked)  # [K, N] f32, natural channel order
    K, N = w.shape
    G = unpacked["scale"].shape[0]
    group = K // G
    qmax = float((1 << bits) - 1)
    wg = w.reshape(G, group, N)
    wmin = wg.min(axis=1)
    wmax = wg.max(axis=1)
    scale = np.maximum((wmax - wmin) / qmax, 1e-10).astype(np.float32)
    zero = (-wmin / scale).astype(np.float32)
    q = np.clip(np.round(wg / scale[:, None] + zero[:, None]), 0, qmax)
    return {
        "w_q": q.reshape(K, N).astype(np.int8),
        "scale": scale,
        "zero": zero,
    }


def pack_int4_np(w_q: np.ndarray) -> np.ndarray:
    """Host-side split-K-half nibble packing (device analog:
    ops/quant.py pack_int4): byte row r holds K-row r (low nibble) and
    K-row r + K/2 (high). Works for signed [-8,7] and unsigned [0,15]
    codes — same low-4-bit layout either way."""
    K = w_q.shape[-2]
    assert K % 2 == 0, K
    lo = w_q[..., :K // 2, :].astype(np.int32) & 0xF
    hi = w_q[..., K // 2:, :].astype(np.int32) & 0xF
    return (lo | (hi << 4)).astype(np.uint8).view(np.int8)


def dequant_reference(q: dict) -> np.ndarray:
    """Oracle dequant of the unpacked layout (tests + golden checks)."""
    w_q = q["w_q"].astype(np.float32)
    K, N = w_q.shape
    G = q["scale"].shape[0]
    group = K // G
    w = w_q.reshape(G, group, N)
    w = (w - q["zero"][:, None, :]) * q["scale"][:, None, :]
    w = w.reshape(K, N)
    if "perm" in q:
        inv = np.empty_like(q["perm"])
        inv[q["perm"]] = np.arange(K)
        w = w[inv]
    return w


def detect_checkpoint_quantization(quant_config: dict | None
                                   ) -> str | None:
    if not quant_config:
        return None
    method = quant_config.get("quant_method", "").lower()
    if method in ("gptq", "awq", "fp8", "compressed-tensors"):
        return method
    return None
