"""Mamba2 state-space ops, TPU-native (reference:
vllm/model_executor/layers/mamba/{mamba_mixer2.py, ops/ssd_*} — there,
Triton/CUDA selective-scan kernels; here, the chunked SSD formulation
as dense einsums + a `lax.scan` over chunks, which XLA maps onto the
MXU: within a chunk the recurrence is expanded into an attention-like
[Q, Q] decay-masked matmul, and only the tiny per-chunk state
[H, P, N] is carried sequentially).

All ops take/return explicit state so the serving path can persist
per-request SSM state between steps (constant-size analog of the KV
cache; see MambaSpec in core/kv_cache_interface.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def causal_conv1d(
    x: jnp.ndarray,  # [T, C]
    weight: jnp.ndarray,  # [C, K] depthwise taps
    bias: Optional[jnp.ndarray] = None,  # [C]
    initial_state: Optional[jnp.ndarray] = None,  # [K-1, C] trailing inputs
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Depthwise causal conv (reference: causal_conv1d kernels). Returns
    (y [T, C], final_state [K-1, C]) — final_state is the last K-1
    inputs, ready to seed the next call (decode continuation)."""
    T, C = x.shape
    K = weight.shape[1]
    if initial_state is None:
        initial_state = jnp.zeros((K - 1, C), x.dtype)
    ext = jnp.concatenate([initial_state.astype(x.dtype), x], axis=0)
    y = jnp.zeros((T, C), jnp.float32)
    for k in range(K):  # K is tiny (4): unrolled shifts fuse into one op
        y = y + ext[k:k + T].astype(jnp.float32) * weight[:, k]
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype), ext[T:]


def ssd_chunked(
    x: jnp.ndarray,  # [T, H, P]
    dt: jnp.ndarray,  # [T, H] (post-softplus, >= 0)
    A: jnp.ndarray,  # [H] (negative)
    B: jnp.ndarray,  # [T, G, N]
    C: jnp.ndarray,  # [T, G, N]
    chunk_size: int = 64,
    initial_state: Optional[jnp.ndarray] = None,  # [H, P, N]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Chunked state-space-dual scan (reference: ops/ssd_combined.py
    mamba_chunk_scan_combined).

    Recurrence per head: h_t = exp(dt_t A) h_{t-1} + dt_t B_t x_t^T,
    y_t = C_t h_t. Returns (y [T, H, P], final_state [H, P, N]).
    T must be a multiple of chunk_size (pad with dt=0 rows: decay 1,
    contribution 0 — state passes through unchanged).
    """
    T, H, P = x.shape
    G, N = B.shape[1], B.shape[2]
    if T % chunk_size != 0:
        raise ValueError(f"T={T} not a multiple of chunk {chunk_size}")
    reps = H // G  # heads per B/C group
    if initial_state is None:
        initial_state = jnp.zeros((H, P, N), jnp.float32)

    nc = T // chunk_size
    xc = x.reshape(nc, chunk_size, H, P).astype(jnp.float32)
    dtc = dt.reshape(nc, chunk_size, H).astype(jnp.float32)
    Bc = jnp.repeat(B.reshape(nc, chunk_size, G, N), reps,
                    axis=2).astype(jnp.float32)  # [nc, Q, H, N]
    Cc = jnp.repeat(C.reshape(nc, chunk_size, G, N), reps,
                    axis=2).astype(jnp.float32)
    Af = A.astype(jnp.float32)

    def chunk_step(state, inp):
        xq, dtq, Bq, Cq = inp  # [Q,H,P], [Q,H], [Q,H,N], [Q,H,N]
        dA = dtq * Af  # [Q, H] log-decays
        cum = jnp.cumsum(dA, axis=0)  # inclusive
        # intra-chunk: y_t += sum_{s<=t} (C_t.B_s) e^{cum_t-cum_s} dt_s x_s
        Gm = jnp.einsum("thn,shn->tsh", Cq, Bq)
        causal = (jnp.arange(chunk_size)[:, None] >=
                  jnp.arange(chunk_size)[None, :])[:, :, None]
        # mask INSIDE the exp: the anti-causal (t < s) exponents are
        # positive and overflow to inf for large |A*dt|; inf * 0 = NaN
        decay = jnp.exp(jnp.where(causal,
                                  cum[:, None, :] - cum[None, :, :],
                                  -jnp.inf))
        M = Gm * decay * dtq[None, :, :]
        y = jnp.einsum("tsh,shp->thp", M, xq)
        # inter-chunk: y_t += e^{cum_t} C_t . state
        y = y + jnp.einsum("thn,hpn->thp", Cq, state) * \
            jnp.exp(cum)[:, :, None]
        # state update: e^{cum_Q} state + sum_s e^{cum_Q-cum_s} dt_s B_s x_s
        tail = jnp.exp(cum[-1][None] - cum)  # [Q, H]
        new_state = state * jnp.exp(cum[-1])[:, None, None] + jnp.einsum(
            "shn,shp,sh->hpn", Bq, xq, tail * dtq)
        return new_state, y

    final_state, ys = jax.lax.scan(chunk_step, initial_state,
                                   (xc, dtc, Bc, Cc))
    return ys.reshape(T, H, P).astype(x.dtype), final_state


def ssd_chunked_segmented(
    x: jnp.ndarray,  # [T, H, P] packed multi-request stream
    dt: jnp.ndarray,  # [T, H] (post-softplus; forced 0 on padding rows)
    A: jnp.ndarray,  # [H]
    B: jnp.ndarray,  # [T, G, N]
    C: jnp.ndarray,  # [T, G, N]
    seg: jnp.ndarray,  # i32[T] request row per token (R for padding)
    states: jnp.ndarray,  # [R+1, H, P, N] per-request carry-in
    chunk_size: int = 64,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Segment-aware chunked SSD over a PACKED batch (reference:
    ops/ssd_combined.py seq_idx support): each request's contiguous
    token span scans against its own carried state; cross-request
    decay terms are masked out. Returns (y [T, H, P],
    states [R+1, H, P, N]) with each present request's row updated
    (row R is a scratch row for padding tokens).
    """
    T, H, P = x.shape
    G, N = B.shape[1], B.shape[2]
    R1 = states.shape[0]
    reps = H // G
    if T % chunk_size != 0:
        raise ValueError(f"T={T} not a multiple of chunk {chunk_size}")
    nc = T // chunk_size
    xc = x.reshape(nc, chunk_size, H, P).astype(jnp.float32)
    dtc = dt.reshape(nc, chunk_size, H).astype(jnp.float32)
    Bc = jnp.repeat(B.reshape(nc, chunk_size, G, N), reps,
                    axis=2).astype(jnp.float32)
    Cc = jnp.repeat(C.reshape(nc, chunk_size, G, N), reps,
                    axis=2).astype(jnp.float32)
    segc = seg.reshape(nc, chunk_size)
    Af = A.astype(jnp.float32)
    idx = jnp.arange(chunk_size)

    def chunk_step(states, inp):
        xq, dtq, Bq, Cq, sq = inp
        dA = dtq * Af
        cum = jnp.cumsum(dA, axis=0)  # [Q, H] chunk-local inclusive
        same = (sq[:, None] == sq[None, :])  # [Q, Q]
        # intra-chunk (exact for same-segment pairs: segments contiguous)
        Gm = jnp.einsum("thn,shn->tsh", Cq, Bq)
        causal = (idx[:, None] >= idx[None, :])
        ok = (causal & same)[:, :, None]
        # mask INSIDE the exp (see ssd_chunked): anti-causal and
        # cross-segment exponents can overflow to inf; inf * 0 = NaN
        decay = jnp.exp(jnp.where(ok, cum[:, None, :] - cum[None, :, :],
                                  -jnp.inf))
        M = Gm * decay * dtq[None, :, :]
        y = jnp.einsum("tsh,shp->thp", M, xq)
        # segment-local cumulative decay: cum_t minus cum just before the
        # segment's first token in this chunk (0 if it starts the chunk)
        first = jnp.min(jnp.where(same, idx[None, :], chunk_size), axis=1)
        ent = jnp.where((first > 0)[:, None],
                        cum[jnp.maximum(first - 1, 0)], 0.0)
        scum = cum - ent  # [Q, H]
        # carry-in state contribution
        y = y + jnp.einsum("thn,thpn->thp", Cq,
                           states[sq]) * jnp.exp(scum)[:, :, None]
        # per-request state update
        last = jnp.max(jnp.where(same, idx[None, :], -1), axis=1)
        tail = jnp.exp(scum[last] - scum)  # decay from s to its seg end
        contrib = jnp.einsum("shn,shp,sh->shpn", Bq, xq, tail * dtq)
        seg_contrib = jax.ops.segment_sum(contrib, sq, num_segments=R1)
        seg_decay = jnp.exp(jax.ops.segment_sum(dA, sq, num_segments=R1))
        states = states * seg_decay[:, :, None, None] + seg_contrib
        return states, y

    states, ys = jax.lax.scan(chunk_step, states.astype(jnp.float32),
                              (xc, dtc, Bc, Cc, segc))
    return ys.reshape(T, H, P).astype(x.dtype), states


def causal_conv1d_segmented(
    x: jnp.ndarray,  # [T, C] packed stream
    weight: jnp.ndarray,  # [C, K]
    bias: Optional[jnp.ndarray],  # [C]
    seg: jnp.ndarray,  # i32[T] request row (R for padding)
    seg_start: jnp.ndarray,  # i32[T] packed index of token's seg start
    conv_state: jnp.ndarray,  # [R+1, K-1, C] last K-1 inputs per request
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Depthwise causal conv over a packed batch: taps reaching before a
    request's first token in this step read from its carried conv
    state. Returns (y [T, C], new conv_state)."""
    T, Ch = x.shape
    K = weight.shape[1]
    t = jnp.arange(T)
    off = t - seg_start  # token's offset within its request's span
    xf = x.astype(jnp.float32)
    y = xf * weight[:, K - 1]
    for k in range(1, K):
        in_span = off >= k
        x_tap = x[jnp.maximum(t - k, 0)]
        st_tap = conv_state[seg, jnp.clip(K - 1 + off - k, 0, K - 2)]
        tap = jnp.where(in_span[:, None], x_tap, st_tap)
        y = y + tap.astype(jnp.float32) * weight[:, K - 1 - k]
    if bias is not None:
        y = y + bias
    # new state: the request's last K-1 inputs (old state shifted in if
    # the request contributed fewer than K-1 tokens this step)
    n_tok = jax.ops.segment_sum(jnp.ones_like(seg), seg,
                                num_segments=conv_state.shape[0])
    last = jax.ops.segment_max(t, seg,
                               num_segments=conv_state.shape[0])  # [R+1]
    j = jnp.arange(K - 1)
    src_off = n_tok[:, None] + j[None, :] - (K - 1)  # offset into span
    gather_idx = jnp.clip(seg_start[jnp.clip(last, 0, T - 1)][:, None] +
                          src_off, 0, T - 1)
    from_x = x[gather_idx]  # [R+1, K-1, C]
    from_old = jnp.take_along_axis(
        conv_state, jnp.clip(j[None, :] + n_tok[:, None], 0,
                             K - 2)[:, :, None].repeat(Ch, 2), axis=1)
    new_state = jnp.where((src_off >= 0)[:, :, None], from_x, from_old)
    present = n_tok > 0
    new_state = jnp.where(present[:, None, None], new_state, conv_state)
    return y.astype(x.dtype), new_state.astype(conv_state.dtype)


def ssd_update(
    x: jnp.ndarray,  # [H, P] single token
    dt: jnp.ndarray,  # [H]
    A: jnp.ndarray,  # [H]
    B: jnp.ndarray,  # [G, N]
    C: jnp.ndarray,  # [G, N]
    state: jnp.ndarray,  # [H, P, N]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-step decode recurrence (reference: selective_state_update).
    Returns (y [H, P], new_state)."""
    H, P = x.shape
    G = B.shape[0]
    reps = H // G
    Bh = jnp.repeat(B, reps, axis=0).astype(jnp.float32)  # [H, N]
    Ch = jnp.repeat(C, reps, axis=0).astype(jnp.float32)
    decay = jnp.exp(dt.astype(jnp.float32) * A.astype(jnp.float32))
    new_state = state * decay[:, None, None] + \
        (dt.astype(jnp.float32)[:, None] * x.astype(jnp.float32))[:, :, None] * \
        Bh[:, None, :]
    y = jnp.einsum("hpn,hn->hp", new_state, Ch)
    return y.astype(x.dtype), new_state


def gated_rms_norm(x: jnp.ndarray, gate: jnp.ndarray, weight: jnp.ndarray,
                   eps: float) -> jnp.ndarray:
    """Mamba2 gated norm (reference: mamba_mixer2.py Mixer2RMSNormGated):
    rmsnorm(x * silu(gate)) * weight."""
    xf = x.astype(jnp.float32) * jax.nn.silu(gate.astype(jnp.float32))
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * weight).astype(x.dtype)


# ------------------------------------------------------------------ mamba-1

def selective_scan_segmented(
    x: jnp.ndarray,  # [T, D] packed multi-request stream (post-conv/silu)
    dt: jnp.ndarray,  # [T, D] (post-softplus; forced 0 on padding rows)
    A: jnp.ndarray,  # [D, N] (negative)
    B: jnp.ndarray,  # [T, N]
    C: jnp.ndarray,  # [T, N]
    seg: jnp.ndarray,  # i32[T] request row per token (R for padding)
    states: jnp.ndarray,  # [R+1, D, N] per-request carry-in
    chunk_size: int = 64,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mamba-1 selective scan over a PACKED batch (reference:
    csrc/mamba/mamba_ssm/selective_scan_fwd.cu — re-derived for TPU as a
    chunked associative scan: per-channel decays a_t = exp(dt_t ⊙ A)
    compose associatively, so each chunk scans in log2(Q) vectorized
    passes and only the [R+1, D, N] state crosses chunks).

    Recurrence per channel d: h_t = exp(dt_td A_d) h_{t-1} +
    dt_td x_td B_t ; y_t = h_t · C_t. Unlike the Mamba-2 SSD path, A is
    per-(channel, state-dim) so the attention-like chunk dual does not
    apply. Returns (y [T, D], states updated per present request).
    """
    T, D = x.shape
    N = B.shape[1]
    R1 = states.shape[0]
    if T % chunk_size != 0:
        raise ValueError(f"T={T} not a multiple of chunk {chunk_size}")
    nc = T // chunk_size
    Q = chunk_size
    xc = x.reshape(nc, Q, D).astype(jnp.float32)
    dtc = dt.reshape(nc, Q, D).astype(jnp.float32)
    Bc = B.reshape(nc, Q, N).astype(jnp.float32)
    Cc = C.reshape(nc, Q, N).astype(jnp.float32)
    segc = seg.reshape(nc, Q)
    Af = A.astype(jnp.float32)
    idx = jnp.arange(Q)

    def combine(l, r):
        la, lb = l
        ra, rb = r
        return la * ra, lb * ra + rb

    def chunk_step(carry, inp):
        states, prev_seg = carry
        xq, dtq, Bq, Cq, sq = inp
        a = jnp.exp(dtq[:, :, None] * Af[None])  # [Q, D, N]
        b = (dtq * xq)[:, :, None] * Bq[:, None, :]  # [Q, D, N]
        # first token of each segment within this chunk (including a
        # segment continuing from the previous chunk: its updated carry
        # is in `states`, so every chunk re-injects at its local start)
        prev = jnp.concatenate([prev_seg[None], sq[:-1]])
        first = sq != prev
        first = first.at[0].set(True)
        inject = states[sq]  # [Q, D, N]
        b = jnp.where(first[:, None, None], b + a * inject, b)
        a = jnp.where(first[:, None, None], 0.0, a)
        _, hh = jax.lax.associative_scan(combine, (a, b), axis=0)
        y = jnp.einsum("qdn,qn->qd", hh, Cq)
        # per-request state = h at the segment's last token in the chunk
        last = jax.ops.segment_max(idx, sq, num_segments=R1)  # [R1]
        n_tok = jax.ops.segment_sum(jnp.ones_like(sq), sq,
                                    num_segments=R1)
        present = n_tok > 0
        new_states = jnp.where(present[:, None, None],
                               hh[jnp.clip(last, 0, Q - 1)], states)
        return (new_states, sq[-1]), y

    (states, _), ys = jax.lax.scan(
        chunk_step, (states.astype(jnp.float32), jnp.int32(-1)),
        (xc, dtc, Bc, Cc, segc))
    return ys.reshape(T, D).astype(x.dtype), states
