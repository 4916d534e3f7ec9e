"""Mamba2 SSD op correctness: chunked scan vs naive recurrence, decode
step continuation, conv state continuation (reference analog:
tests/kernels/mamba/)."""

import numpy as np

import jax.numpy as jnp

from vllm_tpu.ops.mamba import (causal_conv1d, gated_rms_norm, ssd_chunked,
                                ssd_update)


def naive_ssd(x, dt, A, B, C, state):
    """Token-by-token numpy oracle."""
    T, H, P = x.shape
    G, N = B.shape[1], B.shape[2]
    reps = H // G
    y = np.zeros((T, H, P))
    h = state.copy()
    for t in range(T):
        Bh = np.repeat(B[t], reps, axis=0)
        Ch = np.repeat(C[t], reps, axis=0)
        decay = np.exp(dt[t] * A)
        h = h * decay[:, None, None] + \
            (dt[t][:, None] * x[t])[:, :, None] * Bh[:, None, :]
        y[t] = np.einsum("hpn,hn->hp", h, Ch)
    return y, h


def test_ssd_chunked_matches_naive():
    rng = np.random.default_rng(0)
    T, H, P, G, N = 32, 4, 8, 2, 16
    x = rng.standard_normal((T, H, P)).astype(np.float32)
    dt = rng.random((T, H)).astype(np.float32) * 0.5
    A = -rng.random(H).astype(np.float32)
    B = rng.standard_normal((T, G, N)).astype(np.float32)
    C = rng.standard_normal((T, G, N)).astype(np.float32)
    h0 = rng.standard_normal((H, P, N)).astype(np.float32)

    ref_y, ref_h = naive_ssd(x, dt, A, B, C, h0)
    for chunk in (8, 16, 32):
        y, h = ssd_chunked(jnp.asarray(x), jnp.asarray(dt), jnp.asarray(A),
                           jnp.asarray(B), jnp.asarray(C),
                           chunk_size=chunk, initial_state=jnp.asarray(h0))
        np.testing.assert_allclose(np.asarray(y), ref_y, rtol=2e-4,
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(h), ref_h, rtol=2e-4,
                                   atol=2e-4)


def test_ssd_decode_continues_prefill():
    """Chunked prefill state + per-token updates == one long scan."""
    rng = np.random.default_rng(1)
    T, H, P, G, N = 24, 4, 8, 2, 16
    x = rng.standard_normal((T, H, P)).astype(np.float32)
    dt = rng.random((T, H)).astype(np.float32) * 0.5
    A = -rng.random(H).astype(np.float32)
    B = rng.standard_normal((T, G, N)).astype(np.float32)
    C = rng.standard_normal((T, G, N)).astype(np.float32)

    ref_y, _ = naive_ssd(x, dt, A, B, C, np.zeros((H, P, N)))
    _, h = ssd_chunked(jnp.asarray(x[:16]), jnp.asarray(dt[:16]),
                       jnp.asarray(A), jnp.asarray(B[:16]),
                       jnp.asarray(C[:16]), chunk_size=8)
    for t in range(16, T):
        y, h = ssd_update(jnp.asarray(x[t]), jnp.asarray(dt[t]),
                          jnp.asarray(A), jnp.asarray(B[t]),
                          jnp.asarray(C[t]), h)
        np.testing.assert_allclose(np.asarray(y), ref_y[t], rtol=2e-4,
                                   atol=2e-4)


def test_ssd_padding_preserves_state():
    """dt=0 padding rows are identity: state unchanged."""
    rng = np.random.default_rng(2)
    H, P, G, N = 4, 8, 2, 16
    h0 = rng.standard_normal((H, P, N)).astype(np.float32)
    z = jnp.zeros((8, H, P))
    _, h = ssd_chunked(z, jnp.zeros((8, H)), -jnp.ones(H),
                       jnp.zeros((8, G, N)), jnp.zeros((8, G, N)),
                       chunk_size=8, initial_state=jnp.asarray(h0))
    np.testing.assert_allclose(np.asarray(h), h0, rtol=1e-6, atol=1e-6)


def test_causal_conv1d_state_continuation():
    rng = np.random.default_rng(3)
    T, Ch, K = 20, 6, 4
    x = rng.standard_normal((T, Ch)).astype(np.float32)
    w = rng.standard_normal((Ch, K)).astype(np.float32)
    b = rng.standard_normal(Ch).astype(np.float32)

    full, _ = causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    y1, st = causal_conv1d(jnp.asarray(x[:12]), jnp.asarray(w),
                           jnp.asarray(b))
    y2, _ = causal_conv1d(jnp.asarray(x[12:]), jnp.asarray(w),
                          jnp.asarray(b), initial_state=st)
    np.testing.assert_allclose(np.concatenate([y1, y2]), np.asarray(full),
                               rtol=1e-5, atol=1e-5)
    # oracle: torch depthwise conv
    import torch
    ref = torch.nn.functional.conv1d(
        torch.nn.functional.pad(torch.tensor(x.T)[None], (K - 1, 0)),
        torch.tensor(w)[:, None, :], torch.tensor(b),
        groups=Ch)[0].T.numpy()
    np.testing.assert_allclose(np.asarray(full), ref, rtol=1e-5, atol=1e-5)


def test_gated_rms_norm_matches_hf():
    import torch

    from transformers.models.mamba2.modeling_mamba2 import MambaRMSNormGated

    rng = np.random.default_rng(4)
    x = rng.standard_normal((5, 32)).astype(np.float32)
    g = rng.standard_normal((5, 32)).astype(np.float32)
    m = MambaRMSNormGated(32, eps=1e-5)
    with torch.no_grad():
        m.weight.copy_(torch.tensor(rng.standard_normal(32).astype(
            np.float32)))
        ref = m(torch.tensor(x), gate=torch.tensor(g)).numpy()
    out = gated_rms_norm(jnp.asarray(x), jnp.asarray(g),
                         jnp.asarray(m.weight.detach().numpy()), 1e-5)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_ssd_segmented_matches_per_request():
    """Packed 3-request stream (with padding + mid-chunk boundaries +
    carried state) == independent per-request scans."""
    from vllm_tpu.ops.mamba import ssd_chunked_segmented

    rng = np.random.default_rng(5)
    H, P, G, N = 4, 8, 2, 16
    lens = [5, 11, 3]  # 19 tokens, pad to 24 (chunk 8: boundaries mid-chunk)
    T = 24
    R = len(lens)
    x = rng.standard_normal((T, H, P)).astype(np.float32)
    dt = rng.random((T, H)).astype(np.float32) * 0.5
    A = -rng.random(H).astype(np.float32)
    B = rng.standard_normal((T, G, N)).astype(np.float32)
    C = rng.standard_normal((T, G, N)).astype(np.float32)
    seg = np.full(T, R, np.int32)
    starts = np.cumsum([0] + lens)
    for r, (s, e) in enumerate(zip(starts[:-1], starts[1:])):
        seg[s:e] = r
    dt[starts[-1]:] = 0.0  # padding rows
    states0 = rng.standard_normal((R + 1, H, P, N)).astype(np.float32)

    y, states = ssd_chunked_segmented(
        jnp.asarray(x), jnp.asarray(dt), jnp.asarray(A), jnp.asarray(B),
        jnp.asarray(C), jnp.asarray(seg), jnp.asarray(states0),
        chunk_size=8)
    for r, (s, e) in enumerate(zip(starts[:-1], starts[1:])):
        ref_y, ref_h = naive_ssd(x[s:e], dt[s:e], A, B[s:e], C[s:e],
                                 states0[r])
        np.testing.assert_allclose(np.asarray(y)[s:e], ref_y, rtol=3e-4,
                                   atol=3e-4)
        np.testing.assert_allclose(np.asarray(states)[r], ref_h,
                                   rtol=3e-4, atol=3e-4)


def test_conv1d_segmented_matches_per_request():
    from vllm_tpu.ops.mamba import causal_conv1d, causal_conv1d_segmented

    rng = np.random.default_rng(6)
    Ch, K = 6, 4
    lens = [5, 2, 9]  # includes a span shorter than K-1
    T = 20
    R = len(lens)
    x = rng.standard_normal((T, Ch)).astype(np.float32)
    w = rng.standard_normal((Ch, K)).astype(np.float32)
    b = rng.standard_normal(Ch).astype(np.float32)
    seg = np.full(T, R, np.int32)
    starts = np.cumsum([0] + lens)
    seg_start = np.zeros(T, np.int32)
    for r, (s, e) in enumerate(zip(starts[:-1], starts[1:])):
        seg[s:e] = r
        seg_start[s:e] = s
    seg_start[starts[-1]:] = starts[-1]
    st0 = rng.standard_normal((R + 1, K - 1, Ch)).astype(np.float32)

    y, st = causal_conv1d_segmented(jnp.asarray(x), jnp.asarray(w),
                                    jnp.asarray(b), jnp.asarray(seg),
                                    jnp.asarray(seg_start),
                                    jnp.asarray(st0))
    for r, (s, e) in enumerate(zip(starts[:-1], starts[1:])):
        ref_y, ref_st = causal_conv1d(jnp.asarray(x[s:e]), jnp.asarray(w),
                                      jnp.asarray(b),
                                      initial_state=jnp.asarray(st0[r]))
        np.testing.assert_allclose(np.asarray(y)[s:e], np.asarray(ref_y),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(st)[r], np.asarray(ref_st),
                                   rtol=1e-5, atol=1e-5)


def test_selective_scan_segmented_matches_naive():
    """Mamba-1 packed scan vs per-token reference recurrence."""
    import numpy as np

    from vllm_tpu.ops.mamba import selective_scan_segmented

    rng = np.random.default_rng(3)
    T, D, N, R = 128, 8, 4, 3
    x = rng.normal(size=(T, D)).astype(np.float32)
    dt = np.abs(rng.normal(size=(T, D))).astype(np.float32) * 0.5
    A = -np.abs(rng.normal(size=(D, N))).astype(np.float32)
    B = rng.normal(size=(T, N)).astype(np.float32)
    C = rng.normal(size=(T, N)).astype(np.float32)
    # three segments + padding tail
    seg = np.full(T, R, np.int32)
    spans = [(0, 50, 0), (50, 90, 1), (90, 120, 2)]
    for a, b_, r in spans:
        seg[a:b_] = r
    dt[120:] = 0.0
    states0 = rng.normal(size=(R + 1, D, N)).astype(np.float32) * 0.1

    y, states = selective_scan_segmented(
        jnp.asarray(x), jnp.asarray(dt), jnp.asarray(A), jnp.asarray(B),
        jnp.asarray(C), jnp.asarray(seg), jnp.asarray(states0))
    y = np.asarray(y)
    states = np.asarray(states)

    # naive reference
    exp_states = states0.copy()
    y_ref = np.zeros((T, D), np.float32)
    for a, b_, r in spans:
        h = states0[r].copy()
        for t in range(a, b_):
            da = np.exp(dt[t][:, None] * A)
            h = da * h + (dt[t] * x[t])[:, None] * B[t][None, :]
            y_ref[t] = h @ C[t]
        exp_states[r] = h

    np.testing.assert_allclose(y[:120], y_ref[:120], rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(states[:R], exp_states[:R], rtol=2e-4,
                               atol=2e-4)
