"""Train a small byte-BPE Llama on local text and export an HF checkpoint.

Purpose: the quantization-accuracy gate (BASELINE.json: <=0.1 ppl delta vs
FP16) needs a model with *trained* weight/activation statistics — random
init makes quantization error unmeasurable. The environment has no network
egress, so no public checkpoint can be fetched; instead this trains a
real (small) language model on real local text — the repo's own Python
sources — with a JAX training loop (runs on the TPU chip or CPU), then
exports a standard HF LlamaForCausalLM checkpoint that
tools/quant_accuracy.py scores through the engine's actual quantized
serving path (reference analog: benchmarks/P3L.py quantization canary,
tests/tpu/test_quantization_accuracy.py).

The forward here matches HF Llama semantics exactly (rotate-half RoPE,
fp32 RMSNorm, GQA, SwiGLU, no biases) so the exported checkpoint is a
faithful HF model; tools/quant_accuracy.py cross-checks the exported
model's torch ppl against the JAX eval ppl.

Usage:
  python tools/train_tiny_llama.py --out /tmp/tiny_trained \
      [--steps 3000] [--platform axon|cpu]
"""

from __future__ import annotations

import argparse
import functools
import glob
import json
import os
import sys

import numpy as np

import os as _os

HIDDEN = int(_os.environ.get("TT_HIDDEN", 256))
LAYERS = int(_os.environ.get("TT_LAYERS", 4))
Q_HEADS = int(_os.environ.get("TT_QHEADS", 8))
KV_HEADS = int(_os.environ.get("TT_KVHEADS", 4))
HEAD_DIM = HIDDEN // Q_HEADS
INTER = int(_os.environ.get("TT_INTER", 768))
VOCAB = int(_os.environ.get("TT_VOCAB", 2048))
SEQ = int(_os.environ.get("TT_SEQ", 256))
ROPE_THETA = 10000.0
RMS_EPS = 1e-6


def build_corpus() -> str:
    """Real local text: Python sources from this repo plus the installed
    jax/transformers packages (several MB, plenty for a 4M-param LM)."""
    roots = [
        os.path.join(os.path.dirname(__file__), "..", "vllm_tpu"),
        os.path.join(os.path.dirname(__file__), "..", "tests"),
    ]
    for pkg in ("jax", "transformers", "flax", "optax"):
        try:
            mod = __import__(pkg)
            roots.append(os.path.dirname(mod.__file__))
        except Exception:
            pass
    texts = []
    total = 0
    for root in roots:
        for path in sorted(glob.glob(os.path.join(root, "**", "*.py"),
                                     recursive=True)):
            try:
                with open(path, encoding="utf-8", errors="ignore") as f:
                    texts.append(f.read())
            except OSError:
                continue
            total += len(texts[-1])
            if total > 12_000_000:
                break
        if total > 12_000_000:
            break
    return "\n".join(texts)


def build_tokenizer(corpus: str, out_dir: str):
    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import ByteLevel
    from tokenizers.trainers import BpeTrainer
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(BPE(unk_token=None))
    tok.pre_tokenizer = ByteLevel(add_prefix_space=False)
    trainer = BpeTrainer(vocab_size=VOCAB - 4,
                         special_tokens=["<s>", "</s>", "<pad>"],
                         initial_alphabet=ByteLevel.alphabet())
    step = 1 << 16
    tok.train_from_iterator(
        (corpus[i:i + step] for i in range(0, len(corpus), step)),
        trainer)
    fast = PreTrainedTokenizerFast(tokenizer_object=tok,
                                   bos_token="<s>", eos_token="</s>",
                                   pad_token="<pad>")
    fast.save_pretrained(out_dir)
    return fast


def init_params(rng: np.random.Generator) -> dict:
    def dense(i, o, std=0.02):
        return rng.normal(0.0, std, (i, o)).astype(np.float32)

    layers = []
    for _ in range(LAYERS):
        layers.append(dict(
            wq=dense(HIDDEN, Q_HEADS * HEAD_DIM),
            wk=dense(HIDDEN, KV_HEADS * HEAD_DIM),
            wv=dense(HIDDEN, KV_HEADS * HEAD_DIM),
            wo=dense(Q_HEADS * HEAD_DIM, HIDDEN),
            wg=dense(HIDDEN, INTER),
            wu=dense(HIDDEN, INTER),
            wd=dense(INTER, HIDDEN),
            ln1=np.ones(HIDDEN, np.float32),
            ln2=np.ones(HIDDEN, np.float32),
        ))
    import jax

    stacked = jax.tree.map(lambda *xs: np.stack(xs), *layers)
    return dict(embed=dense(VOCAB, HIDDEN, 0.02),
                lm_head=dense(HIDDEN, VOCAB),
                final_ln=np.ones(HIDDEN, np.float32),
                layers=stacked)


def forward(params: dict, ids, cos, sin):
    """HF-Llama-exact forward: [B, T] ids -> [B, T, V] logits."""
    import jax
    import jax.numpy as jnp

    def rms(x, w):
        x32 = x.astype(jnp.float32)
        x32 = x32 * jax.lax.rsqrt(
            jnp.mean(x32 * x32, axis=-1, keepdims=True) + RMS_EPS)
        return (x32 * w).astype(x.dtype)

    def rope(x):  # [B, T, H, D] — HF rotate_half convention
        half = x.shape[-1] // 2
        x1, x2 = x[..., :half], x[..., half:]
        rot = jnp.concatenate([-x2, x1], axis=-1)
        return x * cos[None, :, None, :] + rot * sin[None, :, None, :]

    B, T = ids.shape
    x = params["embed"][ids]
    mask = jnp.tril(jnp.ones((T, T), bool))

    def layer_fn(x, lp):
        h = rms(x, lp["ln1"])
        q = rope((h @ lp["wq"]).reshape(B, T, Q_HEADS, HEAD_DIM))
        k = rope((h @ lp["wk"]).reshape(B, T, KV_HEADS, HEAD_DIM))
        v = (h @ lp["wv"]).reshape(B, T, KV_HEADS, HEAD_DIM)
        k = jnp.repeat(k, Q_HEADS // KV_HEADS, axis=2)
        v = jnp.repeat(v, Q_HEADS // KV_HEADS, axis=2)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(HEAD_DIM)
        scores = jnp.where(mask[None, None], scores, -1e30)
        probs = jax.nn.softmax(scores.astype(jnp.float32),
                               axis=-1).astype(x.dtype)
        att = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        x = x + att.reshape(B, T, -1) @ lp["wo"]
        h = rms(x, lp["ln2"])
        x = x + (jax.nn.silu(h @ lp["wg"]) * (h @ lp["wu"])) @ lp["wd"]
        return x, None

    x, _ = jax.lax.scan(layer_fn, x, params["layers"])
    return rms(x, params["final_ln"]) @ params["lm_head"]


def export_hf(params, out_dir: str) -> None:
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(vocab_size=VOCAB, hidden_size=HIDDEN,
                      intermediate_size=INTER,
                      num_hidden_layers=LAYERS,
                      num_attention_heads=Q_HEADS,
                      num_key_value_heads=KV_HEADS, head_dim=HEAD_DIM,
                      max_position_embeddings=4 * SEQ,
                      rms_norm_eps=RMS_EPS, rope_theta=ROPE_THETA,
                      tie_word_embeddings=False,
                      attention_bias=False, mlp_bias=False,
                      bos_token_id=0, eos_token_id=1, pad_token_id=2)
    model = LlamaForCausalLM(cfg)
    sd = {}

    def t(x):  # jax [in, out] -> torch [out, in]
        return torch.from_numpy(np.asarray(x).astype(np.float32).T.copy())

    sd["model.embed_tokens.weight"] = torch.from_numpy(
        np.asarray(params["embed"]).astype(np.float32).copy())
    sd["lm_head.weight"] = t(params["lm_head"])
    sd["model.norm.weight"] = torch.from_numpy(
        np.asarray(params["final_ln"]).astype(np.float32).copy())
    L = params["layers"]
    for i in range(LAYERS):
        p = f"model.layers.{i}."
        sd[p + "self_attn.q_proj.weight"] = t(L["wq"][i])
        sd[p + "self_attn.k_proj.weight"] = t(L["wk"][i])
        sd[p + "self_attn.v_proj.weight"] = t(L["wv"][i])
        sd[p + "self_attn.o_proj.weight"] = t(L["wo"][i])
        sd[p + "mlp.gate_proj.weight"] = t(L["wg"][i])
        sd[p + "mlp.up_proj.weight"] = t(L["wu"][i])
        sd[p + "mlp.down_proj.weight"] = t(L["wd"][i])
        sd[p + "input_layernorm.weight"] = torch.from_numpy(
            np.asarray(L["ln1"][i]).copy())
        sd[p + "post_attention_layernorm.weight"] = torch.from_numpy(
            np.asarray(L["ln2"][i]).copy())
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    leftovers = [m for m in missing if "rotary" not in m]
    assert not leftovers, leftovers
    model.save_pretrained(out_dir, safe_serialization=True)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--platform", default=None,
                    help="jax platform override (cpu | axon)")
    ap.add_argument("--eval-frac", type=float, default=0.02,
                    help="tail fraction of the corpus held out for eval")
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import optax

    os.makedirs(args.out, exist_ok=True)
    print("# building corpus...", flush=True)
    corpus = build_corpus()
    print(f"# corpus: {len(corpus) / 1e6:.1f} MB text", flush=True)
    tokenizer = build_tokenizer(corpus, args.out)
    ids = np.asarray(tokenizer(corpus, return_tensors="np",
                               add_special_tokens=False)["input_ids"][0],
                     np.int32)
    n_eval = max(int(len(ids) * args.eval_frac), 4 * SEQ)
    train_ids, eval_ids = ids[:-n_eval], ids[-n_eval:]
    with open(os.path.join(args.out, "eval.txt"), "w") as f:
        f.write(tokenizer.decode(eval_ids))
    # the BPE decode does not round-trip (literal "Ġ" fragments), so the
    # ppl harness consumes the token ids directly
    np.save(os.path.join(args.out, "eval_ids.npy"),
            np.asarray(eval_ids, np.int32), allow_pickle=False)
    print(f"# tokens: train {len(train_ids)}, eval {len(eval_ids)}",
          flush=True)

    rng = np.random.default_rng(0)
    params = jax.tree.map(jnp.asarray, init_params(rng))
    pos = np.arange(SEQ)
    inv = 1.0 / ROPE_THETA**(np.arange(0, HEAD_DIM, 2) / HEAD_DIM)
    freqs = np.concatenate([pos[:, None] * inv[None], pos[:, None] *
                            inv[None]], -1)
    cos = jnp.asarray(np.cos(freqs), jnp.float32)
    sin = jnp.asarray(np.sin(freqs), jnp.float32)

    warmup = min(100, args.steps // 2)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, args.steps + warmup, args.lr * 0.05)
    opt = optax.adamw(sched, weight_decay=0.01)
    opt_state = opt.init(params)

    def loss_fn(p, batch):
        logits = forward(p, batch[:, :-1], cos, sin)
        tgt = batch[:, 1:]
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
        return nll.mean()

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_chunk(p, s, batches):
        def step(carry, batch):
            p, s = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, batch)
            updates, s = opt.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), loss

        (p, s), losses = jax.lax.scan(step, (p, s), batches)
        return p, s, losses.mean()

    CHUNK = 50
    n_windows = len(train_ids) - (SEQ + 1)
    for start in range(0, args.steps, CHUNK):
        n = min(CHUNK, args.steps - start)
        offs = rng.integers(0, n_windows, (n, args.batch))
        batches = np.stack([
            np.stack([train_ids[o:o + SEQ + 1] for o in row])
            for row in offs
        ])
        params, opt_state, mloss = train_chunk(
            params, opt_state, jnp.asarray(batches))
        if (start // CHUNK) % 5 == 0 or start + n >= args.steps:
            print(f"# step {start + n}: train loss {float(mloss):.4f} "
                  f"(ppl {np.exp(float(mloss)):.2f})", flush=True)

    # held-out eval ppl (jax, fp32 — the reference number for the gate)
    nll_sum, tok_sum = 0.0, 0
    eval_fwd = jax.jit(lambda p, b: forward(p, b, cos, sin))
    for i in range(0, len(eval_ids) - (SEQ + 1), SEQ):
        w = eval_ids[i:i + SEQ + 1]
        logits = eval_fwd(params, jnp.asarray(w[None, :-1]))
        lp = jax.nn.log_softmax(np.asarray(logits, np.float32)[0], -1)
        nll_sum += float(-lp[np.arange(SEQ), w[1:]].sum())
        tok_sum += SEQ
    eval_ppl = float(np.exp(nll_sum / max(tok_sum, 1)))
    print(f"# eval ppl (jax fp32): {eval_ppl:.4f} over {tok_sum} tokens",
          flush=True)

    params_np = jax.tree.map(np.asarray, params)
    export_hf(params_np, args.out)
    with open(os.path.join(args.out, "train_meta.json"), "w") as f:
        json.dump({"steps": args.steps, "eval_ppl_jax_fp32": eval_ppl,
                   "train_tokens": int(len(train_ids)),
                   "eval_tokens": tok_sum}, f)
    print(f"# exported HF checkpoint to {args.out}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
