"""Declarative per-layer KV-cache specs (reference: vllm/v1/kv_cache_interface.py).

Each attention layer declares what kind of KV memory it needs; specs are
grouped into KV-cache groups that share a block table. On TPU the backing
store per group is one jax array per layer:
``[num_blocks, 2 * num_kv_heads, block_size, head_size]`` (K and V
stacked on a HEAD-MAJOR axis so the ragged-paged-attention kernels read
each head's rows contiguously from VMEM).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

_DTYPE_BYTES = {
    "bfloat16": 2,
    "float32": 4,
    "float16": 2,
    "fp8": 1,
    "fp8_e4m3": 1,
    "fp8_e5m2": 1,
    "float8_e4m3fn": 1,
    "float8_e4m3": 1,
    "float8_e5m2": 1,
    "int8": 1,
}


def dtype_bytes(dtype: str) -> int:
    return _DTYPE_BYTES[dtype]


def _tiled_bytes(second_minor: int, minor: int, dtype: str) -> int:
    """Device bytes of one [..., second_minor, minor] slice under TPU
    tiling: the minor dim pads to 128 lanes and the second-minor to the
    sublane tile (8 rows x 4 bytes — 16 for 2-byte, 32 for 1-byte
    dtypes). Sizing with the logical product under-counts — e.g. an
    int8 cache with head_size 64 allocates 2x the logical bytes and an
    engine sized to 'free memory' then OOMs at allocation time."""
    b = dtype_bytes(dtype)
    # Empirical on this libtpu (see the s8[...,16,64] OOM trace): the
    # minor dim pads to 128 lanes; the second-minor pads to 8 rows for
    # 4-byte dtypes and 16 for narrower ones (an s8 [...,16,128] slice
    # allocates exactly its logical bytes — the nominal (32,128) int8
    # tile does NOT apply to the second-minor here).
    sublane = {4: 8, 2: 16, 1: 16}[b]
    pm = -(-minor // 128) * 128
    psm = -(-second_minor // sublane) * sublane
    return psm * pm * b


@dataclass(frozen=True)
class KVCacheSpec:
    """Base spec for one layer's KV cache."""

    block_size: int

    @property
    def type_id(self) -> str:
        raise NotImplementedError

    @property
    def page_size_bytes(self) -> int:
        raise NotImplementedError

    def max_memory_usage_bytes(self, max_model_len: int) -> int:
        raise NotImplementedError


@dataclass(frozen=True)
class AttentionSpec(KVCacheSpec):
    num_kv_heads: int = 1
    head_size: int = 128
    dtype: str = "bfloat16"

    @property
    def page_size_bytes(self) -> int:
        # K + V for one block of tokens, at the DEVICE layout
        # [..., 2*num_kv_heads, block, head]: the trailing two dims tile
        # (see _tiled_bytes), so small blocks/heads round up.
        return 2 * self.num_kv_heads * _tiled_bytes(
            self.block_size, self.head_size, self.dtype)


@dataclass(frozen=True)
class FullAttentionSpec(AttentionSpec):
    """Standard causal attention over the whole context
    (reference: kv_cache_interface.py:73)."""

    @property
    def type_id(self) -> str:
        return (f"full_attention_{self.block_size}_{self.num_kv_heads}_"
                f"{self.head_size}_{self.dtype}")

    def max_memory_usage_bytes(self, max_model_len: int) -> int:
        num_blocks = -(-max_model_len // self.block_size)
        return num_blocks * self.page_size_bytes


@dataclass(frozen=True)
class MLASpec(FullAttentionSpec):
    """Absorbed multi-head latent attention: ONE latent vector of width
    head_size (= kv_lora_rank + qk_rope_head_dim) per token; V is a
    prefix alias of K so the cache stores a single copy — half the bytes
    of a K+V layout (reference: vllm/v1/attention/backends/mla/,
    csrc/cache_kernels.cu concat_and_cache_mla). Paging/prefix-cache
    behavior is identical to full attention."""

    @property
    def type_id(self) -> str:
        return (f"mla_{self.block_size}_{self.head_size}_{self.dtype}")

    @property
    def page_size_bytes(self) -> int:
        # single stored copy (no separate V); device layout
        # [..., block, head] tiles the trailing two dims
        return _tiled_bytes(self.block_size, self.head_size, self.dtype)


@dataclass(frozen=True)
class SlidingWindowSpec(AttentionSpec):
    """Attention over the last `sliding_window` tokens
    (reference: kv_cache_interface.py:157)."""

    sliding_window: int = 4096

    @property
    def type_id(self) -> str:
        return (f"sliding_window_{self.sliding_window}_{self.block_size}_"
                f"{self.num_kv_heads}_{self.head_size}_{self.dtype}")

    def max_memory_usage_bytes(self, max_model_len: int) -> int:
        usable = min(max_model_len, self.sliding_window + self.block_size)
        num_blocks = -(-usable // self.block_size) + 1
        return num_blocks * self.page_size_bytes


@dataclass(frozen=True)
class ChunkedLocalAttentionSpec(AttentionSpec):
    """Attention restricted to non-overlapping chunks of the sequence
    (Llama-4 local layers; reference: kv_cache_interface.py
    ChunkedLocalAttentionSpec)."""

    attention_chunk_size: int = 8192

    @property
    def type_id(self) -> str:
        return (f"local_attention_{self.attention_chunk_size}_"
                f"{self.block_size}_{self.num_kv_heads}_{self.head_size}_"
                f"{self.dtype}")

    def max_memory_usage_bytes(self, max_model_len: int) -> int:
        usable = min(max_model_len,
                     self.attention_chunk_size + self.block_size)
        num_blocks = -(-usable // self.block_size) + 1
        return num_blocks * self.page_size_bytes


@dataclass(frozen=True)
class MambaSpec(KVCacheSpec):
    """State-space model state (one fixed-size state per request)."""

    state_size_bytes: int = 0

    @property
    def type_id(self) -> str:
        return f"mamba_{self.state_size_bytes}"

    @property
    def page_size_bytes(self) -> int:
        return self.state_size_bytes

    def max_memory_usage_bytes(self, max_model_len: int) -> int:
        return self.state_size_bytes


@dataclass
class KVCacheGroupSpec:
    """A set of layers sharing one spec and one block table."""

    layer_names: list[str]
    kv_cache_spec: KVCacheSpec


@dataclass
class KVCacheConfig:
    """Resolved cache configuration after memory profiling
    (reference: kv_cache_interface.py:227)."""

    num_blocks: int
    kv_cache_groups: list[KVCacheGroupSpec] = field(default_factory=list)
    # bytes of device memory the KV cache will occupy (all layers)
    total_bytes: int = 0


def make_kv_cache_config(
    kv_cache_specs: dict[str, KVCacheSpec],
    available_memory_bytes: int,
    num_blocks_override: Optional[int] = None,
) -> KVCacheConfig:
    """Group layers by spec type and size the block pool.

    Simplification vs the reference's hybrid grouping
    (vllm/v1/core/kv_cache_utils.py:749+): layers with identical specs share
    one group; dissimilar specs get separate groups but a single unified
    block pool whose page size is the max page size over groups (all groups
    allocate from the same pool of block ids, one backing array per layer).
    """
    by_type: dict[str, KVCacheGroupSpec] = {}
    for layer_name, spec in kv_cache_specs.items():
        group = by_type.get(spec.type_id)
        if group is None:
            by_type[spec.type_id] = KVCacheGroupSpec([layer_name], spec)
        else:
            group.layer_names.append(layer_name)
    groups = list(by_type.values())

    bytes_per_block = sum(
        g.kv_cache_spec.page_size_bytes * len(g.layer_names) for g in groups)
    if num_blocks_override is not None:
        num_blocks = num_blocks_override
    else:
        if bytes_per_block <= 0:
            raise ValueError("no KV cache layers found")
        num_blocks = max(1, available_memory_bytes // bytes_per_block)
    return KVCacheConfig(
        num_blocks=num_blocks,
        kv_cache_groups=groups,
        total_bytes=num_blocks * bytes_per_block,
    )
