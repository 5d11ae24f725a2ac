"""Flash attention for TPU (Pallas) with an XLA fallback.

Replaces the reference's memory-metered sliced attention
(/root/reference/cpd/models/attention.py:280-348), which reads
``torch.cuda.mem_get_info`` in the forward pass to choose a slice count. On
TPU the S x S score matrix is never materialized: the kernel streams K/V
blocks through VMEM with an online softmax (flash-attention-2 style: the
accumulator stays unnormalized until the final KV block).

Shape envelope (Stable Diffusion): self-attention Sq = Skv in
{64, 256, 1024, 4096, 16384}, head_dim in {40, 64, 80, 160}; cross-attention
Skv = 77 (CLIP tokens). head_dim and sequence lengths are zero-padded to
lane/tile multiples in the wrapper; padded KV positions are masked with a
large negative score generated from a *static* length (no runtime cost).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "attention"]

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(
    q_ref, k_ref, v_ref, o_ref,
    m_scratch, l_scratch, acc_scratch,
    *, scale: float, kv_len: int, block_k: int, num_kv_blocks: int,
):
    """Grid: (batch*heads, Sq/block_q, Skv/block_k); KV dim is sequential."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, _NEG_INF, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    q = q_ref[0]  # [block_q, d]
    k = k_ref[0]  # [block_k, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale

    # Mask padded KV columns. kv_len is static, so this whole branch folds
    # away for aligned sequence lengths.
    if num_kv_blocks * block_k > kv_len:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_scratch[:, :1]  # [block_q, 1]
    l_prev = l_scratch[:, :1]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
    l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)

    v = v_ref[0]  # [block_k, d]
    pv = jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    acc_scratch[...] = acc_scratch[...] * alpha + pv

    @pl.when(j == num_kv_blocks - 1)
    def _store():
        l_final = l_scratch[:, :1]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def _flash_attention_bhsd(
    q, k, v, *, scale: float, block_q: int, block_k: int, interpret: bool
):
    """Core pallas call. q: [BH, Sq, D]; k, v: [BH, Skv, D] (D lane-aligned)."""
    bh, sq, d = q.shape
    kv_len = k.shape[1]

    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(kv_len, 128))
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(kv_len, block_k)
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if skv_pad != kv_len:
        k = jnp.pad(k, ((0, 0), (0, skv_pad - kv_len), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, skv_pad - kv_len), (0, 0)))

    num_kv_blocks = skv_pad // block_k
    grid = (bh, sq_pad // block_q, num_kv_blocks)

    out = pl.pallas_call(
        functools.partial(
            _attn_kernel,
            scale=scale,
            kv_len=kv_len,
            block_k=block_k,
            num_kv_blocks=num_kv_blocks,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sq_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :sq, :]


def _xla_attention(q, k, v, scale):
    """Reference-semantics attention in plain XLA (softmax in f32)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


@functools.lru_cache(maxsize=64)
def _pallas_attention_diff(scale, block_q, block_k, interpret):
    """Differentiable wrapper: Pallas forward, XLA-recompute backward (the
    kernel has no VJP; CLIP guidance takes grads through the UNet/VAE)."""

    def _fwd_pallas(q, k, v):
        b, h, sq, d = q.shape
        d_pad = _round_up(d, 128)
        if d_pad != d:
            pad = ((0, 0), (0, 0), (0, 0), (0, d_pad - d))
            q = jnp.pad(q, pad)
            k = jnp.pad(k, pad)
            v = jnp.pad(v, pad)
        out = _flash_attention_bhsd(
            q.reshape(b * h, sq, d_pad),
            k.reshape(b * h, k.shape[2], d_pad),
            v.reshape(b * h, v.shape[2], d_pad),
            scale=scale,
            block_q=block_q,
            block_k=block_k,
            interpret=interpret,
        )
        return out.reshape(b, h, sq, d_pad)[..., :d]

    @jax.custom_vjp
    def fn(q, k, v):
        return _fwd_pallas(q, k, v)

    def fwd(q, k, v):
        return fn(q, k, v), (q, k, v)

    def bwd(res, g):
        q, k, v = res
        _, vjp = jax.vjp(lambda a, b, c: _xla_attention(a, b, c, scale), q, k, v)
        return vjp(g)

    fn.defvjp(fwd, bwd)
    return fn


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    *,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jax.Array:
    """Multi-head attention, [B, H, S, D] layout, no mask (SD is non-causal).

    ``scale`` defaults to 1/sqrt(D) using the *unpadded* head dim. Dispatches
    to the Pallas kernel on TPU and to a plain-XLA softmax attention
    elsewhere (CPU tests) — both paths compute softmax in f32.
    ``interpret=True`` forces the Pallas kernel in interpreter mode (kernel
    logic tests on CPU).

    Small-KV dispatch: cross-attention against short contexts (CLIP's 77
    tokens) is bandwidth-trivial — the flash machinery (scratch init,
    running-max bookkeeping) costs ~2x a plain fused softmax there
    (scripts/perf_attn7.py: 1.59 vs 0.81 ms at BH64 S4096 kv77), so KV
    lengths <= 128 route to XLA even on TPU.

    Block defaults come from the bench-batch sweep (B8 x H8): long sequences
    (S >= 4096) run best at 512x4096 (5.36 vs 6.06 ms for the old
    1024x2048); shorter ones at 512x1024.
    """
    b, h, sq, d = q.shape
    kv = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if kv <= 128 and not interpret:
        return _xla_attention(q, k, v, scale)
    if not (use_pallas or interpret):
        return _xla_attention(q, k, v, scale)

    if block_q is None:
        block_q = 512 if sq >= 512 else sq
    if block_k is None:
        block_k = 4096 if kv >= 4096 else 1024

    return _pallas_attention_diff(scale, block_q, block_k, interpret)(q, k, v)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Attention over [B, S, H*D] tensors (the SpatialTransformer layout,
    reference attention.py:280-348). Splits heads, runs flash attention,
    re-merges."""
    b, sq, inner = q.shape
    d = inner // num_heads

    def split(x):
        return x.reshape(b, x.shape[1], num_heads, d).transpose(0, 2, 1, 3)

    out = flash_attention(split(q), split(k), split(v), scale, use_pallas=use_pallas)
    return out.transpose(0, 2, 1, 3).reshape(b, sq, inner)
