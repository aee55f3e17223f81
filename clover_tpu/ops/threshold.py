"""Hard thresholding: keep the top-K elements by |value|, zero the rest.

Reference: CloverVector4.h:1913-2060 (min-heap streaming), ditto for 8/16/32.
Block scales are NOT updated (reference behavior: only ``setBits(i, 0)`` is
called; the scale array is untouched).  Ties break toward the lower index —
the reference's heap is order-dependent on ties, so we fix a deterministic
rule (its validation compares restored top-K sets at 10% tolerance,
test/validate/02_vector.cpp:449-554, which this satisfies).

TPU-native design: ``jax.lax.top_k`` over |restored| (a single fused
reduce), then a scatter mask over the codes.  The distributed version
(per-shard top-k + gathered merge) lives in clover_tpu.parallel — the same
two-phase algorithm as the reference's parallel heap merge
(CloverVector4.h:1975-2060) with ICI standing in for shared memory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats import (
    QVec4, QVec8, QVec16, QVec32, pack_nibbles, unpack_nibbles,
)
from .quantize import restore_vec


_CHUNK = 2048


def _top_k_idx(vals: jax.Array, k: int) -> jax.Array:
    """Indices of the top-k values; deterministic lower-index tie-break.

    For large vectors a two-stage select (per-2048-chunk top-k, then
    top-k over the C*k candidates) replaces the full-length sort — the
    global top-k is always a subset of the per-chunk top-k's, and
    ``lax.top_k``'s stable ordering preserves the lower-index tie-break
    through both stages (candidates stay in (chunk, rank) order)."""
    npad = vals.shape[-1]
    if npad % _CHUNK or npad // _CHUNK < 4 or k > _CHUNK:
        _, idx = jax.lax.top_k(vals, k)
        return idx
    c = npad // _CHUNK
    pv, pi = jax.lax.top_k(vals.reshape(c, _CHUNK), k)     # (c, k)
    base = (jnp.arange(c, dtype=jnp.int32) * _CHUNK)[:, None]
    gidx = (pi.astype(jnp.int32) + base).reshape(-1)
    _, sel = jax.lax.top_k(pv.reshape(-1), k)
    return gidx[sel]


def threshold(x, k: int):
    """Return x with all but its K largest-magnitude elements zeroed."""
    vals = jnp.abs(restore_vec(x).values)
    npad = vals.shape[-1]
    # Exclude padding from the competition.
    if x.length < npad:
        idx = jnp.arange(npad)
        vals = jnp.where(idx < x.length, vals, -1.0)
    keep_idx = _top_k_idx(vals, k)
    mask = jnp.zeros((npad,), jnp.bool_).at[keep_idx].set(True)

    if isinstance(x, QVec4):
        codes = unpack_nibbles(x.codes)
        codes = jnp.where(mask, codes, jnp.int8(0))
        return QVec4(codes=pack_nibbles(codes), scales=x.scales,
                     length=x.length)
    if isinstance(x, QVec8):
        codes = jnp.where(mask, x.codes, jnp.int8(0))
        return QVec8(codes=codes, scales=x.scales, length=x.length)
    if isinstance(x, QVec16):
        return QVec16(values=jnp.where(mask, x.values, jnp.float16(0)),
                      length=x.length)
    return QVec32(values=jnp.where(mask, x.values, jnp.float32(0)),
                  length=x.length)
