"""Pallas TPU kernels for the feature front-end.

Status of the mu-law pair (VERDICT r4 #6): these are TEST ORACLES, not the
production path.  XLA already fuses the 5-6 elementwise HLOs of the jnp
mu-law into one kernel, and the standalone Pallas version must pad the
input to a whole (1024, 128) tile grid — one full-size concat before and
one slice after, i.e. ~3x the HBM traffic of the fused jnp chain — so it
measures ~2.7x SLOWER (BENCH_preproc.json: ``preproc_mulaw_pallas_oracle``
vs ``preproc_mulaw_jnp``).  No production caller routes through it
(``MuLawCompress.jax_func`` is pure jnp); it is kept because the fused
decode kernels (``ops/pallas_decode.py``) embed this exact mu-law
arithmetic in-kernel and the interpret-mode pair pins that math on CPU
(tests/test_ops.py).  ``categorical`` below is likewise opt-in
(``CategoricalSampler(impl='pallas')`` for bulk out-of-scan sampling) —
inside the decode scan the default jnp sampling fuses into the loop body
and wins, and the fused decode kernels embed their own sampling.

Reference behavior: the centered mu-law of ``functionals.py:313-373``.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

__all__ = ["mulaw_compress", "mulaw_expand", "available"]

_LANE = 128
_SUBLANE = 8
_BLOCK_ROWS = 1024  # (1024, 128) f32 tile = 512 KB in / 512 KB out in VMEM


def available() -> bool:
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _pad_to_tile(x, fill=0.0):
    """Pad to a whole number of (_BLOCK_ROWS, _LANE) grid blocks."""
    import jax.numpy as jnp

    n = x.size
    flat = x.reshape(-1)
    tile = _BLOCK_ROWS * _LANE
    padded = ((n + tile - 1) // tile) * tile
    if padded != n:
        flat = jnp.concatenate(
            [flat, jnp.full((padded - n,), fill, flat.dtype)]
        )
    return flat.reshape(-1, _LANE), n


@lru_cache(maxsize=None)
def _compress_call(rows, q_levels, compression, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    mu = q_levels - 1.0
    log_denom = float(np.log1p(mu * compression))

    def kernel(x_ref, o_ref):
        x = x_ref[:]
        x_mu = (
            jnp.sign(x)
            * jnp.log1p(mu * jnp.abs(x) * compression)
            / log_denom
        )
        o_ref[:] = ((x_mu + 1.0) * (mu / 2.0) + 0.5).astype(jnp.int32)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, _LANE), jnp.int32),
        grid=(rows // _BLOCK_ROWS,),
        in_specs=[
            pl.BlockSpec(
                (_BLOCK_ROWS, _LANE), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (_BLOCK_ROWS, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )


@lru_cache(maxsize=None)
def _expand_call(rows, q_levels, compression, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    mu = q_levels - 1.0
    log_term = float(np.log1p(mu * compression))

    def kernel(x_ref, o_ref):
        y = (x_ref[:].astype(jnp.float32) / mu) * 2.0 - 1.0
        o_ref[:] = (
            jnp.sign(y)
            * (jnp.exp(jnp.abs(y) * log_term) - 1.0)
            / (mu * compression)
        )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, _LANE), jnp.float32),
        grid=(rows // _BLOCK_ROWS,),
        in_specs=[
            pl.BlockSpec(
                (_BLOCK_ROWS, _LANE), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (_BLOCK_ROWS, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )


def mulaw_compress(x, q_levels: int = 256, compression: float = 1.0,
                   interpret=None):
    """Fused centered mu-law quantizer; returns int32 class indices."""
    import jax.numpy as jnp

    if interpret is None:
        interpret = not available()
    x = jnp.asarray(x, jnp.float32)
    tiled, n = _pad_to_tile(x)
    out = _compress_call(tiled.shape[0], q_levels, compression, interpret)(tiled)
    return out.reshape(-1)[:n].reshape(x.shape)


def mulaw_expand(x, q_levels: int = 256, compression: float = 1.0,
                 interpret=None):
    import jax.numpy as jnp

    if interpret is None:
        interpret = not available()
    x = jnp.asarray(x, jnp.int32)
    tiled, n = _pad_to_tile(x, fill=0)
    out = _expand_call(tiled.shape[0], q_levels, compression, interpret)(tiled)
    return out.reshape(-1)[:n].reshape(x.shape)


# ---------------------------------------------------------------------------
# fused categorical sampling (the decode hot path's sampler): temperature
# scaling + gumbel noise from the TPU's native PRNG + argmax, one VMEM pass
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _categorical_call(B, Q, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(seed_ref, logits_ref, temp_ref, out_ref):
        pltpu.prng_seed(seed_ref[0])
        # bitcast to uint32 BEFORE shifting: an arithmetic shift of signed
        # bits sign-extends into the exponent and mints NaNs
        bits = pltpu.bitcast(pltpu.prng_random_bits((B, Q)), jnp.uint32)
        # uint32 -> uniform in (0, 1): set exponent to 1.0..2.0 and subtract
        fbits = pltpu.bitcast(
            (bits >> 9) | jnp.uint32(0x3F800000), jnp.float32
        )
        u = fbits - 1.0
        u = jnp.clip(u, 1e-7, 1.0 - 1e-7)
        gumbel = -jnp.log(-jnp.log(u))
        t = temp_ref[0]
        scaled = logits_ref[:] / t + gumbel
        out_ref[:] = jnp.argmax(scaled, axis=-1, keepdims=True).astype(
            jnp.int32
        )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def categorical(logits, temperature, seed, interpret=None):
    """Sample class indices from (..., Q) logits with temperature via the
    gumbel-argmax trick, fused in one Pallas kernel.

    ``seed`` is an int32 scalar (fold the step counter in upstream).
    Returns (...,) int32.
    """
    import jax.numpy as jnp

    if interpret is None:
        interpret = not available()
    lead = logits.shape[:-1]
    Q = logits.shape[-1]
    B = int(np.prod(lead)) if lead else 1
    flat = logits.reshape(B, Q).astype(jnp.float32)
    # pad lanes to a multiple of 128 with -inf so padding never wins
    Qp = ((Q + _LANE - 1) // _LANE) * _LANE
    Bp = ((B + _SUBLANE - 1) // _SUBLANE) * _SUBLANE
    if Qp != Q or Bp != B:
        flat = jnp.pad(
            flat, ((0, Bp - B), (0, Qp - Q)), constant_values=-jnp.inf
        )
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    temp_arr = jnp.asarray(temperature, jnp.float32).reshape(1)
    out = _categorical_call(Bp, Qp, interpret)(seed_arr, flat, temp_arr)
    return out[:B, 0].reshape(lead)
