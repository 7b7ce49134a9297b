"""Experiment: where does the SampleRNN train step's time go, and which
LSTM-over-time formulation is fastest for fwd+bwd on this TPU?

Variants (B=32, T=256, D=H=256 — the bench net's tier-1 shape):
  scan_u{k}    — flax OptimizedLSTMCell under lax.scan, unroll=k (current=1)
  hoist_u{k}   — input projection x@Wi hoisted out of the scan as ONE
                 (B*T, D)@(D, 4H) MXU matmul; scan carries only h@Wh+gates
Prints seconds per fwd+bwd call for each.
"""
import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from _timing import timeit, step_flops

B, T, D, H = 32, 256, 256, 256


def make_scan(unroll):
    import flax.linen as nn

    cell = nn.OptimizedLSTMCell(features=H)

    def fwd(params, x, c0):
        def body(c, x_t):
            c2, y = cell.apply({"params": params}, c, x_t)
            return c2, y

        _, ys = jax.lax.scan(body, c0, jnp.swapaxes(x, 0, 1), unroll=unroll)
        return jnp.swapaxes(ys, 0, 1)

    rng = jax.random.PRNGKey(0)
    params = cell.init(rng, (jnp.zeros((B, H)), jnp.zeros((B, H))),
                       jnp.zeros((B, D)))["params"]
    return fwd, params


def make_hoist(unroll):
    """Same math as OptimizedLSTMCell (i|f|g|o gates, f-bias handled by
    params), but x@Wi for ALL timesteps hoisted out of the scan."""

    def init(rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        s = 1.0 / np.sqrt(H)
        return dict(
            Wi=jax.random.uniform(k1, (D, 4 * H), jnp.float32, -s, s),
            Wh=jax.random.uniform(k2, (H, 4 * H), jnp.float32, -s, s),
            b=jnp.zeros((4 * H,)),
        )

    def fwd(params, x, c0):
        # one big MXU matmul for every timestep's input projection
        xi = jnp.einsum("btd,dk->btk", x, params["Wi"]) + params["b"]

        def body(c, xi_t):
            cc, h = c
            g = xi_t + h @ params["Wh"]
            i = jax.nn.sigmoid(g[:, :H])
            f = jax.nn.sigmoid(g[:, H:2 * H])
            gg = jnp.tanh(g[:, 2 * H:3 * H])
            o = jax.nn.sigmoid(g[:, 3 * H:])
            c2 = f * cc + i * gg
            h2 = o * jnp.tanh(c2)
            return (c2, h2), h2

        _, ys = jax.lax.scan(
            body, c0, jnp.swapaxes(xi, 0, 1), unroll=unroll
        )
        return jnp.swapaxes(ys, 0, 1)

    return fwd, init(jax.random.PRNGKey(0))


def bench(name, fwd, params):
    x = jnp.asarray(np.random.randn(B, T, D), jnp.float32)
    c0 = (jnp.zeros((B, H)), jnp.zeros((B, H)))

    def loss(p):
        return jnp.sum(fwd(p, x, c0) ** 2)

    step = jax.jit(jax.grad(loss))
    dt = timeit(step, params, n=3, min_seconds=0.4)
    fl = step_flops(step, params)
    print(f"{name}: {dt*1e3:.3f} ms/fwd+bwd  ({dt/T*1e6:.2f} us/iter, "
          f"{fl/dt/1e12:.1f} TFLOPS)")
    return dt


def make_fused():
    from mimikit_tpu.ops.pallas_lstm import fused_lstm_layer

    def init(rng):
        k1, k2 = jax.random.split(rng)
        s = 1.0 / np.sqrt(H)
        return dict(
            Wi=jax.random.uniform(k1, (D, 4 * H), jnp.float32, -s, s),
            Wh=jax.random.uniform(k2, (H, 4 * H), jnp.float32, -s, s),
            b=jnp.zeros((4 * H,)),
        )

    def fwd(params, x, c0):
        ys, hT, cT = fused_lstm_layer(
            jnp.swapaxes(x, 0, 1), params["Wi"], params["Wh"], params["b"],
            c0[1], c0[0],
        )
        return jnp.swapaxes(ys, 0, 1)

    return fwd, init(jax.random.PRNGKey(0))


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} B={B} T={T} D={D} H={H}")
    which = os.environ.get("EXP", "all")
    if which in ("all", "scan"):
        for u in (1, 4, 8, 16):
            fwd, p = make_scan(u)
            bench(f"scan_u{u}", fwd, p)
        for u in (1, 4, 8, 16):
            fwd, p = make_hoist(u)
            bench(f"hoist_u{u}", fwd, p)
    if which in ("all", "fused"):
        fwd, p = make_fused()
        bench("fused_pallas", fwd, p)
