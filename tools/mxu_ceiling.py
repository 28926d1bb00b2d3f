"""Measure THIS chip's achievable matmul + HBM ceilings (MFU calibration).

README's MFU quotes divide by the v5e datasheet peaks (197 bf16 TFLOP/s,
819 GB/s HBM). Whether the flagship step's ~0.32 MFU is "poor kernels" or
"operand sizes below the MXU knee" is decidable: time serial matmul chains
(layer-like dependence, dims multiples of 512, no layout churn) at several
sizes, the step's own dominant shapes, and a bandwidth stream, on the same
device through the same tunnel. Whatever fraction of datasheet these achieve
is the ceiling every other number should be read against.

Measurement notes (all discovered the hard way on the axon tunnel):
- every jitted probe returns a SCALAR reduction: ``block_until_ready`` on a
  large device array returns early through this tunnel (a 64-matmul chain
  "completed" in 0.05 ms when returning the matrix; 71 ms — the real time —
  when returning its sum);
- normalization is folded into the B operand once at setup, so chain bodies
  are pure ``dot`` (an elementwise rescale between matmuls costs an extra
  HBM pass and ~11% at n=4096);
- chains are serial (c_{i+1} = c_i @ B) because a training step's layers
  are serial — this measures the layer-sequential rate, not batched
  independent-matmul throughput.

Usage: python tools/mxu_ceiling.py [--out FILE]
"""

import argparse
import json
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed_scalar(fn, *args):
    """Compile+warm, then time one call, forcing completion via float()."""
    float(fn(*args))
    t0 = time.perf_counter()
    v = float(fn(*args))
    dt = time.perf_counter() - t0
    assert np.isfinite(v), v
    return dt


def square_chain(n, steps, accum=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (n, n), jnp.bfloat16)
    b = (jax.random.normal(key, (n, n)) / n).astype(jnp.bfloat16)

    @jax.jit
    def chain(a, b):
        def body(c, _):
            c = jnp.dot(c, b, preferred_element_type=accum)
            return c.astype(jnp.bfloat16), ()

        c, _ = jax.lax.scan(body, a, None, length=steps)
        return jnp.float32(jnp.abs(c).sum())

    dt = timed_scalar(chain, a, b)
    return 2 * n**3 * steps / dt / 1e12, dt


def rect_chain(m, k, n, steps):
    """Serial chain alternating (m,k)@(k,n) and (m,n)@(n,k) — the step's
    dense-head shape, kept serial via the alternation."""
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    w1 = (jax.random.normal(key, (k, n)) / k).astype(jnp.bfloat16)
    w2 = (jax.random.normal(key, (n, k)) / n).astype(jnp.bfloat16)

    @jax.jit
    def chain(x, w1, w2):
        def body(c, _):
            h = jnp.dot(c, w1, preferred_element_type=jnp.bfloat16)
            c = jnp.dot(h, w2, preferred_element_type=jnp.bfloat16)
            return c, ()

        c, _ = jax.lax.scan(body, x, None, length=steps)
        return jnp.float32(jnp.abs(c).sum())

    dt = timed_scalar(chain, x, w1, w2)
    return 2 * (2 * m * k * n) * steps / dt / 1e12, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    res = {"device_kind": jax.devices()[0].device_kind}

    print("serial bf16 matmul chains (achievable MXU rate by operand size):")
    for n, steps in ((1024, 256), (2048, 128), (4096, 64), (8192, 32)):
        tf, dt = square_chain(n, steps)
        res[f"bf16_sq{n}_tflops"] = tf
        print(f"  n={n:5d} x{steps:3d}: {dt * 1e3:7.2f} ms  {tf:6.1f} TFLOP/s"
              f"  ({100 * tf / 197:.0f}% of datasheet 197)")

    tf32, dt = square_chain(4096, 64, accum=jnp.float32)
    res["f32accum_sq4096_tflops"] = tf32
    print(f"  n=4096 f32-accum : {dt * 1e3:7.2f} ms  {tf32:6.1f} TFLOP/s")

    # the flagship's dominant dense shape: fc_sigma (B=512, 4096 -> 8256)
    tfh, dt = rect_chain(512, 4096, 8256, 32)
    res["bf16_head_512x4096x8256_tflops"] = tfh
    print(f"  head 512x4096x8256: {dt * 1e3:7.2f} ms  {tfh:6.1f} TFLOP/s"
          f"  ({100 * tfh / 197:.0f}%)")

    # a mid-stack conv's matmul equivalent: out rows m = B x spatial_out
    # (512x7), contraction k = kernel x Cin (4x512), features n = Cout (512)
    tfc, dt = rect_chain(3584, 2048, 512, 64)
    res["bf16_convshape_3584x2048x512_tflops"] = tfc
    print(f"  conv-shape 3584x2048x512: {dt * 1e3:7.2f} ms  {tfc:6.1f}"
          f" TFLOP/s  ({100 * tfc / 197:.0f}%)")

    # HBM stream: c += y, scanned; 3 arrays of traffic per iteration
    steps = 64
    m = 64 * (1 << 20) // 4
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (m,), jnp.float32)
    y = jax.random.normal(key, (m,), jnp.float32)

    @jax.jit
    def stream(x, y):
        def body(c, _):
            return c + y * 1.000001, ()

        c, _ = jax.lax.scan(body, x, None, length=steps)
        return c.sum()

    dts = timed_scalar(stream, x, y)
    gbs = 3 * m * 4 * steps / dts / 1e9
    res["hbm_gb_per_s"] = gbs
    print(f"HBM stream 64MiB x{steps}: {dts * 1e3:.2f} ms  {gbs:.0f} GB/s  "
          f"({100 * gbs / 819:.0f}% of datasheet 819)")

    # H2D through this attachment (PCIe on a real TPU VM; the network here)
    h2d_mb = 16
    buf = np.random.default_rng(0).standard_normal(
        h2d_mb * (1 << 20) // 4).astype(np.float32)
    jax.block_until_ready(jax.device_put(buf))
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        jax.block_until_ready(jax.device_put(buf))
    dth = (time.perf_counter() - t0) / reps
    res["h2d_gb_per_s"] = buf.nbytes / dth / 1e9
    print(f"H2D {h2d_mb} MiB: {dth * 1e3:.1f} ms  "
          f"{res['h2d_gb_per_s'] * 1e3:.0f} MB/s")

    if args.out:
        pathlib.Path(args.out).write_text(json.dumps(res, indent=1))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
