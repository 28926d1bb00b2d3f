"""Static HLO MXU-FLOP counter (utils/hlo_flops): the second, pinned MFU
convention bench.py reports (VERDICT r3 W6). Checked against hand-computed
2MNK on compiled programs."""

import jax
import jax.numpy as jnp

from scrubvae_tpu.utils.hlo_flops import static_mxu_flops


def _compiled(fn, *args):
    return jax.jit(fn).lower(*args).compile()


def test_dot_flops_exact():
    c = _compiled(lambda a, b: a @ b, jnp.zeros((128, 256)), jnp.zeros((256, 64)))
    assert static_mxu_flops(c.as_text()) == 2 * 128 * 256 * 64


def test_conv_flops_exact():
    # (B, W, Cin) conv1d with kernel K, Cout: 2 * B*Wout*Cout * K*Cin
    B, W, Cin, Cout, K = 4, 32, 8, 16, 5

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1,), "VALID", dimension_numbers=("NWC", "WIO", "NWC")
        )

    c = _compiled(conv, jnp.zeros((B, W, Cin)), jnp.zeros((K, Cin, Cout)))
    wout = W - K + 1
    assert static_mxu_flops(c.as_text()) == 2 * B * wout * Cout * K * Cin


def test_scan_body_counted_once():
    """Like compiled.cost_analysis(), the static count sees the scan body
    ONCE — both conventions are per-step for the scanned train epoch."""

    def step(c, _):
        return c @ c, None

    def scanned(a):
        out, _ = jax.lax.scan(step, a, None, length=10)
        return out

    a = jnp.zeros((64, 64))
    one = static_mxu_flops(_compiled(lambda x: x @ x, a).as_text())
    ten = static_mxu_flops(_compiled(scanned, a).as_text())
    assert one == 2 * 64 * 64 * 64
    assert ten == one
