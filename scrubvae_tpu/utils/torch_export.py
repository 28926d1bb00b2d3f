"""Export flax variables to reference torch ``.pth`` state_dicts.

Exact inverse of ``utils.torch_import``: a run trained in this framework can
be handed back to the reference codebase (its eval/plot tooling loads
``weights/epoch_E.pth`` with ``strict=False``,
/root/reference/src/scrubvae/get/model.py:141-149). Layout conversions are
the importer's, inverted:

- flax NWC conv kernel (k, in, out)      -> torch Conv1d weight (out, in, k)
- flax dilated-correlation kernel        -> torch ConvTranspose1d weight
  (k, in, out, spatially flipped)           (in, out, k)
- flax Dense kernel (in, out)            -> torch Linear weight (out, in)
- head flatten-order: our length-major (L, C) columns permute back to
  torch's channel-major (C, L) on fc_mu / fc_sigma / fc_alpha / fc_beta
  inputs and fc_in outputs
- scale/bias + batch_stats               -> BatchNorm weight/bias/running_*
  (plus a zero ``num_batches_tracked``, present in every torch state_dict)
- scalar PReLU alpha                     -> weight of shape (1,)
- the low-rank sigma head (``model.sigma_head_rank``, a config-gated
  deviation with no torch counterpart) exports as the exactly-equivalent
  dense ``fc_sigma.0``: the two factors compose linearly, so
  W = (Ku @ Kv)^T and b = bu @ Kv + bv reproduce its outputs bit-for-bit
  in f32 up to one extra rounding.

Leaves with no reference counterpart are returned in ``unexported`` —
the mirror of the importer's ``strict=False`` reporting.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

__all__ = [
    "export_resvae_state_dict",
    "export_transformer_state_dict",
    "export_torch_weights",
]


def _conv_w(kernel: np.ndarray) -> np.ndarray:
    # flax (k, in, out) -> torch Conv1d (out, in, k)
    return np.ascontiguousarray(kernel.transpose(2, 1, 0))


def _convT_w(kernel: np.ndarray) -> np.ndarray:
    # our (k, in, out) spatially-flipped correlation kernel
    # -> torch ConvTranspose1d (in, out, k)
    return np.ascontiguousarray(kernel[::-1].transpose(1, 2, 0))


def _dense_w(kernel: np.ndarray) -> np.ndarray:
    # flax (in, out) -> torch (out, in)
    return np.ascontiguousarray(kernel.T)


def _chw_to_lc_perm(C: int, L: int) -> np.ndarray:
    """Importer's permutation p: flat_torch[p[j]] == flat_ours[j]."""
    l = np.arange(L * C) // C
    c = np.arange(L * C) % C
    return c * L + l


def _strip_scope(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Undo the factory's enclosing scope (params/vae/encoder/... ->
    params/encoder/...), mirroring the importer's detection."""
    scope = ""
    for p in flat:
        m = re.match(r"params/(.*?)encoder/", p)
        if m:
            scope = m.group(1)
            break
    if not scope:
        return dict(flat)
    out = {}
    for p, v in flat.items():
        for root in ("params/", "batch_stats/"):
            if p.startswith(root + scope):
                p = root + p[len(root) + len(scope):]
                break
        out[p] = v
    return out


def export_resvae_state_dict(variables: Dict) -> Tuple[Dict[str, np.ndarray], list]:
    """Map a flax ResVAE/ScrubVAE variables tree onto reference torch
    state_dict names (reference residual.py:183-491, disentangle.py heads).

    Returns ``(state_dict_as_numpy, unexported_flax_paths)``.
    """
    import flax

    flat = {
        p: np.asarray(v, dtype=np.float32)
        for p, v in flax.traverse_util.flatten_dict(variables, sep="/").items()
    }
    flat = _strip_scope(flat)
    sd: Dict[str, np.ndarray] = {}
    used = set()

    def take(path: str):
        if path in flat:
            used.add(path)
            return flat[path]
        return None

    def conv(flax_prefix: str, torch_prefix: str, transpose: bool = False):
        w = take(f"params/{flax_prefix}/kernel")
        b = take(f"params/{flax_prefix}/bias")
        if w is not None:
            sd[f"{torch_prefix}.weight"] = _convT_w(w) if transpose else _conv_w(w)
        if b is not None:
            sd[f"{torch_prefix}.bias"] = b

    def bn(flax_mod: str, bn_name: str, torch_prefix: str):
        w = take(f"params/{flax_mod}/{bn_name}/scale")
        b = take(f"params/{flax_mod}/{bn_name}/bias")
        rm = take(f"batch_stats/{flax_mod}/{bn_name}/mean")
        rv = take(f"batch_stats/{flax_mod}/{bn_name}/var")
        if w is not None:
            sd[f"{torch_prefix}.weight"] = w
        if b is not None:
            sd[f"{torch_prefix}.bias"] = b
        if rm is not None:
            sd[f"{torch_prefix}.running_mean"] = rm
        if rv is not None:
            sd[f"{torch_prefix}.running_var"] = rv
            sd[f"{torch_prefix}.num_batches_tracked"] = np.zeros((), np.int64)

    def prelu(flax_path: str, torch_key: str):
        a = take(flax_path)
        if a is not None:
            sd[torch_key] = np.asarray(a, np.float32).reshape(1)

    # ----- encoder -----
    conv("encoder/Conv1d_0/Conv_0", "encoder.conv_in")
    prelu("params/encoder/PReLU_0/alpha", "encoder.activation.weight")

    enc_blocks = sorted(
        {
            int(m.group(1))
            for p in flat
            if (m := re.match(r"params/encoder/ResidualBlock_(\d+)/", p))
        }
    )
    for i in enc_blocks:
        f = f"encoder/ResidualBlock_{i}"
        t = f"encoder.res_layers.{i}"
        conv(f"{f}/Conv1d_0/Conv_0", f"{t}.residual.0")
        bn(f, "BatchNorm_0", f"{t}.residual.1")
        prelu(f"params/{f}/PReLU_0/alpha", f"{t}.residual.2.weight")
        conv(f"{f}/Conv1d_1/Conv_0", f"{t}.residual.3")
        conv(f"{f}/Conv1d_2/Conv_0", f"{t}.skip")
        bn(f, "BatchNorm_1", f"{t}.add.0")
        prelu(f"params/{f}/PReLU_1/alpha", f"{t}.add.1.weight")

    # Flatten-order perm: C is the widest last-conv width of the encoder
    # blocks (the importer infers it identically).
    cands = [
        flat[p].shape[-1]
        for p in flat
        if re.search(r"params/encoder/ResidualBlock_\d+/Conv1d_1/Conv_0/kernel$", p)
    ]
    C = max(cands) if cands else None

    def head_perm(flat_dim: int) -> np.ndarray:
        if not C or flat_dim % C:
            return np.arange(flat_dim)
        return _chw_to_lc_perm(C, flat_dim // C)

    def head(flax_name: str, torch_name: str, kernel=None, bias=None):
        """Dense head whose INPUT columns permute back to torch order."""
        k = kernel if kernel is not None else take(f"params/{flax_name}/kernel")
        b = bias if bias is not None else take(f"params/{flax_name}/bias")
        if k is not None:
            perm = head_perm(k.shape[0])
            w = np.empty((k.shape[1], k.shape[0]), np.float32)
            w[:, perm] = k.T
            sd[f"{torch_name}.weight"] = w
        if b is not None:
            sd[f"{torch_name}.bias"] = b

    head("encoder/fc_mu", "encoder.fc_mu")
    if "params/encoder/fc_sigma_v/kernel" in flat:
        # low-rank factored head -> equivalent dense (linear composition)
        ku = take("params/encoder/fc_sigma_u/kernel")
        bu = take("params/encoder/fc_sigma_u/bias")
        kv = take("params/encoder/fc_sigma_v/kernel")
        bv = take("params/encoder/fc_sigma_v/bias")
        head(
            "encoder/fc_sigma",
            "encoder.fc_sigma.0",
            kernel=ku @ kv,
            bias=(bu @ kv if bu is not None else 0.0)
            + (bv if bv is not None else 0.0),
        )
    else:
        head("encoder/fc_sigma", "encoder.fc_sigma.0")
    head("encoder/fc_alpha", "encoder.fc_alpha")
    head("encoder/fc_beta", "encoder.fc_beta")

    # ----- decoder -----
    k = take("params/decoder/fc_in/kernel")
    b = take("params/decoder/fc_in/bias")
    if k is not None:
        perm = head_perm(k.shape[1])
        w = np.empty((k.shape[1], k.shape[0]), np.float32)
        w[perm] = k.T
        sd["decoder.fc_in.weight"] = w
    if b is not None:
        bt = np.empty_like(b)
        bt[head_perm(b.shape[0])] = b
        sd["decoder.fc_in.bias"] = bt

    dec_blocks = sorted(
        {
            int(m.group(1))
            for p in flat
            if (m := re.match(r"params/decoder/ResidualBlockTranspose_(\d+)/", p))
        }
    )
    for i in dec_blocks:
        f = f"decoder/ResidualBlockTranspose_{i}"
        t = f"decoder.res_layers.{i}"
        conv(f"{f}/ConvTranspose1d_0", f"{t}.residual.0", transpose=True)
        bn(f, "BatchNorm_0", f"{t}.residual.1")
        prelu(f"params/{f}/PReLU_0/alpha", f"{t}.residual.2.weight")
        conv(f"{f}/ConvTranspose1d_1", f"{t}.residual.3", transpose=True)
        conv(f"{f}/Conv1d_0/Conv_0", f"{t}.skip.1")
        bn(f, "BatchNorm_1", f"{t}.add.0")
        prelu(f"params/{f}/PReLU_1/alpha", f"{t}.add.1.weight")

    conv("decoder/conv_out", "decoder.conv_out", transpose=True)

    # ----- scrubber heads -----
    for p in list(flat):
        m = re.match(r"params/linear_([^/]+)/kernel$", p)
        if m:
            # LinearProjection kernel orientation matches torch directly
            sd[f"disentangle.linear.{m.group(1)}.decoder.weight"] = take(p)
            continue
        m = re.match(
            r"params/gr_([^/]+)/ensemble/(mlp\d)_(\d)/(kernel|bias)$", p
        )
        if m:
            feat, mlp, j, kb = m.groups()
            key = (
                f"disentangle.grad_reversal.{feat}.reversal.1."
                f"{mlp}.{2 * int(j)}." + ("weight" if kb == "kernel" else "bias")
            )
            v = take(p)
            sd[key] = _dense_w(v) if kb == "kernel" else v

    unexported = sorted(set(flat) - used)
    return sd, unexported


def export_transformer_state_dict(
    variables: Dict,
) -> Tuple[Dict[str, np.ndarray], list]:
    """Map flax TransformerEncoder/Decoder/VAE variables onto the reference
    TransformerVAE state_dict (reference transformer.py:29-167). Accepts a
    bare encoder tree, a bare decoder tree, or the full VAE tree; emits
    whichever halves are present. Inverse of
    ``torch_import.convert_transformer_state_dict``."""
    import flax

    flat = {
        p: np.asarray(v, dtype=np.float32)
        for p, v in flax.traverse_util.flatten_dict(variables, sep="/").items()
    }
    sd: Dict[str, np.ndarray] = {}
    used = set()

    def take_suffix(suffix: str):
        hits = [p for p in flat if p.endswith(suffix)]
        if len(hits) > 1:
            raise ValueError(f"ambiguous flax suffix {suffix}: {hits}")
        if not hits:
            return None
        used.add(hits[0])
        return flat[hits[0]]

    def dense(flax_mod: str, torch_prefix: str):
        k = take_suffix(f"{flax_mod}/kernel")
        b = take_suffix(f"{flax_mod}/bias")
        if k is not None:
            sd[f"{torch_prefix}.weight"] = _dense_w(k)
        if b is not None:
            sd[f"{torch_prefix}.bias"] = b

    def norm(flax_mod: str, torch_prefix: str):
        w = take_suffix(f"{flax_mod}/scale")
        b = take_suffix(f"{flax_mod}/bias")
        if w is not None:
            sd[f"{torch_prefix}.weight"] = w
        if b is not None:
            sd[f"{torch_prefix}.bias"] = b

    def mha(flax_mod: str, torch_prefix: str):
        ks = [take_suffix(f"{flax_mod}/{n}/kernel") for n in ("query", "key", "value")]
        bs = [take_suffix(f"{flax_mod}/{n}/bias") for n in ("query", "key", "value")]
        ok = take_suffix(f"{flax_mod}/out/kernel")
        ob = take_suffix(f"{flax_mod}/out/bias")
        if any(k is None for k in ks):
            return
        d = ks[0].shape[0]
        # flax (d_in, heads, head_dim) -> torch rows (d_out, d_in)
        sd[f"{torch_prefix}.in_proj_weight"] = np.concatenate(
            [np.ascontiguousarray(k.reshape(d, d).T) for k in ks], axis=0
        )
        if all(b is not None for b in bs):
            sd[f"{torch_prefix}.in_proj_bias"] = np.concatenate(
                [b.reshape(d) for b in bs]
            )
        if ok is not None:
            sd[f"{torch_prefix}.out_proj.weight"] = np.ascontiguousarray(
                ok.reshape(d, d).T
            )
        if ob is not None:
            sd[f"{torch_prefix}.out_proj.bias"] = ob

    dense("pose_embedding", "encoder.pose_embedding")
    enc_layers = sorted(
        {
            int(m.group(1))
            for p in flat
            if (m := re.search(r"EncoderLayer_(\d+)/", p))
        }
    )
    for i in enc_layers:
        f = f"EncoderLayer_{i}"
        t = f"encoder.transformer_encoder.layers.{i}"
        mha(f"{f}/MultiHeadDotProductAttention_0", f"{t}.self_attn")
        dense(f"{f}/Dense_0", f"{t}.linear1")
        dense(f"{f}/Dense_1", f"{t}.linear2")
        norm(f"{f}/LayerNorm_0", f"{t}.norm1")
        norm(f"{f}/LayerNorm_1", f"{t}.norm2")
    dense("fc_mu", "encoder.fc_mu")
    dense("fc_sigma", "encoder.fc_sigma.0")

    dec_layers = sorted(
        {
            int(m.group(1))
            for p in flat
            if (m := re.search(r"DecoderLayer_(\d+)/", p))
        }
    )
    for i in dec_layers:
        f = f"DecoderLayer_{i}"
        t = f"decoder.transformer_decoder.layers.{i}"
        mha(f"{f}/MultiHeadDotProductAttention_0", f"{t}.self_attn")
        mha(f"{f}/MultiHeadDotProductAttention_1", f"{t}.multihead_attn")
        dense(f"{f}/Dense_0", f"{t}.linear1")
        dense(f"{f}/Dense_1", f"{t}.linear2")
        norm(f"{f}/LayerNorm_0", f"{t}.norm1")
        norm(f"{f}/LayerNorm_1", f"{t}.norm2")
        norm(f"{f}/LayerNorm_2", f"{t}.norm3")
    dense("fc_out", "decoder.fc_out")

    unexported = sorted(set(flat) - used)
    return sd, unexported


def export_torch_weights(variables: Dict, path, verbose: bool = True) -> list:
    """One-call export: write ``path`` (a torch ``.pth``) from a flax
    variables tree, dispatching on the tree's own keys (a transformer tree
    carries ``pose_embedding``). Returns the unexported flax paths."""
    import flax
    import torch

    paths = flax.traverse_util.flatten_dict(variables, sep="/")
    if any("pose_embedding" in p for p in paths):
        sd, unexported = export_transformer_state_dict(variables)
    else:
        sd, unexported = export_resvae_state_dict(variables)
    torch.save(
        {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()},
        path,
    )
    if verbose and unexported:
        print(
            f"torch_export: {len(unexported)} flax leaves with no torch "
            f"counterpart: {unexported[:8]}{'...' if len(unexported) > 8 else ''}"
        )
    return unexported
