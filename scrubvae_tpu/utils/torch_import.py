"""Import reference torch ``.pth`` checkpoints into the flax ResVAE.

The reference saves ``model.state_dict()`` every 5 epochs
(/root/reference/src/scrubvae/train/trainer.py:388-393) and reloads it with
``strict=False`` (/root/reference/src/scrubvae/get/model.py:141-149). This
module maps those torch parameter names/layouts onto our flax tree so a
reference-trained model can be evaluated (or fine-tuned) in this framework:

- torch Conv1d weight (out, in, k)            -> flax NWC kernel (k, in, out)
- torch ConvTranspose1d weight (in, out, k)   -> input-dilated-conv kernel
  (k, in, out) with the spatial axis flipped (transposed conv == correlation
  with the spatially-flipped kernel on the dilated input)
- torch Linear weight (out, in)               -> flax Dense kernel (in, out)
- flatten-order permutation for the heads: torch flattens conv features
  channel-major (C, L) (reference residual.py:213 nn.Flatten after NCW),
  ours length-major (L, C); fc_mu / fc_sigma / fc_alpha / fc_beta input
  columns and fc_in output rows are permuted accordingly
- BatchNorm weight/bias -> scale/bias params; running stats -> batch_stats
- PReLU weight (1,) -> scalar alpha

``strict=False`` semantics: reference keys with no flax counterpart (e.g.
``disentangle.*`` heads, ``arena_size``) and flax leaves with no reference
counterpart are collected and reported, never fatal.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

__all__ = [
    "load_torch_state_dict",
    "convert_resvae_state_dict",
    "convert_transformer_state_dict",
    "import_torch_weights",
]


def load_torch_state_dict(path) -> Dict[str, np.ndarray]:
    """Load a reference ``weights/epoch_E.pth`` file to numpy (CPU)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _conv_w(w: np.ndarray) -> np.ndarray:
    # torch (out, in, k) -> flax (k, in, out)
    return np.ascontiguousarray(w.transpose(2, 1, 0))


def _convT_w(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose (in, out, k) -> our (k, in, out), spatially flipped
    return np.ascontiguousarray(w.transpose(2, 0, 1)[::-1])


def _dense_w(w: np.ndarray) -> np.ndarray:
    # torch (out, in) -> flax (in, out)
    return np.ascontiguousarray(w.T)


def _chw_to_lc_perm(C: int, L: int) -> np.ndarray:
    """Permutation p with flat_torch[p[j]] == flat_ours[j]: torch flat index
    c*L + l, ours l*C + c."""
    l = np.arange(L * C) // C
    c = np.arange(L * C) % C
    return c * L + l


def convert_resvae_state_dict(
    sd: Dict[str, np.ndarray],
    variables: Dict,
) -> Tuple[Dict, list, list]:
    """Map a reference ResVAE state_dict onto a flax variables tree.

    Parameters
    ----------
    sd : torch state_dict as numpy arrays (``load_torch_state_dict``)
    variables : the flax ``{"params": ..., "batch_stats": ...}`` tree of an
        architecture-matched ResVAE (shapes are taken from it and verified).

    Returns ``(new_variables, unmapped_reference_keys, unfilled_flax_paths)``.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(variables, sep="/")
    # The factory nests ResVAE under an enclosing scope (e.g. params/vae/
    # encoder/...); detect the prefix from wherever the encoder entry conv
    # actually lives so both bare and wrapped trees import.
    scope = ""
    for p in flat:
        m = re.match(r"params/(.*?)encoder/Conv1d_0/Conv_0/kernel$", p)
        if m:
            scope = m.group(1)
            break

    def strip(p: str) -> str:
        for root in ("params/", "batch_stats/"):
            if scope and p.startswith(root + scope):
                return root + p[len(root) + len(scope):]
        return p

    # stripped path -> original path (scoped paths only differ)
    orig_of = {strip(p): p for p in flat}
    out = {strip(p): v for p, v in flat.items()}
    used = set()
    filled = set()

    def put(path: str, value: np.ndarray):
        if path not in out:
            return False
        want = out[path].shape
        value = np.asarray(value, dtype=np.float32)
        if value.shape != tuple(want):
            raise ValueError(f"{path}: shape {value.shape} != expected {want}")
        out[path] = value
        filled.add(path)
        return True

    def take(key: str):
        if key in sd:
            used.add(key)
            return sd[key]
        return None

    def bn(torch_prefix: str, flax_mod: str, bn_name: str):
        w, b = take(f"{torch_prefix}.weight"), take(f"{torch_prefix}.bias")
        rm = take(f"{torch_prefix}.running_mean")
        rv = take(f"{torch_prefix}.running_var")
        take(f"{torch_prefix}.num_batches_tracked")
        if w is not None:
            put(f"params/{flax_mod}/{bn_name}/scale", w)
        if b is not None:
            put(f"params/{flax_mod}/{bn_name}/bias", b)
        if rm is not None:
            put(f"batch_stats/{flax_mod}/{bn_name}/mean", rm)
        if rv is not None:
            put(f"batch_stats/{flax_mod}/{bn_name}/var", rv)

    def prelu(torch_key: str, flax_path: str):
        w = take(torch_key)
        if w is not None:
            put(flax_path, np.asarray(w).reshape(()))

    def conv(torch_prefix: str, flax_prefix: str, transpose: bool = False):
        w, b = take(f"{torch_prefix}.weight"), take(f"{torch_prefix}.bias")
        if w is not None:
            put(
                f"params/{flax_prefix}/kernel",
                _convT_w(w) if transpose else _conv_w(w),
            )
        if b is not None:
            put(f"params/{flax_prefix}/bias", b)

    # ----- encoder -----
    conv("encoder.conv_in", "encoder/Conv1d_0/Conv_0")
    prelu("encoder.activation.weight", "params/encoder/PReLU_0/alpha")

    enc_blocks = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"encoder\.res_layers\.(\d+)\.", k))
        }
    )
    for i in enc_blocks:
        t = f"encoder.res_layers.{i}"
        f = f"encoder/ResidualBlock_{i}"
        conv(f"{t}.residual.0", f"{f}/Conv1d_0/Conv_0")
        bn(f"{t}.residual.1", f, "BatchNorm_0")
        prelu(f"{t}.residual.2.weight", f"params/{f}/PReLU_0/alpha")
        conv(f"{t}.residual.3", f"{f}/Conv1d_1/Conv_0")
        conv(f"{t}.skip", f"{f}/Conv1d_2/Conv_0")
        bn(f"{t}.add.0", f, "BatchNorm_1")
        prelu(f"{t}.add.1.weight", f"params/{f}/PReLU_1/alpha")

    # Heads: permute the flattened-conv-feature axis from torch's (C, L)
    # order to our (L, C) order. C is the last encoder channel width.
    def head_in_perm(flat_dim: int) -> np.ndarray:
        # infer C from the last encoder block's conv width
        cands = [
            out[p].shape[-1]
            for p in out
            if re.search(r"encoder/ResidualBlock_\d+/Conv1d_1/Conv_0/kernel$", p)
        ]
        C = max(cands) if cands else None
        if not C or flat_dim % C:
            return np.arange(flat_dim)
        return _chw_to_lc_perm(C, flat_dim // C)

    for tname, fname in (
        ("encoder.fc_mu", "encoder/fc_mu"),
        ("encoder.fc_sigma.0", "encoder/fc_sigma"),
        ("encoder.fc_alpha", "encoder/fc_alpha"),
        ("encoder.fc_beta", "encoder/fc_beta"),
    ):
        w, b = take(f"{tname}.weight"), take(f"{tname}.bias")
        if w is not None:
            perm = head_in_perm(w.shape[1])
            put(f"params/{fname}/kernel", _dense_w(w[:, perm]))
        if b is not None:
            put(f"params/{fname}/bias", b)

    # ----- decoder -----
    w, b = take("decoder.fc_in.weight"), take("decoder.fc_in.bias")
    if w is not None:
        perm = head_in_perm(w.shape[0])
        put("params/decoder/fc_in/kernel", _dense_w(w[perm]))
    if b is not None:
        perm = head_in_perm(b.shape[0])
        put("params/decoder/fc_in/bias", b[perm])

    dec_blocks = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"decoder\.res_layers\.(\d+)\.", k))
        }
    )
    for i in dec_blocks:
        t = f"decoder.res_layers.{i}"
        f = f"decoder/ResidualBlockTranspose_{i}"
        conv(f"{t}.residual.0", f"{f}/ConvTranspose1d_0", transpose=True)
        bn(f"{t}.residual.1", f, "BatchNorm_0")
        prelu(f"{t}.residual.2.weight", f"params/{f}/PReLU_0/alpha")
        conv(f"{t}.residual.3", f"{f}/ConvTranspose1d_1", transpose=True)
        conv(f"{t}.skip.1", f"{f}/Conv1d_0/Conv_0")
        bn(f"{t}.add.0", f, "BatchNorm_1")
        prelu(f"{t}.add.1.weight", f"params/{f}/PReLU_1/alpha")

    conv("decoder.conv_out", "decoder/conv_out", transpose=True)

    # ----- scrubber heads (reference disentangle.* ModuleDict entries) -----
    # linear null-space decoder (disentangle.py:717-789): weight (out, in)
    # matches our LinearProjection kernel orientation directly
    for k in list(sd):
        m = re.match(r"disentangle\.linear\.([^.]+)\.decoder\.weight$", k)
        if m:
            put(f"params/linear_{m.group(1)}/kernel", take(k))
            continue
        # grad-reversal MLP ensembles (disentangle.py:635-660): torch
        # Sequential Linear indices 0,2,4 -> our mlpN_0/1/2 Dense layers
        m = re.match(
            r"disentangle\.grad_reversal\.([^.]+)\.reversal\.1\."
            r"(mlp\d)\.(\d+)\.(weight|bias)$",
            k,
        )
        if m:
            feat, mlp, idx, wb = m.groups()
            path = (
                f"params/gr_{feat}/ensemble/{mlp}_{int(idx) // 2}/"
                + ("kernel" if wb == "weight" else "bias")
            )
            v = take(k)
            put(path, _dense_w(v) if wb == "weight" else v)

    unmapped = sorted(set(sd) - used)
    unfilled = sorted(
        p
        for p in out
        if p not in filled
        # PReLU alphas exist per-activation; a tanh reference leaves them
        and not p.endswith("alpha")
        # leaves outside the VAE scope (scrubber heads etc.) are not the
        # importer's to fill; the reference loads those strict=False too
        and ("/encoder/" in p or "/decoder/" in p)
    )
    out = {orig_of[p]: v for p, v in out.items()}
    return flax.traverse_util.unflatten_dict(out, sep="/"), unmapped, unfilled


def convert_transformer_state_dict(
    sd: Dict[str, np.ndarray],
    variables: Dict,
    n_heads: int | None = None,
) -> Tuple[Dict, list, list]:
    """Map a reference TransformerVAE state_dict
    (/root/reference/src/scrubvae/model/transformer.py:29-167) onto our flax
    transformer tree (models/transformer.py).

    Layout conversions beyond ``_dense_w``:
    - torch MultiheadAttention packs q/k/v as ``in_proj_weight`` (3d, d) with
      the output dim split head-major; flax DenseGeneral kernels are
      (d_in, heads, head_dim) — transpose then reshape.
    - ``out_proj.weight`` (d, d) -> flax out kernel (heads, head_dim, d).

    Works on both bare encoder/decoder variable trees and the full
    TransformerVAE tree (paths are matched by suffix).
    """
    import flax

    flat = flax.traverse_util.flatten_dict(variables, sep="/")
    out = dict(flat)
    used, filled = set(), set()

    if n_heads is None:
        # infer from any flax attention kernel: shape (d, heads, head_dim)
        qshapes = [
            v.shape for p, v in flat.items() if p.endswith("query/kernel")
        ]
        if not qshapes:
            raise ValueError(
                "cannot infer n_heads: no attention kernels in the tree"
            )
        n_heads = int(qshapes[0][1])

    def take(key: str):
        if key in sd:
            used.add(key)
            return sd[key]
        return None

    def put_suffix(suffix: str, value) -> bool:
        """Fill the unique flax path ending in ``suffix``."""
        if value is None:
            return False
        hits = [p for p in out if p.endswith(suffix)]
        if len(hits) != 1:
            if len(hits) > 1:
                raise ValueError(f"ambiguous flax suffix {suffix}: {hits}")
            return False
        p = hits[0]
        value = np.asarray(value, dtype=np.float32)
        if value.shape != tuple(out[p].shape):
            raise ValueError(
                f"{p}: shape {value.shape} != expected {tuple(out[p].shape)}"
            )
        out[p] = value
        filled.add(p)
        return True

    def dense(torch_prefix: str, flax_mod: str):
        w, b = take(f"{torch_prefix}.weight"), take(f"{torch_prefix}.bias")
        if w is not None:
            put_suffix(f"{flax_mod}/kernel", _dense_w(w))
        if b is not None:
            put_suffix(f"{flax_mod}/bias", b)

    def norm(torch_prefix: str, flax_mod: str):
        w, b = take(f"{torch_prefix}.weight"), take(f"{torch_prefix}.bias")
        if w is not None:
            put_suffix(f"{flax_mod}/scale", w)
        if b is not None:
            put_suffix(f"{flax_mod}/bias", b)

    def mha(torch_prefix: str, flax_mod: str):
        w = take(f"{torch_prefix}.in_proj_weight")
        b = take(f"{torch_prefix}.in_proj_bias")
        ow = take(f"{torch_prefix}.out_proj.weight")
        ob = take(f"{torch_prefix}.out_proj.bias")
        if w is None:
            return
        d = w.shape[1]
        hd = d // n_heads
        for i, name in enumerate(("query", "key", "value")):
            wi = w[i * d : (i + 1) * d]  # (d_out, d_in)
            put_suffix(
                f"{flax_mod}/{name}/kernel",
                np.ascontiguousarray(wi.T).reshape(d, n_heads, hd),
            )
            if b is not None:
                put_suffix(
                    f"{flax_mod}/{name}/bias",
                    b[i * d : (i + 1) * d].reshape(n_heads, hd),
                )
        if ow is not None:
            put_suffix(
                f"{flax_mod}/out/kernel",
                np.ascontiguousarray(ow.T).reshape(n_heads, hd, d),
            )
        if ob is not None:
            put_suffix(f"{flax_mod}/out/bias", ob)

    # ----- encoder -----
    dense("encoder.pose_embedding", "pose_embedding")
    enc_layers = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"encoder\.transformer_encoder\.layers\.(\d+)\.", k))
        }
    )
    for i in enc_layers:
        t = f"encoder.transformer_encoder.layers.{i}"
        f = f"EncoderLayer_{i}"
        mha(f"{t}.self_attn", f"{f}/MultiHeadDotProductAttention_0")
        dense(f"{t}.linear1", f"{f}/Dense_0")
        dense(f"{t}.linear2", f"{f}/Dense_1")
        norm(f"{t}.norm1", f"{f}/LayerNorm_0")
        norm(f"{t}.norm2", f"{f}/LayerNorm_1")
    dense("encoder.fc_mu", "fc_mu")
    dense("encoder.fc_sigma.0", "fc_sigma")

    # ----- decoder -----
    dec_layers = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"decoder\.transformer_decoder\.layers\.(\d+)\.", k))
        }
    )
    for i in dec_layers:
        t = f"decoder.transformer_decoder.layers.{i}"
        f = f"DecoderLayer_{i}"
        mha(f"{t}.self_attn", f"{f}/MultiHeadDotProductAttention_0")
        mha(f"{t}.multihead_attn", f"{f}/MultiHeadDotProductAttention_1")
        dense(f"{t}.linear1", f"{f}/Dense_0")
        dense(f"{t}.linear2", f"{f}/Dense_1")
        norm(f"{t}.norm1", f"{f}/LayerNorm_0")
        norm(f"{t}.norm2", f"{f}/LayerNorm_1")
        norm(f"{t}.norm3", f"{f}/LayerNorm_2")
    dense("decoder.fc_out", "fc_out")

    unmapped = sorted(set(sd) - used)
    unfilled = sorted(p for p in out if p not in filled and p.startswith("params/"))
    return flax.traverse_util.unflatten_dict(out, sep="/"), unmapped, unfilled


def import_torch_weights(path, variables: Dict, verbose: bool = True) -> Dict:
    """One-call import: load ``path`` and return the updated variables tree
    (strict=False: mismatches reported on stdout, never fatal). Dispatches
    on the checkpoint's own keys: a reference TransformerVAE state_dict
    (transformer.py:29-167) carries ``encoder.pose_embedding.*``."""
    sd = load_torch_state_dict(path)
    if any(k.startswith("encoder.pose_embedding.") for k in sd):
        new_vars, unmapped, unfilled = convert_transformer_state_dict(sd, variables)
    else:
        new_vars, unmapped, unfilled = convert_resvae_state_dict(sd, variables)
    if verbose and unmapped:
        print(f"torch_import: {len(unmapped)} reference keys not mapped: "
              f"{unmapped[:8]}{'...' if len(unmapped) > 8 else ''}")
    if verbose and unfilled:
        print(f"torch_import: {len(unfilled)} flax leaves left at init: "
              f"{unfilled[:8]}{'...' if len(unfilled) > 8 else ''}")
    return new_vars
