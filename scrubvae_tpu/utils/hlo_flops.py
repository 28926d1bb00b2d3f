"""Static MXU-FLOP counting from optimized HLO text.

Two FLOP conventions exist for the same compiled program and differ by
~17% at the flagship operating point (VERDICT r3 W6):

- ``compiled.cost_analysis()["flops"]``: XLA's own model — counts what the
  emitted code executes, after algebraic simplification, rematerialization
  and fusion-level elision;
- the static HLO count here: 2*M*N*K per ``dot`` / ``convolution`` op read
  straight from the optimized module's shapes.

bench.py reports BOTH as pinned, named fields (``mfu_cost_analysis`` /
``mfu_static_hlo``) so round-over-round MFU deltas are never an artifact of
switching conventions. tools/hlo_opclass.py builds its per-op attribution on
the same parsers.

The reference has no counterpart (no benchmarks at all — SURVEY.md §6).
"""

from __future__ import annotations

import re

import numpy as np

__all__ = [
    "parse_shape",
    "shape_bytes",
    "build_symtab",
    "operand_shapes",
    "conv_flops",
    "dot_flops",
    "static_mxu_flops",
]

DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "f16": 2, "f64": 8, "s32": 4, "u32": 4,
    "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8, "s16": 2, "u16": 2,
    "c64": 8, "c128": 16,
}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
NAME_RE = re.compile(r"%([\w\.\-]+)")


def parse_shape(text):
    """First shape literal in ``text`` -> (dtype, dims tuple) or None."""
    m = SHAPE_RE.search(text)
    if not m:
        return None
    dtype = m.group(1)
    dims = tuple(int(d) for d in m.group(2).split(",") if d)
    return dtype, dims


def shape_bytes(shape):
    if shape is None:
        return 0
    dtype, dims = shape
    n = int(np.prod(dims)) if dims else 1
    return DTYPE_BYTES.get(dtype, 4) * n


def build_symtab(hlo_text):
    """name -> (dtype, dims) for every op definition line.

    Optimized HLO prints operands as bare names (no shapes), so FLOP
    counting needs the definition table."""
    tab = {}
    for line in hlo_text.splitlines():
        m = re.match(r"\s*(?:ROOT )?%([\w\.\-]+) = (\w+\[[\d,]*\])", line)
        if m:
            tab[m.group(1)] = parse_shape(m.group(2))
    return tab


def operand_shapes(line, symtab, opcode):
    """Shapes of the operands of the ``opcode(...)`` call on the line.

    Must anchor on the opcode: result layout annotations like
    ``{1,0:T(8,128)(2,1)}`` contain parentheses of their own."""
    m = re.search(re.escape(opcode) + r"\(([^)]*)\)", line)
    if not m:
        return []
    return [symtab.get(n) for n in NAME_RE.findall(m.group(1))]


def conv_flops(line, symtab):
    """2 * out_elems * (kernel_spatial x Cin) from an HLO convolution.

    rhs dims = spatial... x Cin x Cout in some dim_labels order; the
    contraction per output element is prod(rhs)/Cout. Cout is the rhs dim
    named 'o' in dim_labels (format lhs_rhs->out, rhs part like 'io' or
    '0io')."""
    out = parse_shape(line)
    ops = operand_shapes(line, symtab, "convolution")
    if out is None or len(ops) < 2 or ops[1] is None:
        return 0
    out_elems = int(np.prod(out[1])) if out[1] else 1
    rhs_dims = ops[1][1]
    if not rhs_dims:
        return 0
    m = re.search(r"dim_labels=[^,]*_([\w]+)->", line)
    rhs_total = int(np.prod(rhs_dims))
    if m and "o" in m.group(1) and len(m.group(1)) == len(rhs_dims):
        cout = rhs_dims[m.group(1).index("o")]
    else:
        cout = max(rhs_dims)
    k_cin = rhs_total // max(cout, 1)
    return 2 * out_elems * max(k_cin, 1)


def dot_flops(line, symtab):
    out = parse_shape(line)
    ops = operand_shapes(line, symtab, "dot")
    if out is None or not ops or ops[0] is None:
        return 0
    out_elems = int(np.prod(out[1])) if out[1] else 1
    lhs_dims = ops[0][1]
    m = re.search(r"lhs_contracting_dims=\{([\d,]*)\}", line)
    if m and lhs_dims:
        contract = int(
            np.prod([lhs_dims[int(i)] for i in m.group(1).split(",") if i])
        )
        return 2 * out_elems * contract
    return 2 * out_elems * (int(np.prod(lhs_dims)) if lhs_dims else 1)


OP_RE = re.compile(r"\s+(?:ROOT )?%?[\w\.\-]+ = \S+ ([\w\-]+)\(")


def static_mxu_flops(hlo_text: str) -> int:
    """Total 2*M*N*K FLOPs over every dot/convolution in the optimized
    module (the static-HLO MFU numerator)."""
    symtab = build_symtab(hlo_text)
    total = 0
    for line in hlo_text.splitlines():
        m = OP_RE.match(line)
        if not m:
            continue
        opcode = m.group(1)
        if opcode == "convolution":
            total += conv_flops(line, symtab)
        elif opcode == "dot":
            total += dot_flops(line, symtab)
    return total
