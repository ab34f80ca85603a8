"""jaxpr -> ONNX lowering.

Traces a jittable function with ``jax.make_jaxpr`` and walks the jaxpr,
mapping each primitive onto ONNX ops (opset 17). Model parameters should be
closed over by the function (``lambda x: model.apply(params, x)``) so they
surface as jaxpr consts and become graph initializers; the traced arguments
become graph inputs.

Design notes (vs the reference's torch.onnx path,
deployment/exporters/acoustic_exporter.py:104-113):
- `lax.scan` lowers to an ONNX ``Loop`` whose body is a subgraph gathering
  its per-iteration slice from the stacked xs via outer-scope capture — the
  same shape the reference's exported sampler loops take.
- RNG primitives are intentionally NOT lowered: export functions must take
  noise tensors as explicit inputs (or the exporter prepends
  ``RandomNormalLike`` nodes for signature parity, see onnx_export.py).
- convs are emitted in ONNX NCW layout with Transposes at the boundaries;
  constant kernels are pre-transposed into initializers.

Validation: tests drive every emitted model through the numpy interpreter
(interpreter.py) against the original JAX outputs (onnx/onnxruntime are not
installed here).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import numpy as np
from jax import core as jcore

from .builder import GraphBuilder, NP_TO_DT

try:  # jax moved Literal around across versions
    from jax._src.core import Literal
except ImportError:  # pragma: no cover
    from jax.core import Literal


class LoweringError(NotImplementedError):
    pass


class Ctx:
    """Per-graph lowering context: jaxpr Var -> ONNX tensor name."""

    def __init__(self, gb: GraphBuilder, parent: Optional["Ctx"] = None):
        self.gb = gb
        self.env: Dict[Any, str] = {}
        self.parent = parent

    def lookup(self, v) -> Optional[str]:
        if v in self.env:
            return self.env[v]
        if self.parent is not None:
            return self.parent.lookup(v)
        return None

    def read(self, atom) -> str:
        if isinstance(atom, Literal):
            val = np.asarray(atom.val)
            return self.gb.constant(val, "lit")
        name = self.lookup(atom)
        if name is None:  # pragma: no cover
            raise LoweringError(f"unbound var {atom}")
        return name

    def write(self, var, name: str):
        self.env[var] = name


HANDLERS: Dict[str, Callable] = {}


def register(*names):
    def deco(fn):
        for n in names:
            HANDLERS[n] = fn
        return fn
    return deco


def _shape_const(gb, shape) -> str:
    return gb.constant(np.asarray(shape, np.int64), "shape")


def _i64(gb, values, hint="ints") -> str:
    return gb.constant(np.asarray(values, np.int64), hint)


# ------------------------------------------------------------- elementwise

_SIMPLE = {
    "add": "Add", "sub": "Sub", "mul": "Mul", "div": "Div",
    "max": "Max", "min": "Min", "pow": "Pow",
    "neg": "Neg", "sign": "Sign", "abs": "Abs", "floor": "Floor",
    "ceil": "Ceil", "round": "Round", "exp": "Exp", "log": "Log",
    "tanh": "Tanh", "sin": "Sin", "cos": "Cos", "sqrt": "Sqrt",
    "logistic": "Sigmoid", "erf": "Erf",
    "not": "Not", "and": "And", "or": "Or", "xor": "Xor",
}


@register(*_SIMPLE)
def _simple(ctx, eqn, ins):
    op = _SIMPLE[eqn.primitive.name]
    return ctx.gb.add_node(op, ins)


@register("atan2")
def _atan2(ctx, eqn, ins):
    """atan2(y, x) = atan(y/x), shifted by ±pi in the x<0 half-plane.

    x==0 resolves through IEEE semantics: y/0 = ±inf, Atan(±inf) = ±pi/2.
    """
    y, x = ins
    dt = np.dtype(eqn.invars[0].aval.dtype)
    t = ctx.gb.add_node("Atan", ctx.gb.add_node("Div", [y, x]))[0]
    zero = ctx.gb.constant(np.asarray(0, dt))
    pi = ctx.gb.constant(np.asarray(np.pi, dt))
    neg_pi = ctx.gb.constant(np.asarray(-np.pi, dt))
    x_neg = ctx.gb.add_node("Less", [x, zero])[0]
    y_nonneg = ctx.gb.add_node("GreaterOrEqual", [y, zero])[0]
    shift = ctx.gb.add_node("Where", [y_nonneg, pi, neg_pi])[0]
    shifted = ctx.gb.add_node("Add", [t, shift])[0]
    return ctx.gb.add_node("Where", [x_neg, shifted, t])


@register("erfc")
def _erfc(ctx, eqn, ins):
    one = ctx.gb.constant(np.asarray(1, eqn.invars[0].aval.dtype))
    return ctx.gb.add_node("Sub", [one, ctx.gb.add_node("Erf", ins)[0]])


@register("rsqrt")
def _rsqrt(ctx, eqn, ins):
    s = ctx.gb.add_node("Sqrt", ins)
    return ctx.gb.add_node("Reciprocal", s)


@register("log1p")
def _log1p(ctx, eqn, ins):
    one = ctx.gb.constant(np.asarray(1, eqn.invars[0].aval.dtype))
    return ctx.gb.add_node("Log", ctx.gb.add_node("Add", [ins[0], one]))


@register("expm1")
def _expm1(ctx, eqn, ins):
    one = ctx.gb.constant(np.asarray(1, eqn.invars[0].aval.dtype))
    return ctx.gb.add_node("Sub", ctx.gb.add_node("Exp", ins) + [one])


@register("square")
def _square(ctx, eqn, ins):
    return ctx.gb.add_node("Mul", [ins[0], ins[0]])


@register("integer_pow")
def _integer_pow(ctx, eqn, ins):
    y = eqn.params["y"]
    if y == 2:
        return ctx.gb.add_node("Mul", [ins[0], ins[0]])
    if y == -1:
        return ctx.gb.add_node("Reciprocal", ins)
    p = ctx.gb.constant(np.asarray(y, eqn.invars[0].aval.dtype))
    return ctx.gb.add_node("Pow", [ins[0], p])


@register("rem")
def _rem(ctx, eqn, ins):
    # lax.rem is the truncated remainder for ints and floats alike -> fmod=1
    return ctx.gb.add_node("Mod", ins, fmod=1)


@register("clamp")
def _clamp(ctx, eqn, ins):
    lo, x, hi = ins
    return ctx.gb.add_node("Clip", [x, lo, hi])


@register("select_n")
def _select_n(ctx, eqn, ins):
    pred_aval = eqn.invars[0].aval
    if len(ins) == 3 and pred_aval.dtype == np.bool_:
        # select_n(p, on_false, on_true) -> Where(p, on_true, on_false)
        return ctx.gb.add_node("Where", [ins[0], ins[2], ins[1]])
    raise LoweringError(f"select_n with {len(ins) - 1} cases / {pred_aval.dtype}")


_CMP = {"eq": "Equal", "ne": "Equal", "lt": "Less", "le": "LessOrEqual",
        "gt": "Greater", "ge": "GreaterOrEqual",
        # total-order comparisons (jnp.searchsorted internals): identical to
        # the partial-order ops for NaN-free integer/sorted inputs, which is
        # the only way they appear in these graphs (duration cumsums)
        "eq_to": "Equal", "lt_to": "Less", "le_to": "LessOrEqual",
        "gt_to": "Greater", "ge_to": "GreaterOrEqual"}


@register(*_CMP)
def _cmp(ctx, eqn, ins):
    name = eqn.primitive.name
    out = ctx.gb.add_node(_CMP[name], ins)
    if name == "ne":
        out = ctx.gb.add_node("Not", out)
    return out


@register("convert_element_type")
def _convert(ctx, eqn, ins):
    to = NP_TO_DT[np.dtype(eqn.params["new_dtype"])]
    return ctx.gb.add_node("Cast", ins, to=to)


@register("stop_gradient", "copy")
def _identity(ctx, eqn, ins):
    return ctx.gb.add_node("Identity", ins)


# ------------------------------------------------------------- shape ops

@register("reshape")
def _reshape(ctx, eqn, ins):
    x = ins[0]
    if eqn.params.get("dimensions") is not None:
        x = ctx.gb.add_node("Transpose", [x], perm=list(eqn.params["dimensions"]))[0]
    return ctx.gb.add_node("Reshape", [x, _shape_const(ctx.gb, eqn.params["new_sizes"])])


@register("squeeze")
def _squeeze(ctx, eqn, ins):
    return ctx.gb.add_node("Reshape", [ins[0], _shape_const(ctx.gb, eqn.outvars[0].aval.shape)])


@register("expand_dims")
def _expand_dims(ctx, eqn, ins):
    return ctx.gb.add_node("Reshape", [ins[0], _shape_const(ctx.gb, eqn.outvars[0].aval.shape)])


@register("transpose")
def _transpose(ctx, eqn, ins):
    return ctx.gb.add_node("Transpose", ins, perm=list(eqn.params["permutation"]))


@register("broadcast_in_dim")
def _broadcast(ctx, eqn, ins):
    shape = eqn.params["shape"]
    bdims = eqn.params["broadcast_dimensions"]
    in_shape = eqn.invars[0].aval.shape
    # step 1: reshape to rank(out) with 1s everywhere except bdims
    mid = [1] * len(shape)
    for i, d in enumerate(bdims):
        mid[d] = in_shape[i]
    x = ins[0]
    if tuple(mid) != tuple(in_shape):
        x = ctx.gb.add_node("Reshape", [x, _shape_const(ctx.gb, mid)])[0]
    if tuple(mid) != tuple(shape):
        x = ctx.gb.add_node("Expand", [x, _shape_const(ctx.gb, shape)])[0]
    else:
        x = ctx.gb.add_node("Identity", [x])[0]
    return [x]


@register("split")
def _split(ctx, eqn, ins):
    sizes = list(eqn.params["sizes"])
    return ctx.gb.add_node("Split", [ins[0], _i64(ctx.gb, sizes)],
                           n_out=len(sizes), axis=int(eqn.params["axis"]))


@register("concatenate")
def _concat(ctx, eqn, ins):
    return ctx.gb.add_node("Concat", ins, axis=int(eqn.params["dimension"]))


@register("slice")
def _slice(ctx, eqn, ins):
    p = eqn.params
    starts = list(p["start_indices"])
    ends = list(p["limit_indices"])
    steps = list(p["strides"] or [1] * len(starts))
    axes = list(range(len(starts)))
    return ctx.gb.add_node("Slice", [
        ins[0], _i64(ctx.gb, starts), _i64(ctx.gb, ends),
        _i64(ctx.gb, axes), _i64(ctx.gb, steps),
    ])


@register("rev")
def _rev(ctx, eqn, ins):
    dims = list(eqn.params["dimensions"])
    shape = eqn.invars[0].aval.shape
    starts = [shape[d] - 1 for d in dims]
    ends = [-(shape[d] + 1) for d in dims]
    steps = [-1] * len(dims)
    return ctx.gb.add_node("Slice", [
        ins[0], _i64(ctx.gb, starts), _i64(ctx.gb, ends),
        _i64(ctx.gb, dims), _i64(ctx.gb, steps),
    ])


@register("pad")
def _pad(ctx, eqn, ins):
    cfg = eqn.params["padding_config"]
    if any(i != 0 for _, _, i in cfg):
        raise LoweringError("interior pad")
    if any(lo < 0 or hi < 0 for lo, hi, _ in cfg):
        # negative pad = slice
        shape = eqn.invars[0].aval.shape
        starts = [max(0, -lo) for lo, _, _ in cfg]
        ends = [shape[d] + min(0, cfg[d][1]) for d in range(len(cfg))]
        x = ctx.gb.add_node("Slice", [
            ins[0], _i64(ctx.gb, starts), _i64(ctx.gb, ends),
            _i64(ctx.gb, list(range(len(cfg)))), _i64(ctx.gb, [1] * len(cfg)),
        ])[0]
        cfg = [(max(0, lo), max(0, hi), 0) for lo, hi, _ in cfg]
        ins = [x, ins[1]]
    pads = [lo for lo, _, _ in cfg] + [hi for _, hi, _ in cfg]
    return ctx.gb.add_node("Pad", [ins[0], _i64(ctx.gb, pads), ins[1]], mode="constant")


@register("iota")
def _iota(ctx, eqn, ins):
    p = eqn.params
    dim = p["dimension"]
    shape = p["shape"]
    dtype = np.dtype(p["dtype"])
    n = shape[dim]
    # Range is host-computable here: shapes are static
    arr = np.arange(n, dtype=dtype if dtype != np.bool_ else np.int64)
    mid = [1] * len(shape)
    mid[dim] = n
    arr = arr.reshape(mid)
    c = ctx.gb.constant(arr, "iota")
    if tuple(mid) == tuple(shape):
        return [c]
    return ctx.gb.add_node("Expand", [c, _shape_const(ctx.gb, shape)])


# ------------------------------------------------------------- reductions

_REDUCE = {"reduce_sum": "ReduceSum", "reduce_max": "ReduceMax",
           "reduce_min": "ReduceMin", "reduce_prod": "ReduceProd"}


def _reduce_node(gb, op: str, x, axes):
    """Emit a reduction valid at opset 17: only ReduceSum takes `axes` as an
    input (since opset 13); ReduceMax/Min/Prod take the `axes` ATTRIBUTE
    until opset 18."""
    if op == "ReduceSum":
        return gb.add_node(op, [x, _i64(gb, list(axes))], keepdims=0)
    return gb.add_node(op, [x], axes=[int(a) for a in axes], keepdims=0)


@register(*_REDUCE)
def _reduce(ctx, eqn, ins):
    axes = list(eqn.params["axes"])
    return _reduce_node(ctx.gb, _REDUCE[eqn.primitive.name], ins[0], axes)


@register("reduce_and", "reduce_or")
def _reduce_bool(ctx, eqn, ins):
    axes = list(eqn.params["axes"])
    x = ctx.gb.add_node("Cast", ins, to=NP_TO_DT[np.dtype(np.int64)])[0]
    op = "ReduceMin" if eqn.primitive.name == "reduce_and" else "ReduceMax"
    r = _reduce_node(ctx.gb, op, x, axes)
    return ctx.gb.add_node("Cast", r, to=NP_TO_DT[np.dtype(np.bool_)])


@register("argmax", "argmin")
def _argminmax(ctx, eqn, ins):
    op = "ArgMax" if eqn.primitive.name == "argmax" else "ArgMin"
    axes = eqn.params["axes"]
    out = ctx.gb.add_node(op, ins, axis=int(axes[0]), keepdims=0)
    want = NP_TO_DT[np.dtype(eqn.params["index_dtype"])]
    if want != NP_TO_DT[np.dtype(np.int64)]:
        out = ctx.gb.add_node("Cast", out, to=want)
    return out


@register("cumsum")
def _cumsum(ctx, eqn, ins):
    axis = ctx.gb.constant(np.asarray(eqn.params["axis"], np.int64))
    return ctx.gb.add_node("CumSum", [ins[0], axis],
                           reverse=1 if eqn.params.get("reverse") else 0)


@register("cumlogsumexp", "cummax", "cumprod")
def _cum_other(ctx, eqn, ins):  # pragma: no cover
    raise LoweringError(eqn.primitive.name)


# ------------------------------------------------------------- linear algebra

@register("dot_general")
def _dot_general(ctx, eqn, ins):
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    l_free = [d for d in range(lhs.ndim) if d not in lc and d not in lb]
    r_free = [d for d in range(rhs.ndim) if d not in rc and d not in rb]

    def to3d(name, aval, batch, free, contract, contract_last):
        perm = list(batch) + (list(free) + list(contract) if contract_last
                              else list(contract) + list(free))
        x = name
        if perm != list(range(aval.ndim)):
            x = ctx.gb.add_node("Transpose", [x], perm=perm)[0]
        b = int(np.prod([aval.shape[d] for d in batch])) if batch else 1
        f = int(np.prod([aval.shape[d] for d in free])) if free else 1
        c = int(np.prod([aval.shape[d] for d in contract])) if contract else 1
        shape = (b, f, c) if contract_last else (b, c, f)
        return ctx.gb.add_node("Reshape", [x, _shape_const(ctx.gb, shape)])[0]

    a = to3d(ins[0], lhs, lb, l_free, lc, True)
    b = to3d(ins[1], rhs, rb, r_free, rc, False)
    mm = ctx.gb.add_node("MatMul", [a, b])[0]
    out_shape = eqn.outvars[0].aval.shape
    return ctx.gb.add_node("Reshape", [mm, _shape_const(ctx.gb, out_shape)])


@register("conv_general_dilated")
def _conv(ctx, eqn, ins):
    p = eqn.params
    dn = p["dimension_numbers"]
    lhs_aval, rhs_aval = eqn.invars[0].aval, eqn.invars[1].aval
    n_spatial = lhs_aval.ndim - 2
    lhs_spec, rhs_spec, out_spec = dn.lhs_spec, dn.rhs_spec, dn.out_spec

    # transpose input to NC + spatial
    lperm = [lhs_spec[0], lhs_spec[1]] + list(lhs_spec[2:])
    x = ins[0]
    if lperm != list(range(lhs_aval.ndim)):
        x = ctx.gb.add_node("Transpose", [x], perm=lperm)[0]
    # kernel to OI + spatial
    kperm = [rhs_spec[0], rhs_spec[1]] + list(rhs_spec[2:])
    w = ins[1]
    if kperm != list(range(rhs_aval.ndim)):
        w = ctx.gb.add_node("Transpose", [w], perm=kperm)[0]

    strides = list(p["window_strides"])
    padding = list(p["padding"])
    lhs_dil = list(p["lhs_dilation"])
    rhs_dil = list(p["rhs_dilation"])
    groups = int(p["feature_group_count"])
    k_spatial = [rhs_aval.shape[d] for d in rhs_spec[2:]]

    if all(d == 1 for d in lhs_dil):
        pads = [lo for lo, _ in padding] + [hi for _, hi in padding]
        y = ctx.gb.add_node(
            "Conv", [x, w], strides=strides, pads=pads,
            dilations=rhs_dil, group=groups,
        )[0]
    elif all(s == 1 for s in strides):
        # fractionally-strided conv == ConvTranspose:
        #   conv(x, W, lhs_dilation=s, pad=(a_lo, a_hi))
        #   == ConvTranspose(x, W', strides=s, pads=(ke-1-a_lo, ke-1-a_hi))
        #   with W'[I, O, ...] = transpose_io(flip_spatial(W)), ke = dilated k
        ke = [(k - 1) * d + 1 for k, d in zip(k_spatial, rhs_dil)]
        p_lo = [k - 1 - lo for k, (lo, _) in zip(ke, padding)]
        p_hi = [k - 1 - hi for k, (_, hi) in zip(ke, padding)]
        if any(v < 0 for v in p_lo + p_hi):
            raise LoweringError("conv_transpose with over-padding")
        # flip spatial dims then swap O<->I
        spatial_axes = list(range(2, 2 + n_spatial))
        starts = [rhs_aval.shape[rhs_spec[2 + i]] - 1 for i in range(n_spatial)]
        ends = [-(rhs_aval.shape[rhs_spec[2 + i]] + 1) for i in range(n_spatial)]
        w = ctx.gb.add_node("Slice", [
            w, _i64(ctx.gb, starts), _i64(ctx.gb, ends),
            _i64(ctx.gb, spatial_axes), _i64(ctx.gb, [-1] * n_spatial),
        ])[0]
        w = ctx.gb.add_node("Transpose", [w],
                            perm=[1, 0] + spatial_axes)[0]
        y = ctx.gb.add_node(
            "ConvTranspose", [x, w], strides=lhs_dil,
            pads=p_lo + p_hi, dilations=rhs_dil, group=groups,
        )[0]
    else:
        raise LoweringError("conv with both lhs_dilation and strides")

    # back to the jax output layout
    out_rank = 2 + n_spatial
    inv = [0] * out_rank
    operm = [out_spec[0], out_spec[1]] + list(out_spec[2:])
    for i, d in enumerate(operm):
        inv[d] = i
    if inv != list(range(out_rank)):
        y = ctx.gb.add_node("Transpose", [y], perm=inv)[0]
    else:
        y = ctx.gb.add_node("Identity", [y])[0]
    return [y]


# ------------------------------------------------------------- gather/scatter

@register("gather")
def _gather(ctx, eqn, ins):
    p = eqn.params
    dn = p["dimension_numbers"]
    operand = eqn.invars[0].aval
    indices = eqn.invars[1].aval
    slice_sizes = tuple(p["slice_sizes"])
    offset_dims = tuple(dn.offset_dims)
    collapsed = tuple(dn.collapsed_slice_dims)
    start_map = tuple(dn.start_index_map)
    batch_dims = tuple(getattr(dn, "operand_batching_dims", ()) or ())

    # pattern A: single-axis integer indexing (jnp.take / x[idx])
    if (len(start_map) == 1 and collapsed == (start_map[0],) and not batch_dims
            and indices.shape[-1] == 1
            and all(slice_sizes[d] == (1 if d == start_map[0] else operand.shape[d])
                    for d in range(operand.ndim))):
        axis = start_map[0]
        n_idx = indices.ndim - 1
        # jax output: batch dims (indices dims) occupy positions not in
        # offset_dims; standard jnp.take puts them at `axis`
        idx = ctx.gb.add_node(
            "Reshape", [ins[1], _shape_const(ctx.gb, indices.shape[:-1])])[0]
        out = ctx.gb.add_node("Gather", [ins[0], idx], axis=axis)[0]
        # np.take output = operand[:axis] + idx_shape + operand[axis+1:];
        # jax gather output order: non-offset (index) dims first? offset_dims
        # tells where the operand dims land; verify the take layout:
        expect_offsets = tuple(list(range(0, axis)) + list(
            range(axis + n_idx, operand.ndim - 1 + n_idx)))
        take_offsets = tuple(d + n_idx for d in range(operand.ndim) if d != axis)
        if offset_dims == expect_offsets:
            return [out]
        if offset_dims == take_offsets:
            # index dims lead: move them to the front
            rank = operand.ndim - 1 + n_idx
            perm = list(range(axis, axis + n_idx)) + [
                d for d in range(rank) if not (axis <= d < axis + n_idx)]
            return ctx.gb.add_node("Transpose", [out], perm=perm)
        raise LoweringError(f"gather offsets {offset_dims} for axis {axis}")

    # pattern B: batched per-row indexing -> GatherElements. JAX emits this
    # for take_along_axis / vmapped searchsorted: every operand dim except the
    # indexed one is an operand_batching_dim, slice sizes are all 1, and the
    # index array is [*operand_batch_dims_interleaved_with_index_dim, 1].
    if (len(start_map) == 1 and batch_dims and collapsed == ()
            and indices.shape[-1] == 1
            and len(batch_dims) == operand.ndim - 1
            and all(slice_sizes[d] == 1 for d in range(operand.ndim))):
        axis = int(start_map[0])
        s = tuple(indices.shape[:-1])
        if (len(s) == operand.ndim
                and all(s[d] == operand.shape[d] for d in batch_dims)):
            idx = ctx.gb.add_node(
                "Reshape", [ins[1], _shape_const(ctx.gb, s)])[0]
            out = ctx.gb.add_node("GatherElements", [ins[0], idx], axis=axis)[0]
            out_shape = tuple(eqn.outvars[0].aval.shape)
            return ctx.gb.add_node(
                "Reshape", [out, _shape_const(ctx.gb, out_shape)])

    raise LoweringError(f"gather {dn} sizes={slice_sizes}")


@register("dynamic_slice")
def _dynamic_slice(ctx, eqn, ins):
    sizes = list(eqn.params["slice_sizes"])
    x = ins[0]
    aval = eqn.invars[0].aval
    starts1d = []
    for s in ins[1:]:
        s64 = ctx.gb.add_node("Cast", [s], to=NP_TO_DT[np.dtype(np.int64)])[0]
        starts1d.append(ctx.gb.add_node(
            "Reshape", [s64, _shape_const(ctx.gb, (1,))])[0])
    starts = ctx.gb.add_node("Concat", starts1d, axis=0)[0]
    # jax clamps starts to [0, dim - size]
    hi = _i64(ctx.gb, [d - s for d, s in zip(aval.shape, sizes)], "dsmax")
    lo = _i64(ctx.gb, [0] * len(sizes), "dsmin")
    starts = ctx.gb.add_node("Clip", [starts, lo, hi])[0]
    ends = ctx.gb.add_node("Add", [starts, _i64(ctx.gb, sizes)])[0]
    axes = _i64(ctx.gb, list(range(len(sizes))))
    return ctx.gb.add_node("Slice", [x, starts, ends, axes])


@register("dynamic_update_slice")
def _dynamic_update_slice(ctx, eqn, ins):  # pragma: no cover
    raise LoweringError("dynamic_update_slice")


@register("scatter-add", "scatter_add")
def _scatter_add(ctx, eqn, ins):
    p = eqn.params
    dn = p["dimension_numbers"]
    operand = eqn.invars[0].aval
    indices = eqn.invars[1].aval
    updates = eqn.invars[2].aval
    # ScatterND-compatible pattern: indices [..., k] scattering into the k
    # leading operand dims, updates carrying the trailing window dims whole
    # (covers mel2ph_to_dur segment sums and batched .at[b, t].add())
    k = indices.shape[-1]
    if (tuple(dn.scatter_dims_to_operand_dims) == tuple(range(k))
            and tuple(dn.inserted_window_dims) == tuple(range(k))
            and not getattr(dn, "operand_batching_dims", ())):
        n = int(np.prod(indices.shape[:-1])) if indices.ndim > 1 else 1
        idx = ctx.gb.add_node("Reshape", [ins[1], _shape_const(ctx.gb, (n, k))])[0]
        upd_shape = (n,) + tuple(operand.shape[k:])
        upd = ctx.gb.add_node("Reshape", [ins[2], _shape_const(ctx.gb, upd_shape)])[0]
        idx = ctx.gb.add_node("Cast", [idx], to=NP_TO_DT[np.dtype(np.int64)])[0]
        return ctx.gb.add_node("ScatterND", [ins[0], idx, upd], reduction="add")
    raise LoweringError(f"scatter-add {dn}")


# ------------------------------------------------------------- control flow

@register("scan")
def _scan(ctx, eqn, ins):
    p = eqn.params
    n_consts, n_carry = p["num_consts"], p["num_carry"]
    length = p["length"]
    if p.get("reverse"):
        raise LoweringError("reverse scan")
    closed = p["jaxpr"]  # ClosedJaxpr of the body
    consts = ins[:n_consts]
    carry = ins[n_consts: n_consts + n_carry]
    xs = ins[n_consts + n_carry:]
    gb = ctx.gb

    body_name = gb.fresh("scan_body")
    body = GraphBuilder(body_name, prefix=body_name + "/")
    bctx = Ctx(body, parent=ctx)
    it_name = body.fresh("iter")
    cond_in = body.fresh("cond_in")
    body.add_input(it_name, np.int64, ())
    body.add_input(cond_in, np.bool_, ())

    jaxpr = closed.jaxpr
    # consts of the closed jaxpr -> initializers in the body graph
    for cv, cval in zip(jaxpr.constvars, closed.consts):
        bctx.write(cv, body.constant(np.asarray(cval), "scanc"))
    # bind eqn const operands (captured from outer scope by name)
    for v, name in zip(jaxpr.invars[:n_consts], consts):
        bctx.write(v, name)
    # carry inputs
    for i, v in enumerate(jaxpr.invars[n_consts: n_consts + n_carry]):
        cname = body.fresh("carry_in")
        body.add_input(cname, v.aval.dtype, v.aval.shape)
        bctx.write(v, cname)
    # xs slices: Gather(xs, iter) along axis 0 (outer-scope capture)
    for v, xs_name in zip(jaxpr.invars[n_consts + n_carry:], xs):
        g = body.add_node("Gather", [xs_name, it_name], axis=0)[0]
        bctx.write(v, g)

    lower_eqns(bctx, jaxpr.eqns)

    cond_out = body.add_node("Identity", [cond_in], outputs=[body.fresh("cond_out")])[0]
    body.outputs = []
    body.add_output(cond_out, np.bool_, ())
    for i, v in enumerate(jaxpr.outvars[:n_carry]):
        body.add_output(bctx.read(v), v.aval.dtype, v.aval.shape)
    for v in jaxpr.outvars[n_carry:]:
        body.add_output(bctx.read(v), v.aval.dtype, v.aval.shape)

    trip = gb.constant(np.asarray(length, np.int64), "trip")
    cond = gb.constant(np.asarray(True), "loopcond")
    n_out = len(jaxpr.outvars)
    outs = gb.add_node("Loop", [trip, cond] + list(carry),
                       n_out=n_out, body=body)
    return outs


@register("while")
def _while(ctx, eqn, ins):
    p = eqn.params
    cond_jaxpr, body_jaxpr = p["cond_jaxpr"], p["body_jaxpr"]
    cn, bn = p["cond_nconsts"], p["body_nconsts"]
    cconsts = ins[:cn]
    bconsts = ins[cn: cn + bn]
    carry = ins[cn + bn:]
    gb = ctx.gb

    def emit_cond(bctx, carry_names):
        jaxpr = cond_jaxpr.jaxpr
        for cv, cval in zip(jaxpr.constvars, cond_jaxpr.consts):
            bctx.write(cv, bctx.gb.constant(np.asarray(cval), "whc"))
        for v, n in zip(jaxpr.invars[:cn], cconsts):
            bctx.write(v, n)
        for v, n in zip(jaxpr.invars[cn:], carry_names):
            bctx.write(v, n)
        lower_eqns(bctx, jaxpr.eqns)
        return bctx.read(jaxpr.outvars[0])

    body_name = gb.fresh("while_body")
    body = GraphBuilder(body_name, prefix=body_name + "/")
    bctx = Ctx(body, parent=ctx)
    it = body.fresh("iter")
    cin = body.fresh("cond_in")
    body.add_input(it, np.int64, ())
    body.add_input(cin, np.bool_, ())
    carry_names = []
    jaxpr = body_jaxpr.jaxpr
    for v in jaxpr.invars[bn:]:
        n = body.fresh("carry_in")
        body.add_input(n, v.aval.dtype, v.aval.shape)
        carry_names.append(n)
    for cv, cval in zip(jaxpr.constvars, body_jaxpr.consts):
        bctx.write(cv, body.constant(np.asarray(cval), "whb"))
    for v, n in zip(jaxpr.invars[:bn], bconsts):
        bctx.write(v, n)
    for v, n in zip(jaxpr.invars[bn:], carry_names):
        bctx.write(v, n)
    lower_eqns(bctx, jaxpr.eqns)
    new_carry = [bctx.read(v) for v in jaxpr.outvars]
    cond_next = emit_cond(Ctx(body, parent=bctx), new_carry)
    body.outputs = []
    body.add_output(cond_next, np.bool_, ())
    for v, n in zip(jaxpr.outvars, new_carry):
        body.add_output(n, v.aval.dtype, v.aval.shape)

    # initial condition evaluated in the outer graph
    outer_cond = emit_cond(Ctx(gb, parent=ctx), list(carry))
    outs = gb.add_node("Loop", ["", outer_cond] + list(carry),
                       n_out=len(carry), body=body)
    return outs


@register("cond")
def _cond(ctx, eqn, ins):
    branches = eqn.params["branches"]
    if len(branches) != 2:
        raise LoweringError(f"cond with {len(branches)} branches")
    pred = ins[0]
    operands = ins[1:]
    gb = ctx.gb
    pred_dtype = eqn.invars[0].aval.dtype
    if pred_dtype != np.bool_:
        pred = gb.add_node("Cast", [pred], to=NP_TO_DT[np.dtype(np.bool_)])[0]

    def make_branch(closed, tag):
        sub_name = gb.fresh(f"{tag}_branch")
        sub = GraphBuilder(sub_name, prefix=sub_name + "/")
        sctx = Ctx(sub, parent=ctx)
        jaxpr = closed.jaxpr
        for cv, cval in zip(jaxpr.constvars, closed.consts):
            sctx.write(cv, sub.constant(np.asarray(cval), "brc"))
        for v, n in zip(jaxpr.invars, operands):
            sctx.write(v, n)  # outer-scope capture
        lower_eqns(sctx, jaxpr.eqns)
        for v in jaxpr.outvars:
            out = sub.add_node("Identity", [sctx.read(v)])[0]
            sub.add_output(out, v.aval.dtype, v.aval.shape)
        return sub

    else_b = make_branch(branches[0], "else")
    then_b = make_branch(branches[1], "then")
    n_out = len(eqn.outvars)
    return gb.add_node("If", [pred], n_out=n_out,
                       then_branch=then_b, else_branch=else_b)


@register("pjit", "jit", "closed_call", "remat", "checkpoint", "custom_jvp_call",
          "custom_vjp_call", "custom_vjp_call_jaxpr", "core_call", "xla_call")
def _inline_call(ctx, eqn, ins):
    p = eqn.params
    closed = p.get("jaxpr") or p.get("call_jaxpr")
    if closed is None:  # pragma: no cover
        raise LoweringError(f"call without jaxpr: {eqn.primitive.name}")
    if hasattr(closed, "jaxpr"):
        jaxpr, consts = closed.jaxpr, closed.consts
    else:
        jaxpr, consts = closed, ()
    sub = Ctx(ctx.gb, parent=ctx)
    for cv, cval in zip(jaxpr.constvars, consts):
        sub.write(cv, ctx.gb.constant(np.asarray(cval), "callc"))
    for v, n in zip(jaxpr.invars, ins):
        sub.write(v, n)
    lower_eqns(sub, jaxpr.eqns)
    return [sub.read(v) for v in jaxpr.outvars]


# ------------------------------------------------------------- driver

def lower_eqns(ctx: Ctx, eqns):
    for eqn in eqns:
        handler = HANDLERS.get(eqn.primitive.name)
        if handler is None:
            raise LoweringError(
                f"no ONNX lowering for primitive '{eqn.primitive.name}' "
                f"(params: {list(eqn.params)})")
        ins = [ctx.read(a) for a in eqn.invars]
        outs = handler(ctx, eqn, ins)
        if len(outs) != len(eqn.outvars):  # pragma: no cover
            raise LoweringError(
                f"{eqn.primitive.name}: {len(outs)} outputs for {len(eqn.outvars)} vars")
        for v, n in zip(eqn.outvars, outs):
            if type(v).__name__ == "DropVar":
                continue
            ctx.write(v, n)


def lower(
    fn: Callable,
    example_args: Sequence[Any],
    *,
    name: str,
    input_names: Optional[Sequence[str]] = None,
    output_names: Optional[Sequence[str]] = None,
) -> GraphBuilder:
    """Trace `fn` at `example_args` and lower to an ONNX GraphBuilder.

    Model parameters must be closed over (they become initializers); the
    traced args become graph inputs named by `input_names`.
    """
    closed = jax.make_jaxpr(fn)(*example_args)
    jaxpr = closed.jaxpr
    consts = list(closed.consts)
    n_consts = len(jaxpr.constvars)
    # make_jaxpr does no DCE: unused RNG plumbing (split/wrap of an ignored
    # key) would otherwise force lowering of random primitives. Move consts
    # into invars first so DCE can't desynchronize the constvar<->const zip.
    from jax._src.interpreters.partial_eval import convert_constvars_jaxpr, dce_jaxpr

    jaxpr = convert_constvars_jaxpr(jaxpr)
    jaxpr, _ = dce_jaxpr(jaxpr, [True] * len(jaxpr.outvars), instantiate=True)
    const_vars = jaxpr.invars[:n_consts] if n_consts else jaxpr.constvars
    arg_vars = jaxpr.invars[n_consts:]
    if input_names is None:
        input_names = [f"input_{i}" for i in range(len(arg_vars))]
    if len(input_names) != len(arg_vars):
        raise ValueError(f"{len(arg_vars)} traced inputs, "
                         f"{len(input_names)} names given")

    gb = GraphBuilder(name)
    ctx = Ctx(gb)
    for cv, cval in zip(const_vars, consts):
        ctx.write(cv, gb.constant(np.asarray(cval), "param"))
    for v, iname in zip(arg_vars, input_names):
        gb.add_input(iname, v.aval.dtype, v.aval.shape)
        ctx.write(v, iname)
    lower_eqns(ctx, jaxpr.eqns)
    if output_names is None:
        output_names = [f"output_{i}" for i in range(len(jaxpr.outvars))]
    for v, oname in zip(jaxpr.outvars, output_names):
        out = gb.add_node("Identity", [ctx.read(v)], outputs=[oname])[0]
        gb.add_output(out, v.aval.dtype, v.aval.shape)
    return gb


# The complete set of opset-17 op types this emitter can produce — the
# audit surface documented per-op in docs/onnx_ops.md (a test asserts the
# doc and this set stay in sync, and the structural checker rejects any
# emission outside it). Derived from the handler tables above plus the
# literal emissions in the handlers, internalize_noise (builder.py), and
# the Identity output aliasing in lower().
EMITTED_OPS = frozenset(
    set(_SIMPLE.values()) | set(_CMP.values()) | set(_REDUCE.values()) | {
        # comparisons / logic helpers
        "Not",
        # elementwise compositions (_atan2, _rsqrt, _clamp, _rem, ...)
        "Atan", "Reciprocal", "Clip", "Mod", "Where",
        # dtype/shape plumbing
        "Cast", "Identity", "Reshape", "Transpose", "Expand", "Pad",
        "Slice", "Split", "Concat", "Gather", "GatherElements", "ScatterND",
        # reductions / scans
        "ArgMax", "ArgMin", "CumSum",
        # linear algebra / convolutions
        "MatMul", "Conv", "ConvTranspose",
        # control flow
        "Loop", "If",
        # in-graph noise source (GraphBuilder.internalize_noise)
        "ConstantOfShape", "RandomNormalLike",
    }
)


def export_onnx(fn, example_args, path, *, name="model",
                input_names=None, output_names=None) -> bytes:
    gb = lower(fn, example_args, name=name,
               input_names=input_names, output_names=output_names)
    data = gb.model_bytes()
    if path is not None:
        import pathlib

        pathlib.Path(path).write_bytes(data)
    return data
