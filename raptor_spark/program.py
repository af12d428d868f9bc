"""Per-row handler → Catalyst Column compiler (P1/U1).

The reference accepts a Python handler per feature and PARSES it (its
RedBaron-based program parser, ``/root/reference/labsdk/raptor/
program.py:210-322``) so the per-row program can run outside Python.
This module is the Spark-first equivalent: the handler's AST compiles
to a ``pyspark.sql.Column`` expression tree — the "program" executes
inside Catalyst/whole-stage codegen, never row-at-a-time Python.

Supported handler subset (mirrors the reference's practical surface —
expressions over ``this_row``, conditionals, None returns):

- ``this_row['col']`` / ``this_row.col``       → F.col
- ``ctx.get_feature('name')``                  → F.col(name) + recorded
  dependency (U3 — drives the derived-feature DAG, replay.py:203-273)
- literals (num/str/bool/None), arithmetic (+ - * / % // **; % compiles
  to pmod — Python sign-of-divisor semantics for positive divisors),
  unary ±, comparisons (== != < <= > >=, chained), boolean and/or/not
  (LOGICAL only — Python's value-selecting ``x or default`` idiom is
  NOT preserved; write ``x if x is not None else default``),
  ternary ``a if c else b``
- ``if/elif/else`` statement trees ending in ``return``
- ``x in ('a', 'b')``                          → Column.isin
- ``x is None`` / ``x is not None``            → isNull/isNotNull
- builtins: len, abs, round (SQL half-up — Python's banker's rounding
  differs on exact .5 midpoints), min, max (2+ args), float, int, str
- str methods: lower, upper, strip, startswith, endswith, replace
- ``return None``                              → NULL (implicit
  None-filter downstream, replay.py:110-111)

The return annotation (``-> float`` etc.) casts the result column.
Unsupported constructs raise ``ProgramError`` at DEFINITION time (the
reference also fails at parse time, program.py:239-250) — the escape
hatch for genuinely imperative handlers is passing a Column-returning
callable or a pandas_udf as the feature expr (U2).
"""

from __future__ import annotations

import ast
import inspect
import textwrap
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ProgramError(ValueError):
    pass


_CASTS = {
    "float": "double",
    "int": "bigint",
    "str": "string",
    "bool": "boolean",
}

_BINOPS = {
    ast.Add: lambda a, b: a + b,
    ast.Sub: lambda a, b: a - b,
    ast.Mult: lambda a, b: a * b,
    ast.Div: lambda a, b: a / b,
    # Python % takes the DIVISOR's sign; SQL % takes the dividend's.
    # pmod matches Python for positive divisors (the practical case).
    ast.Mod: lambda a, b: F.pmod(a, b),
    ast.Pow: lambda a, b: a**b,
    ast.FloorDiv: lambda a, b: F.floor(a / b).cast("long"),
}

_CMPOPS = {
    ast.Eq: lambda a, b: a == b,
    ast.NotEq: lambda a, b: a != b,
    ast.Lt: lambda a, b: a < b,
    ast.LtE: lambda a, b: a <= b,
    ast.Gt: lambda a, b: a > b,
    ast.GtE: lambda a, b: a >= b,
}

_STR_METHODS = {
    "lower": lambda c: F.lower(c),
    "upper": lambda c: F.upper(c),
    "strip": lambda c: F.trim(c),
}


@dataclass
class CompiledProgram:
    """Result of compiling a handler: a DataFrame→Column builder plus
    the dependencies read via ctx.get_feature (U3). ``may_be_null``:
    the program has a ``return None`` / bare return / fall-off-the-end
    path — i.e. the expr ENCODES a filter, so plans must not assume the
    value is total (drives the fused plan's publish/fill decision)."""

    name: str
    builder: Callable[[DataFrame], Column]
    dependencies: tuple[str, ...] = ()
    cast_to: Optional[str] = None
    may_be_null: bool = False
    # source columns the handler reads (this_row[...] accesses)
    columns: tuple[str, ...] = ()
    # dedented handler source — the program's STABLE identity (repr of
    # the builder closure embeds a memory address, which would break
    # cross-process checkpoint hashing, backfill.plan_hash)
    source: str = ""

    def __call__(self, df: DataFrame) -> Column:
        col = self.builder(df)
        return col.cast(self.cast_to) if self.cast_to else col


@dataclass
class _Ctx:
    row_arg: str
    ctx_arg: Optional[str]
    deps: list[str] = field(default_factory=list)
    may_be_null: bool = False
    cols: list[str] = field(default_factory=list)


def _lit(v) -> Column:
    return F.lit(v)


def _compile_expr(node: ast.expr, c: _Ctx) -> Column:
    if isinstance(node, ast.Constant):
        if node.value is None:
            # a None anywhere in the value expression (e.g. the else
            # branch of a ternary) makes the program non-total
            c.may_be_null = True
            return F.lit(None)
        return _lit(node.value)
    if isinstance(node, ast.Subscript):  # this_row['col']
        if (
            isinstance(node.value, ast.Name)
            and node.value.id == c.row_arg
            and isinstance(node.slice, ast.Constant)
            and isinstance(node.slice.value, str)
        ):
            if node.slice.value not in c.cols:
                c.cols.append(node.slice.value)
            return F.col(node.slice.value)
        raise ProgramError(
            f"only {c.row_arg}['col'] subscripts are compilable "
            f"(line {node.lineno})"
        )
    if isinstance(node, ast.Attribute):  # this_row.col
        if isinstance(node.value, ast.Name) and node.value.id == c.row_arg:
            if node.attr not in c.cols:
                c.cols.append(node.attr)
            return F.col(node.attr)
        raise ProgramError(f"unsupported attribute access (line {node.lineno})")
    if isinstance(node, ast.BinOp):
        op = _BINOPS.get(type(node.op))
        if op is None:
            raise ProgramError(f"unsupported operator (line {node.lineno})")
        return op(_compile_expr(node.left, c), _compile_expr(node.right, c))
    if isinstance(node, ast.UnaryOp):
        v = _compile_expr(node.operand, c)
        if isinstance(node.op, ast.USub):
            return -v
        if isinstance(node.op, ast.UAdd):
            return v
        if isinstance(node.op, ast.Not):
            return ~v
        raise ProgramError(f"unsupported unary op (line {node.lineno})")
    if isinstance(node, ast.Compare):
        left = node.left
        out: Optional[Column] = None
        for op, right in zip(node.ops, node.comparators):
            if isinstance(op, (ast.Is, ast.IsNot)):
                if not (isinstance(right, ast.Constant) and right.value is None):
                    raise ProgramError(
                        f"'is' only supported against None (line {node.lineno})"
                    )
                lc = _compile_expr(left, c)
                part = lc.isNull() if isinstance(op, ast.Is) else lc.isNotNull()
            elif isinstance(op, (ast.In, ast.NotIn)):
                if not isinstance(right, (ast.Tuple, ast.List)):
                    raise ProgramError(
                        f"'in' needs a literal tuple/list (line {node.lineno})"
                    )
                vals = []
                for e in right.elts:
                    if not isinstance(e, ast.Constant):
                        raise ProgramError(
                            f"'in' needs literal members (line {node.lineno})"
                        )
                    vals.append(e.value)
                part = _compile_expr(left, c).isin(vals)
                if isinstance(op, ast.NotIn):
                    part = ~part
            else:
                f = _CMPOPS.get(type(op))
                if f is None:
                    raise ProgramError(
                        f"unsupported comparison (line {node.lineno})"
                    )
                part = f(_compile_expr(left, c), _compile_expr(right, c))
            out = part if out is None else (out & part)
            left = right
        assert out is not None
        return out
    if isinstance(node, ast.BoolOp):
        parts = [_compile_expr(v, c) for v in node.values]
        out = parts[0]
        for p in parts[1:]:
            out = (out & p) if isinstance(node.op, ast.And) else (out | p)
        return out
    if isinstance(node, ast.IfExp):
        return F.when(
            _compile_expr(node.test, c), _compile_expr(node.body, c)
        ).otherwise(_compile_expr(node.orelse, c))
    if isinstance(node, ast.Call):
        return _compile_call(node, c)
    raise ProgramError(
        f"unsupported expression {type(node).__name__} (line {node.lineno})"
    )


def _compile_call(node: ast.Call, c: _Ctx) -> Column:
    fn = node.func
    args = node.args
    # ctx.get_feature('name') → dependency column (U3)
    if (
        isinstance(fn, ast.Attribute)
        and isinstance(fn.value, ast.Name)
        and c.ctx_arg is not None
        and fn.value.id == c.ctx_arg
        and fn.attr == "get_feature"
    ):
        if not (
            len(args) == 1
            and isinstance(args[0], ast.Constant)
            and isinstance(args[0].value, str)
        ):
            raise ProgramError(
                f"ctx.get_feature needs a literal name (line {node.lineno})"
            )
        dep = args[0].value
        if dep not in c.deps:
            c.deps.append(dep)
        return F.col(dep)
    # str methods on a compiled column
    if isinstance(fn, ast.Attribute):
        base = _compile_expr(fn.value, c)
        if fn.attr in _STR_METHODS and not args:
            return _STR_METHODS[fn.attr](base)
        if fn.attr == "startswith" and len(args) == 1:
            return base.startswith(_compile_expr(args[0], c))
        if fn.attr == "endswith" and len(args) == 1:
            return base.endswith(_compile_expr(args[0], c))
        if fn.attr == "replace" and len(args) == 2:
            return F.replace(
                base, _compile_expr(args[0], c), _compile_expr(args[1], c)
            )
        raise ProgramError(f"unsupported method .{fn.attr} (line {node.lineno})")
    if isinstance(fn, ast.Name):
        cargs = [_compile_expr(a, c) for a in args]
        if fn.id == "len" and len(cargs) == 1:
            return F.length(cargs[0])
        if fn.id == "abs" and len(cargs) == 1:
            return F.abs(cargs[0])
        if fn.id == "round" and len(cargs) in (1, 2):
            scale = 0
            if len(args) == 2:
                if not isinstance(args[1], ast.Constant):
                    raise ProgramError(
                        f"round() scale must be literal (line {node.lineno})"
                    )
                scale = args[1].value
            return F.round(cargs[0], scale)
        if fn.id == "min" and len(cargs) >= 2:
            return F.least(*cargs)
        if fn.id == "max" and len(cargs) >= 2:
            return F.greatest(*cargs)
        if fn.id in _CASTS and len(cargs) == 1:
            return cargs[0].cast(_CASTS[fn.id])
        raise ProgramError(f"unsupported call {fn.id}() (line {node.lineno})")
    raise ProgramError(f"unsupported call form (line {node.lineno})")


def _terminates(stmts: list[ast.stmt]) -> bool:
    """True when every control path through ``stmts`` hits a return —
    the fall-through continuation after them is unreachable."""
    for s in stmts:
        if isinstance(s, ast.Return):
            return True
        if (
            isinstance(s, ast.If)
            and s.orelse
            and _terminates(s.body)
            and _terminates(s.orelse)
        ):
            return True
    return False


def _compile_body(
    stmts: list[ast.stmt], c: _Ctx, cont: Optional[Column] = None
) -> Column:
    """Statement list → Column. Supports return / if-elif-else trees;
    a branch without a return FALLS THROUGH to the following statements
    (``cont``), exactly like Python control flow. A function end with
    no return yields NULL (the implicit None-filter drops the row)."""
    if not stmts:
        if cont is None:
            c.may_be_null = True  # fall off the end → implicit None
            return F.lit(None)
        return cont
    head, rest = stmts[0], stmts[1:]
    if isinstance(head, ast.Return):
        if head.value is None or (
            isinstance(head.value, ast.Constant) and head.value.value is None
        ):
            c.may_be_null = True
            return F.lit(None)
        return _compile_expr(head.value, c)
    if isinstance(head, ast.If):
        # only compile the fall-through when some branch can reach it —
        # an exhaustive if/else that returns on every path must NOT set
        # may_be_null via the (unreachable) empty-rest continuation,
        # which would route a total handler through the publish/fill
        # machinery (ADVICE r2)
        if head.orelse and _terminates(head.body) and _terminates(head.orelse):
            fall = None
        else:
            fall = _compile_body(rest, c, cont)
        then_col = _compile_body(head.body, c, fall)
        else_col = _compile_body(head.orelse, c, fall)
        return F.when(_compile_expr(head.test, c), then_col).otherwise(else_col)
    if isinstance(head, (ast.Expr,)) and isinstance(head.value, ast.Constant):
        # docstring — skip
        return _compile_body(rest, c, cont)
    raise ProgramError(
        f"unsupported statement {type(head).__name__} (line {head.lineno}); "
        "handlers compile from return/if trees — for imperative logic pass "
        "a Column-returning callable or a pandas_udf instead"
    )


def compile_handler(fn: Callable) -> CompiledProgram:
    """Compile a reference-style handler ``def f(this_row, ctx) -> T``
    into a Column program. Raises ProgramError at definition time for
    unsupported constructs."""
    try:
        src = textwrap.dedent(inspect.getsource(fn))
    except (OSError, TypeError) as e:  # pragma: no cover
        raise ProgramError(f"cannot read handler source: {e}") from e
    tree = ast.parse(src)
    fdef = next(
        (n for n in tree.body if isinstance(n, (ast.FunctionDef,))), None
    )
    if fdef is None:
        raise ProgramError("no function definition found in handler source")
    posargs = [a.arg for a in fdef.args.args]
    if not posargs:
        raise ProgramError("handler must accept (this_row, ctx)")
    c = _Ctx(row_arg=posargs[0], ctx_arg=posargs[1] if len(posargs) > 1 else None)
    col = _compile_body(list(fdef.body), c)
    cast_to = None
    if fdef.returns is not None and isinstance(fdef.returns, ast.Name):
        cast_to = _CASTS.get(fdef.returns.id)
    deps = tuple(c.deps)

    def builder(df: DataFrame, _col=col) -> Column:
        return _col

    return CompiledProgram(
        name=fn.__name__, builder=builder, dependencies=deps, cast_to=cast_to,
        may_be_null=c.may_be_null, columns=tuple(c.cols), source=src,
    )
