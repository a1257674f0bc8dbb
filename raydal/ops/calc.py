"""Expression-based band algebra — the ``gdal raster calc`` /
VRT ``expression`` pixel-function analogue
(``apps/gdalalg_raster_calc.cpp``, ``frmts/vrt/vrtexpression_muparser.cpp``).

The reference embeds muparser; this engine evaluates the same expression
surface through a WHITELISTED Python AST compiled once per expression —
no ``eval`` of arbitrary code, vectorized numpy underneath:

* arithmetic ``+ - * / % **``, unary ``-``, parentheses,
* comparisons (vectorized, producing 0/1 like muparser booleans) and
  ``&``/``|`` logical combinations,
* functions: sqrt, abs, exp, log, log10, sin, cos, tan, asin, acos,
  atan, atan2, pow, floor, ceil, fmod, min, max (variadic elementwise),
  ``if_(cond, a, b)`` (muparser's conditional),
* free variables resolve to named bands.

Computation runs in float64 like the reference's muparser doubles.
"""

from __future__ import annotations

import ast
import re

import numpy as np

__all__ = ["compile_expression", "eval_expression"]


def _reduce(ufunc, args):
    out = np.asarray(args[0], dtype=np.float64)
    for a in args[1:]:
        out = ufunc(out, np.asarray(a, dtype=np.float64))
    return out

_FUNCS = {
    "sqrt": np.sqrt, "abs": np.abs, "exp": np.exp, "log": np.log,
    "log10": np.log10, "sin": np.sin, "cos": np.cos, "tan": np.tan,
    "asin": np.arcsin, "acos": np.arccos, "atan": np.arctan,
    "atan2": np.arctan2, "pow": np.power, "floor": np.floor,
    "ceil": np.ceil, "fmod": np.fmod,
    "min": lambda *a: _reduce(np.minimum, a),
    "max": lambda *a: _reduce(np.maximum, a),
    "if_": lambda c, a, b: np.where(c != 0, a, b),
}

_BINOPS = {ast.Add: np.add, ast.Sub: np.subtract, ast.Mult: np.multiply,
           ast.Div: np.divide, ast.Mod: np.mod, ast.Pow: np.power,
           ast.BitAnd: np.logical_and, ast.BitOr: np.logical_or}
_CMPOPS = {ast.Lt: np.less, ast.LtE: np.less_equal, ast.Gt: np.greater,
           ast.GtE: np.greater_equal, ast.Eq: np.equal,
           ast.NotEq: np.not_equal}


def _check(node):
    if isinstance(node, ast.Expression):
        _check(node.body)
    elif isinstance(node, ast.BinOp) and type(node.op) in _BINOPS:
        _check(node.left)
        _check(node.right)
    elif isinstance(node, ast.UnaryOp) and isinstance(
            node.op, (ast.USub, ast.UAdd, ast.Not)):
        _check(node.operand)
    elif isinstance(node, ast.Compare):
        if len(node.ops) != 1 or type(node.ops[0]) not in _CMPOPS:
            raise ValueError("unsupported comparison in expression")
        _check(node.left)
        _check(node.comparators[0])
    elif isinstance(node, ast.Call):
        if not isinstance(node.func, ast.Name) \
                or node.func.id not in _FUNCS or node.keywords:
            raise ValueError(f"unsupported function in expression")
        for a in node.args:
            _check(a)
    elif isinstance(node, ast.Name):
        pass
    elif isinstance(node, ast.Constant) and isinstance(
            node.value, (int, float)):
        pass
    else:
        raise ValueError(
            f"unsupported expression element {type(node).__name__}")


class _Evaluator:
    def __init__(self, tree):
        self.tree = tree

    def __call__(self, env):
        return self._ev(self.tree.body, env)

    def _ev(self, n, env):
        if isinstance(n, ast.BinOp):
            out = _BINOPS[type(n.op)](self._ev(n.left, env),
                                      self._ev(n.right, env))
            return out.astype(np.float64) if out.dtype == bool else out
        if isinstance(n, ast.UnaryOp):
            v = self._ev(n.operand, env)
            if isinstance(n.op, ast.USub):
                return np.negative(v)
            if isinstance(n.op, ast.Not):
                return np.logical_not(v).astype(np.float64)
            return v
        if isinstance(n, ast.Compare):
            return _CMPOPS[type(n.ops[0])](
                self._ev(n.left, env),
                self._ev(n.comparators[0], env)).astype(np.float64)
        if isinstance(n, ast.Call):
            args = [self._ev(a, env) for a in n.args]
            out = _FUNCS[n.func.id](*args)
            return (np.asarray(out, dtype=np.float64)
                    if np.asarray(out).dtype == bool else out)
        if isinstance(n, ast.Name):
            if n.id not in env:
                raise KeyError(f"unknown band variable {n.id!r}")
            return np.asarray(env[n.id], dtype=np.float64)
        return np.float64(n.value)   # Constant


def _rewrite_ternary(text):
    """muparser ternary ``c ? a : b`` → ``if_(c, a, b)`` (paren-,
    comma- and nesting-aware; right-associative like muparser)."""
    # a ternary never spans a top-level comma (function-argument
    # boundary): split on depth-0 commas and rewrite each argument,
    # so e.g. max(x, c ? a : b) keeps "x" out of the condition
    depth = 0
    parts = []
    last = 0
    for i, ch in enumerate(text):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(text[last:i])
            last = i + 1
    if parts:
        parts.append(text[last:])
        return ",".join(_rewrite_ternary(p) for p in parts)
    depth = 0
    q = -1
    for i, ch in enumerate(text):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "?" and depth == 0:
            q = i
            break
    if q < 0:
        if "?" not in text:
            return text
        # no top-level ternary: rewrite inside each paren group
        out, i = [], 0
        depth = 0
        start = -1
        for j, ch in enumerate(text):
            if ch in "([":
                if depth == 0:
                    out.append(text[i:j + 1])
                    start = j + 1
                depth += 1
            elif ch in ")]":
                depth -= 1
                if depth == 0:
                    out.append(_rewrite_ternary(text[start:j]))
                    i = j
        out.append(text[i:])
        return "".join(out)
    # find the matching ':' at depth 0, skipping nested '?'
    depth = 0
    nest = 0
    for j in range(q + 1, len(text)):
        ch = text[j]
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "?" and depth == 0:
            nest += 1
        elif ch == ":" and depth == 0:
            if nest == 0:
                cond = _rewrite_ternary(text[:q])
                then = _rewrite_ternary(text[q + 1:j])
                other = _rewrite_ternary(text[j + 1:])
                return f"if_(({cond}), ({then}), ({other}))"
            nest -= 1
    raise ValueError(f"unmatched '?' in expression: {text!r}")


def compile_expression(expr):
    """Expression string → callable(env dict of band arrays) → float64
    array.  Compile once (step/actor ``__init__``), evaluate per batch."""
    # muparser conveniences rewritten onto the whitelisted AST surface:
    # && / || → & / |, if(c,a,b) → if_(c,a,b), ternary c ? a : b → if_()
    text = expr.replace("&&", "&").replace("||", "|")
    text = re.sub(r"\bif\s*\(", "if_(", text)
    text = _rewrite_ternary(text)
    tree = ast.parse(text, mode="eval")
    _check(tree)
    return _Evaluator(tree)


def eval_expression(expr, env):
    """One-shot convenience over :func:`compile_expression`."""
    return compile_expression(expr)(env)
