"""Deferred-expression system for parametrized sequences.

TPU-native replacement for pulser's ``Variable`` / ``VariableItem`` /
``ParamObj`` machinery (consumed by the reference at
/root/reference/pulser_diff/model.py:208-299 and waveform_funcs.py:9-27).

A :class:`Variable` is declared on a :class:`~.sequence.Sequence`; arithmetic
on it builds a small expression DAG.  ``Expr.evaluate(values)`` substitutes
concrete JAX arrays, so a parametrized sequence built from trainable leaves
is differentiable end-to-end through ``jax.grad``.
"""

from __future__ import annotations

import operator
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp


class Expr:
    """Base class for deferred expressions over sequence variables."""

    # ------------------------------------------------------------------
    def evaluate(self, values: Mapping[str, Any]) -> jax.Array:
        raise NotImplementedError

    def variables(self) -> set[str]:
        raise NotImplementedError

    # -- arithmetic -----------------------------------------------------
    def _binop(self, other: Any, fn: Callable, name: str, reverse: bool = False) -> "Expr":
        a, b = (other, self) if reverse else (self, other)
        return OpCall(fn, (a, b), name)

    def __add__(self, o: Any) -> "Expr":
        return self._binop(o, operator.add, "add")

    def __radd__(self, o: Any) -> "Expr":
        return self._binop(o, operator.add, "add", reverse=True)

    def __sub__(self, o: Any) -> "Expr":
        return self._binop(o, operator.sub, "sub")

    def __rsub__(self, o: Any) -> "Expr":
        return self._binop(o, operator.sub, "sub", reverse=True)

    def __mul__(self, o: Any) -> "Expr":
        return self._binop(o, operator.mul, "mul")

    def __rmul__(self, o: Any) -> "Expr":
        return self._binop(o, operator.mul, "mul", reverse=True)

    def __truediv__(self, o: Any) -> "Expr":
        return self._binop(o, operator.truediv, "div")

    def __rtruediv__(self, o: Any) -> "Expr":
        return self._binop(o, operator.truediv, "div", reverse=True)

    def __pow__(self, o: Any) -> "Expr":
        return self._binop(o, operator.pow, "pow")

    def __neg__(self) -> "Expr":
        return OpCall(operator.neg, (self,), "neg")

    def __abs__(self) -> "Expr":
        return OpCall(jnp.abs, (self,), "abs")

    def __getitem__(self, idx: int) -> "Expr":
        if isinstance(self, Variable):
            return VariableItem(self, idx)
        return OpCall(lambda x: x[idx], (self,), f"getitem[{idx}]")

    # -- math functions (mirroring pulser's ParamObj methods) ----------
    def tanh(self) -> "Expr":
        return OpCall(jnp.tanh, (self,), "tanh")

    def sin(self) -> "Expr":
        return OpCall(jnp.sin, (self,), "sin")

    def cos(self) -> "Expr":
        return OpCall(jnp.cos, (self,), "cos")

    def exp(self) -> "Expr":
        return OpCall(jnp.exp, (self,), "exp")

    def sqrt(self) -> "Expr":
        return OpCall(jnp.sqrt, (self,), "sqrt")

    def log(self) -> "Expr":
        return OpCall(jnp.log, (self,), "log")


class Variable(Expr):
    """A named, sized placeholder declared on a sequence."""

    def __init__(self, name: str, size: int = 1, dtype: type = float) -> None:
        self.name = name
        self.size = size
        self.dtype = dtype

    # pulser exposes `.var` on VariableItem; for symmetry Variable.var = self
    @property
    def var(self) -> "Variable":
        return self

    def evaluate(self, values: Mapping[str, Any]) -> jax.Array:
        if self.name not in values:
            raise ValueError(f"No value given for variable '{self.name}'.")
        val = values[self.name]
        arr = val if isinstance(val, jax.Array) else jnp.asarray(val)
        if self.dtype is int and not jnp.issubdtype(arr.dtype, jnp.integer):
            # durations etc. must be concrete ints; cast eagerly
            arr = jnp.round(arr).astype(int)
        return arr

    def variables(self) -> set[str]:
        return {self.name}

    def __len__(self) -> int:
        return self.size

    def __iter__(self):
        return (VariableItem(self, i) for i in range(self.size))

    def __repr__(self) -> str:
        return f"Variable({self.name!r}, size={self.size})"


class VariableItem(Expr):
    """A single element of a sized Variable."""

    def __init__(self, var: Variable, index: int) -> None:
        self.var = var
        self.index = index

    def evaluate(self, values: Mapping[str, Any]) -> jax.Array:
        arr = self.var.evaluate(values)
        if arr.ndim == 0:
            if self.index != 0:
                raise IndexError(
                    f"index {self.index} out of range for scalar variable "
                    f"'{self.var.name}'"
                )
            return arr
        return arr[self.index]

    def variables(self) -> set[str]:
        return {self.var.name}

    def __repr__(self) -> str:
        return f"{self.var.name}[{self.index}]"


class OpCall(Expr):
    """A deferred function application over expressions and constants."""

    def __init__(self, fn: Callable, args: tuple, opname: str) -> None:
        self.fn = fn
        self.args = args
        self.opname = opname

    def evaluate(self, values: Mapping[str, Any]) -> jax.Array:
        ev = [
            a.evaluate(values) if isinstance(a, Expr) else a for a in self.args
        ]
        return self.fn(*ev)

    def variables(self) -> set[str]:
        out: set[str] = set()
        for a in self.args:
            if isinstance(a, Expr):
                out |= a.variables()
        return out

    def __repr__(self) -> str:
        return f"OpCall({self.opname}, {self.args})"


def evaluate(x: Any, values: Mapping[str, Any]) -> Any:
    """Evaluate ``x`` if it is an Expr, else return it unchanged."""
    return x.evaluate(values) if isinstance(x, Expr) else x


def contains_expr(x: Any) -> bool:
    return isinstance(x, Expr)
