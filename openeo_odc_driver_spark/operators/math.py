"""Element-wise math / comparison / logic operators.

Mirrors the reference's per-pixel scalar functions
(``openeo_odc_driver.py:382-592,965-1019``). Each operator has two layers:

- a **Column builder** (``add_cols``, ``clip_cols`` …) used inside reducer
  sub-graphs and ``apply`` — pure Catalyst expressions, whole-stage
  codegen'd, no Python in the hot path;
- a **cube-level apply** (:func:`apply_unary`, :func:`binary_cubes`) that
  aligns operands: scalar ⊗ cube is a literal column; cube ⊗ cube is an
  equi-join on the shared grid keys (the reference relies on xarray
  broadcasting; in long format alignment is a join Catalyst can plan —
  broadcast when one side is small, sort-merge otherwise).

Numeric policy (SURVEY §4): the reference coerces results to float32
(``openeo_odc_driver.py:424,446,465,484``); we compute in double end-to-end
and cast only at sinks, so results match the DuckDB oracle exactly.
Division guards: non-ANSI Spark yields NULL on x/0 which matches the
NaN-poisoning the reference gets from numpy; `divide` by a *scalar* zero
raises, mirroring DivisionByZero (``openeo_odc_driver.py:436-437``).
"""

from __future__ import annotations

import math
from typing import Callable, Union

from pyspark.sql import Column, functions as F

from ..core.cube import VALUE, Cube

Operand = Union[Column, float, int]


def _c(v: Operand) -> Column:
    return v if isinstance(v, Column) else F.lit(float(v))


# --- Column builders (openeo process_id -> expression) ---------------------

def add_cols(x: Operand, y: Operand) -> Column:
    return _c(x) + _c(y)


def subtract_cols(x: Operand, y: Operand) -> Column:
    return _c(x) - _c(y)


def max_cols(x: Operand, y: Operand) -> Column:
    """Binary max — the scalar shape openEO overlap resolvers and
    apply sub-graphs use (greatest skips NULLs, matching the openEO
    ignore_nodata default)."""
    return F.greatest(_c(x), _c(y))


def min_cols(x: Operand, y: Operand) -> Column:
    return F.least(_c(x), _c(y))


def multiply_cols(x: Operand, y: Operand) -> Column:
    # MultiplicandMissing check happens at plan build (planner)
    return _c(x) * _c(y)


def divide_cols(x: Operand, y: Operand) -> Column:
    if isinstance(y, (int, float)) and y == 0:
        raise ZeroDivisionError("DivisionByZero")  # openeo_odc_driver.py:436-437
    return _c(x) / _c(y)


def normalized_difference_cols(x: Operand, y: Operand) -> Column:
    # (x-y)/(x+y); NULL where x+y = 0 (both engines via nullif guard)
    s = _c(x) + _c(y)
    return (_c(x) - _c(y)) / F.nullif(s, F.lit(0.0))


def lt_cols(x: Operand, y: Operand) -> Column:
    return _c(x) < _c(y)


def lte_cols(x: Operand, y: Operand) -> Column:
    return _c(x) <= _c(y)


def gt_cols(x: Operand, y: Operand) -> Column:
    return _c(x) > _c(y)


def gte_cols(x: Operand, y: Operand) -> Column:
    return _c(x) >= _c(y)


def eq_cols(x: Operand, y: Operand) -> Column:
    return _c(x) == _c(y)


def neq_cols(x: Operand, y: Operand) -> Column:
    return _c(x) != _c(y)


def not_cols(x: Operand) -> Column:
    return ~_c(x).cast("boolean")


def and_cols(x: Operand, y: Operand) -> Column:
    return _c(x).cast("boolean") & _c(y).cast("boolean")


def or_cols(x: Operand, y: Operand) -> Column:
    return _c(x).cast("boolean") | _c(y).cast("boolean")


def sqrt_cols(x: Operand) -> Column:
    return F.sqrt(_c(x))


def power_cols(base: Operand, p: Operand) -> Column:
    return F.pow(_c(base), _c(p))


def absolute_cols(x: Operand) -> Column:
    return F.abs(_c(x))


def ln_cols(x: Operand) -> Column:
    # reference intends natural log (calls nonexistent np.ln — latent bug,
    # openeo_odc_driver.py:510-514); we implement the intent
    return F.log(_c(x))


def log_cols(x: Operand, base: Operand) -> Column:
    # np.log(x)/np.log(base) (openeo_odc_driver.py:507-509)
    return F.log(_c(x)) / F.log(_c(base))


def sin_cols(x: Operand) -> Column:
    return F.sin(_c(x))


def cos_cols(x: Operand) -> Column:
    return F.cos(_c(x))


def pi_col() -> Column:
    return F.lit(math.pi)


# --- openEO processes beyond the reference's dispatch (the spec defines
# them; the reference never wired them — a migrating user gets them here) --

def floor_cols(x: Operand) -> Column:
    return F.floor(_c(x)).cast("double")


def ceil_cols(x: Operand) -> Column:
    # `+ 0.0` canonicalizes IEEE signed zero (-0.0 → +0.0) so results are
    # bit-identical across engines that differ on the sign of zero.
    return F.ceil(_c(x)).cast("double") + F.lit(0.0)


def round_cols(x: Operand, p: int = 0) -> Column:
    # openEO round = half-to-even; Spark bround is exactly that.
    # `+ 0.0` canonicalizes signed zero (see ceil_cols).
    return F.bround(_c(x), int(p)) + F.lit(0.0)


def int_cols(x: Operand) -> Column:
    """Truncate toward zero (openEO `int`). `+ 0.0` canonicalizes -0.0."""
    v = _c(x)
    return (F.when(v < 0, -F.floor(-v)).otherwise(F.floor(v)).cast("double")
            + F.lit(0.0))


def exp_cols(x: Operand) -> Column:
    return F.exp(_c(x))


def mod_cols(x: Operand, y: Operand) -> Column:
    """openEO mod: sign follows the divisor (Python %), not the dividend
    (SQL %): mod(x,y) = x − y·floor(x/y)."""
    xv, yv = _c(x), _c(y)
    return xv - yv * F.floor(xv / yv)


def tan_cols(x: Operand) -> Column:
    return F.tan(_c(x))


def arctan_cols(x: Operand) -> Column:
    return F.atan(_c(x))


def between_cols(x: Operand, lo: Operand, hi: Operand) -> Column:
    return _c(x).between(_c(lo), _c(hi))


def is_nodata_cols(x: Operand) -> Column:
    return _c(x).isNull()


def clip_cols(x: Operand, lo: Operand = 0.0, hi: Operand = 1.0) -> Column:
    # clamp to [min(def 0), max] (openeo_odc_driver.py:1000-1019)
    return F.least(F.greatest(_c(x), _c(lo)), _c(hi))


def linear_scale_range_cols(
    x: Operand,
    input_min: float,
    input_max: float,
    output_min: float = 0.0,
    output_max: float = 1.0,
) -> Column:
    # clip to input range then affine rescale (openeo_odc_driver.py:977-998)
    clipped = clip_cols(x, input_min, input_max)
    num = (clipped - F.lit(float(input_min))) * F.lit(float(output_max - output_min))
    return num / F.lit(float(input_max - input_min)) + F.lit(float(output_min))


def if_cols(cond: Operand, accept: Operand, reject: Operand = None) -> Column:
    """Element-wise conditional (openeo_odc_driver.py:1294-1316).

    The reference encodes it as value*accept + (NOT value)*reject, which
    NaN-poisons when the condition is NaN; NULL condition here likewise
    yields NULL (neither branch), matching that behavior.
    """
    rej = F.lit(None) if reject is None else _c(reject)
    return (
        F.when(_c(cond).isNull(), F.lit(None))
        .when(_c(cond).cast("boolean"), _c(accept))
        .otherwise(rej)
    )


# --- cube-level application -------------------------------------------------

def apply_unary(cube: Cube, fn: Callable[[Column], Column]) -> Cube:
    """Apply a 1-arg column builder to a cube's values (openeo `apply`)."""
    return cube.with_df(cube.df.withColumn(VALUE, fn(F.col(VALUE))))


def binary_cubes(
    cube1: Cube,
    cube2: Cube,
    fn: Callable[[Column, Column], Column],
    how: str = "inner",
) -> Cube:
    """cube ⊗ cube: align on shared grid keys (equi-join) then combine.

    Scale: the join keys are the full grid key — at 100 TB both sides are
    co-partitioned by the same keys when they derive from the same scan
    (Catalyst reuses the exchange); otherwise AQE picks the strategy.
    """
    keys = [d for d in cube1.key_dims if d in cube2.key_dims]
    left = cube1.df.withColumnRenamed(VALUE, "_v1")
    right = cube2.df.withColumnRenamed(VALUE, "_v2")
    # drop right-side non-key dims to avoid ambiguous columns
    right = right.select(*keys, "_v2")
    out = left.join(right, keys, how).withColumn(
        VALUE, fn(F.col("_v1"), F.col("_v2"))
    ).drop("_v1", "_v2")
    return Cube(out, cube1.schema)
