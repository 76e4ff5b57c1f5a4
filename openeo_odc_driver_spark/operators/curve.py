"""fit_curve / predict_curve — per-pixel model fitting along time
(openeo_odc_driver.py:1506-1596).

The reference compiles the model sub-graph to a Python source *string* and
``exec``s it (:1530,1578); here the model is a small expression tree
(:class:`ModelExpr`) evaluated with numpy — no exec, no string codegen.

Physical plan: ``fit_curve`` is a grouped-map pandas UDF. Grouping per
pixel would create billions of tiny groups, so groups are **spatial
tiles** (`applyInPandas` on (band, tile)) and the pixel loop runs in numpy
inside — SURVEY §7's "group per tile, loop pixels inside". Output is a
params cube: one row per (band, y, x) with an ``array<double>`` of
coefficients (the reference's `params` dimension, :1547-1550).

Fitting: models **linear in the parameters** (the openEO use case —
harmonic regression ``a0 + a1*cos(wt) + a2*sin(wt)``) solve exactly with
``numpy.linalg.lstsq`` per pixel; nonlinear models use damped Gauss-Newton
with a numeric Jacobian (scipy isn't in the image). Pixels with < 2·n_params
finite samples yield zero coefficients, mirroring the reference's <12-sample
guard (:1531-1536).

Divergence policy vs the reference's sparse-pixel rule (:1531-1536):
the reference drops ``y == 0`` samples (masked pixels arrive as literal
zeros in its xarray pipeline) and returns ``[0, 0, 0]`` below 12
samples. Here the mask operator produces NULL → NaN, so **NaN is the
missing-data sentinel and 0.0 is a valid observation**, and the guard
is ``< max(2·n_params, 2)`` finite samples (parameter-count-aware
rather than the fixed 12). Same degenerate-pixel contract — all-zero
coefficients — different sentinel and threshold. Property-pinned in
tests/test_properties.py: the guard is exact under arbitrary NaN
interleavings, NaN holes never perturb the fit relative to the
compacted series, and adversarially large observations cannot push
NaN/inf into the params cube on either fitting path.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Sequence

import numpy as np
# module-scope import: pandas-UDF string annotations resolve against module
# globals under `from __future__ import annotations`
import pandas as pd

from pyspark.sql import Column, functions as F

from ..core.cube import BAND, TIME, VALUE, X, Y, Cube


# --- model expression tree (replaces the reference's string codegen) --------

@dataclass(frozen=True)
class ModelExpr:
    """Tiny AST: op ∈ {const, t, param, add, sub, mul, div, sin, cos, pow}."""

    op: str
    args: tuple = ()

    def __call__(self, t: np.ndarray, p: np.ndarray) -> np.ndarray:
        """Evaluate at times t (1-D, n rows) with params p — either 1-D
        (shared across rows) or 2-D (n, n_params) for per-row params
        (the vectorized predict path)."""
        a = self.args
        if self.op == "const":
            return np.full_like(np.asarray(t, dtype="float64"), a[0], dtype="float64")
        if self.op == "t":
            return np.asarray(t, dtype="float64")
        if self.op == "param":
            p = np.asarray(p, dtype="float64")
            if p.ndim == 2:
                return p[:, a[0]]
            return np.full_like(np.asarray(t, dtype="float64"), p[a[0]], dtype="float64")
        if self.op == "add":
            return a[0](t, p) + a[1](t, p)
        if self.op == "sub":
            return a[0](t, p) - a[1](t, p)
        if self.op == "mul":
            return a[0](t, p) * a[1](t, p)
        if self.op == "div":
            return a[0](t, p) / a[1](t, p)
        if self.op == "sin":
            return np.sin(a[0](t, p))
        if self.op == "cos":
            return np.cos(a[0](t, p))
        if self.op == "pow":
            return a[0](t, p) ** a[1](t, p)
        raise ValueError(f"unknown op {self.op}")

    @property
    def n_params(self) -> int:
        if self.op == "param":
            return self.args[0] + 1
        return max((c.n_params for c in self.args if isinstance(c, ModelExpr)), default=0)


def const(v: float) -> ModelExpr:
    return ModelExpr("const", (float(v),))


def tvar() -> ModelExpr:
    return ModelExpr("t")


def param(i: int) -> ModelExpr:
    return ModelExpr("param", (int(i),))


def add(x, y) -> ModelExpr:
    return ModelExpr("add", (x, y))


def sub(x, y) -> ModelExpr:
    return ModelExpr("sub", (x, y))


def mul(x, y) -> ModelExpr:
    return ModelExpr("mul", (x, y))


def sin(x) -> ModelExpr:
    return ModelExpr("sin", (x,))


def cos(x) -> ModelExpr:
    return ModelExpr("cos", (x,))


PI = const(math.pi)


def harmonic_model(period_days: float = 365.25) -> ModelExpr:
    """a0 + a1*cos(2πt/T) + a2*sin(2πt/T), t in days — the canonical openEO
    phenology model built in fit_curve sub-graphs."""
    w = const(2 * math.pi / period_days)
    return add(
        param(0),
        add(mul(param(1), cos(mul(w, tvar()))), mul(param(2), sin(mul(w, tvar())))),
    )


def linear_model() -> ModelExpr:
    """a0 + a1*t (t in days since the cube's first sample)."""
    return add(param(0), mul(param(1), tvar()))


def _basis_functions(model: ModelExpr) -> list[Callable] | None:
    """If the model is linear in params, return per-param basis callables
    b_i(t) with model(t,p) = Σ p_i·b_i(t); else None. Detected numerically:
    f(t, e_i) − f(t, 0) must reproduce f for random p."""
    n = model.n_params
    t_probe = np.linspace(0.0, 733.7, 17)
    f0 = model(t_probe, np.zeros(n))
    bases = []
    for i in range(n):
        e = np.zeros(n)
        e[i] = 1.0
        bases.append(model(t_probe, e) - f0)
    rng = np.random.default_rng(7)
    for _ in range(3):
        p = rng.normal(size=n)
        approx = f0 + sum(p[i] * bases[i] for i in range(n))
        if not np.allclose(approx, model(t_probe, p), rtol=1e-9, atol=1e-9):
            return None

    def make(i):
        e = np.zeros(n)
        e[i] = 1.0
        return lambda t: model(t, e) - model(t, np.zeros(n))

    return [make(i) for i in range(n)]


def _fit_pixel(t: np.ndarray, v: np.ndarray, model: ModelExpr,
               bases: list[Callable] | None) -> np.ndarray:
    n = model.n_params
    ok = np.isfinite(v)
    if ok.sum() < max(2 * n, 2):
        return np.zeros(n)  # ≙ reference's sparse-pixel guard (:1531-1536)
    t, v = t[ok], v[ok]
    if bases is not None:
        A = np.column_stack([b(t) for b in bases])
        resid = v - model(t, np.zeros(n))
        coef, *_ = np.linalg.lstsq(A, resid, rcond=None)
        return coef
    # damped Gauss-Newton, numeric Jacobian
    p = np.zeros(n)
    for _ in range(50):
        r = v - model(t, p)
        J = np.empty((len(t), n))
        for i in range(n):
            dp = np.zeros(n)
            dp[i] = 1e-6
            J[:, i] = (model(t, p + dp) - model(t, p - dp)) / 2e-6
        try:
            step, *_ = np.linalg.lstsq(J, r, rcond=None)
        except np.linalg.LinAlgError:
            break
        p = p + 0.8 * step
        if np.max(np.abs(step)) < 1e-10:
            break
    return p


def _utc_label(dt):
    """Normalize a timestamp to its naive-UTC wall-clock label.

    Two provenances reach the curve ops and they are NOT interchangeable
    under a non-UTC host timezone (caught by a TZ=America/New_York full
    gate run): plan-time ``time_axis`` entries are already naive UTC
    labels, but a datetime COLLECTED from Spark is rendered in the OS
    timezone (fromInternal uses fromtimestamp-local), so treating it as
    UTC shifts every prediction by the UTC offset. ``timestamp()``
    inverts the local rendering to the true epoch; re-rendering as UTC
    yields the label both engines agree on.
    """
    from datetime import timezone as _tz

    if dt.tzinfo is not None:
        return dt.astimezone(_tz.utc).replace(tzinfo=None)
    return __import__("datetime").datetime.fromtimestamp(
        dt.timestamp(), tz=_tz.utc
    ).replace(tzinfo=None)


def fit_curve(cube: Cube, model: ModelExpr, tile: int = 64) -> Cube:
    """Returns a params cube: (band, y, x, params array<double>).

    Time is converted to **days since the cube's minimum time** before
    fitting (the reference uses raw unix seconds, :1542 — day-offsets keep
    the normal equations well-conditioned and the arithmetic exact for
    fixture data)."""
    grid = cube.schema.grid
    n = model.n_params
    bases = _basis_functions(model)
    if cube.schema.time_axis:
        t0 = cube.schema.time_axis[0]  # plan-time metadata: zero jobs
    else:
        t0 = _utc_label(
            cube.df.agg(F.min(TIME)).collect()[0][0]
        )  # one tiny metadata action; label-normalized (OS-TZ rendering)

    def fit_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        tsec0 = pd.Timestamp(t0).value / 1e9
        for (b, yy, xx), g in pdf.groupby(["band", "y", "x"], sort=False):
            # Row order within a shuffled group is not stable across runs;
            # lstsq/Gauss-Newton float sums are order-sensitive at the ULP
            # level, so sort by time to make coefficients bit-deterministic
            # (the fixed-expected-value oracle depends on this).
            g = g.sort_values("time")
            t = (g["time"].astype("int64").to_numpy() / 1e9 - tsec0) / 86400.0
            v = g["value"].to_numpy(dtype="float64")
            coef = _fit_pixel(t, np.where(np.isnan(v), np.nan, v), model, bases)
            rows.append((b, yy, xx, [float(c) for c in coef]))
        return pd.DataFrame(rows, columns=["band", "y", "x", "params"])

    if grid is not None:
        tx = F.floor((F.col(X) - F.lit(grid.x0)) / F.lit(grid.resx * tile))
        ty = F.floor((F.lit(grid.y0) - F.col(Y)) / F.lit(grid.resy * tile))
    else:
        tx, ty = F.lit(0), F.lit(0)
    df = cube.df.withColumn("_tx", tx).withColumn("_ty", ty)
    out = df.groupBy(BAND, "_tx", "_ty").applyInPandas(
        fit_tile, "band string, y double, x double, params array<double>"
    )
    from dataclasses import replace

    return Cube(out, replace(cube.schema.drop(TIME), grid=grid))


def fit_curve_linear(cube: Cube) -> Cube:
    """``fit_curve`` specialised to the 2-param linear model ``a0 + a1·t``
    as a **pure aggregation** — no UDF, no Python in the row path.

    Closed-form least squares from the sufficient statistics
    (n, Σt, Σv, Σtv, Σt²):

        a1 = (n·Σtv − Σt·Σv) / (n·Σt² − (Σt)²),   a0 = (Σv − a1·Σt)/n

    t is days since the cube's min time, computed *inside the plan* via a
    broadcast scalar aggregate (no driver action). Pixels with < 4 finite
    samples get [0, 0] — the reference's sparse-pixel guard
    (openeo_odc_driver.py:1531-1536) scaled to n_params=2.

    Scale: two aggregations (one global min — tiny; one per-pixel) — the
    per-pixel groupBy is the same single shuffle any reducer costs, and
    Catalyst fuses the coefficient arithmetic into the agg's output stage.
    """
    t0 = cube.df.agg(F.min(TIME).alias("_t0"))
    df = cube.df.join(F.broadcast(t0)).withColumn(
        "_t",
        (F.unix_micros(F.col(TIME)) - F.unix_micros(F.col("_t0")))
        / F.lit(86400.0 * 1e6),
    )
    v = F.col(VALUE)
    agg = (
        df.groupBy(BAND, Y, X)
        .agg(
            F.count(v).alias("_n"),
            F.sum(F.when(v.isNotNull(), F.col("_t"))).alias("_st"),
            F.sum(v).alias("_sv"),
            F.sum(F.col("_t") * v).alias("_stv"),
            F.sum(F.when(v.isNotNull(), F.col("_t") * F.col("_t"))).alias("_stt"),
        )
    )
    n = F.col("_n")
    denom = n * F.col("_stt") - F.col("_st") * F.col("_st")
    a1 = (n * F.col("_stv") - F.col("_st") * F.col("_sv")) / denom
    a0 = (F.col("_sv") - a1 * F.col("_st")) / n
    ok = (n >= 4) & (denom != 0)
    out = agg.select(
        BAND,
        Y,
        X,
        F.array(
            F.when(ok, a0).otherwise(F.lit(0.0)),
            F.when(ok, a1).otherwise(F.lit(0.0)),
        ).alias("params"),
    )
    from dataclasses import replace

    return Cube(out, replace(cube.schema.drop(TIME), grid=cube.schema.grid))


def predict_curve(params: Cube, model: ModelExpr, times: Cube | Sequence) -> Cube:
    """Evaluate the fitted model at the target cube's timestamps
    (openeo_odc_driver.py:1557-1596): broadcast-join params onto the time
    axis and evaluate via a vectorized pandas UDF (one numpy evaluation of
    the model AST per Arrow batch — no per-row Python loop)."""
    if isinstance(times, Cube):
        if times.schema.time_axis:
            # plan-time metadata: the time axis is a literal local
            # relation (no distinct() subquery, no min() collect)
            axis = list(times.schema.time_axis)
            # naive datetimes go through OS-local mktime in
            # createDataFrame — attach explicit UTC so the stored
            # instants equal the cube's wall-clock-as-UTC labels under
            # ANY host timezone (the TZ-gate regression)
            from datetime import timezone as _tz

            t_df = times.df.sparkSession.createDataFrame(
                [(t.replace(tzinfo=_tz.utc) if t.tzinfo is None else t,)
                 for t in axis],
                f"{TIME} timestamp",
            )
            t0 = axis[0]
        else:
            t_df = times.df.select(TIME).distinct()
            t0 = _utc_label(times.df.agg(F.min(TIME)).collect()[0][0])
    else:
        raise NotImplementedError("pass a Cube for the target time axis")
    tsec0 = pd.Timestamp(t0).value / 1e9

    @F.pandas_udf("double")
    def eval_model(ts: pd.Series, ps: pd.Series) -> pd.Series:
        t = (ts.astype("int64").to_numpy() / 1e9 - tsec0) / 86400.0
        P = np.stack([np.asarray(v, dtype="float64") for v in ps])
        return pd.Series(model(t, P))

    out = (
        params.df.crossJoin(F.broadcast(t_df))
        .withColumn(VALUE, eval_model(F.col(TIME), F.col("params")))
        .drop("params")
    )
    from dataclasses import replace

    schema = replace(params.schema, dims=tuple(
        d for d in (BAND, TIME, Y, X) if d in (*params.schema.dims, TIME)
    ))
    return Cube(out.select(*[d for d in (BAND, TIME, Y, X) if d in schema.dims], VALUE), schema)
