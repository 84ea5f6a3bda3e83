"""Convolutional resampling kernels (R1: cubic / cubic_spline / lanczos /
gauss — the 4 kernels the reference routes through rasterio,
``core_functions.py:292-299``, exercised for every kernel by
``testing/test_3_era5_manipulations.py:75-99``), now pure Spark.

Verification strategy: an INDEPENDENT numpy matrix-form oracle (dense
weight matrices ``Wy @ V @ Wx.T``, built without bisect/normalization
shortcuts) plus kernel-theory properties (Keys cubic reproduces
quadratics; B-spline/Lanczos/Gauss preserve constants via partition of
unity after normalization)."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from xarray_dataaccessor_spark.operators.spatial import (
    CONVOLUTIONAL_KERNELS,
    _target_axis,
    conv_tap_rows,
    kernel_weight,
    spatial_resample,
)

T = dt.datetime(2020, 1, 1)


def _weight_matrix(new_axis, old_axis, kernel, factor):
    """Dense per-axis weight matrix, written independently of
    conv_tap_rows (no bisect windowing — evaluates the kernel at every
    (target, source) pair, then normalizes rows)."""
    step = old_axis[1] - old_axis[0]
    scale = min(1.0, factor)
    W = np.zeros((len(new_axis), len(old_axis)))
    for i, nv in enumerate(new_axis):
        for j, ov in enumerate(old_axis):
            W[i, j] = kernel_weight(kernel, (nv - ov) / step * scale)
        s = W[i].sum()
        if s == 0.0:
            W[i, np.abs(np.asarray(old_axis) - nv).argmin()] = 1.0
            s = 1.0
        W[i] /= s
    return W


def _spark_grid(spark, xs, ys, values):
    rows = [
        (T, float(y), float(x), float(values[i, j]))
        for i, y in enumerate(ys)
        for j, x in enumerate(xs)
    ]
    return spark.createDataFrame(rows, "time timestamp, y double, x double, v double")


@pytest.mark.parametrize("kernel", sorted(CONVOLUTIONAL_KERNELS))
@pytest.mark.parametrize("factor", [2.0, 0.5])
def test_conv_kernel_matches_numpy_oracle(spark, kernel, factor):
    rng = np.random.RandomState(7)
    xs = [-83.476 + 0.25 * i for i in range(9)]
    ys = [42.883 - 0.25 * i for i in range(6)]
    vals = rng.uniform(260.0, 280.0, size=(len(ys), len(xs)))

    out = spatial_resample(
        _spark_grid(spark, xs, ys, vals),
        resolution_factor=factor,
        resample_method=kernel,
    ).collect()

    new_xs = _target_axis(xs, factor)
    new_ys = _target_axis(ys, factor)
    Wx = _weight_matrix(new_xs, xs, kernel, factor)
    Wy = _weight_matrix(new_ys, ys, kernel, factor)
    want = Wy @ vals @ Wx.T

    assert len(out) == len(new_xs) * len(new_ys)
    xi = {round(v, 9): i for i, v in enumerate(new_xs)}
    yi = {round(v, 9): i for i, v in enumerate(new_ys)}
    for r in out:
        i, j = yi[round(r["y"], 9)], xi[round(r["x"], 9)]
        assert r["v"] == pytest.approx(want[i, j], abs=1e-9), (kernel, factor, i, j)


@pytest.mark.parametrize("kernel", sorted(CONVOLUTIONAL_KERNELS))
def test_conv_kernel_preserves_constant_field(spark, kernel):
    # normalized taps are a partition of unity -> constants pass through
    xs = [float(i) for i in range(8)]
    ys = [float(i) for i in range(5)]
    vals = np.full((5, 8), 3.25)
    out = spatial_resample(
        _spark_grid(spark, xs, ys, vals), resolution_factor=2.0, resample_method=kernel
    ).collect()
    for r in out:
        assert r["v"] == pytest.approx(3.25, abs=1e-12)


def test_keys_cubic_reproduces_quadratic_interior(spark):
    # Keys a=-0.5 is third-order accurate: exact on quadratics where the
    # full 4-tap stencil is in range (one source step in from each edge)
    xs = [float(i) for i in range(12)]
    ys = [float(i) for i in range(12)]
    f = lambda x, y: 0.5 * x * x - 1.5 * x + 0.25 * y * y + 2.0 * y + 3.0
    vals = np.array([[f(x, y) for x in xs] for y in ys])
    out = spatial_resample(
        _spark_grid(spark, xs, ys, vals), resolution_factor=2.0, resample_method="cubic"
    ).collect()
    checked = 0
    for r in out:
        if 1.0 <= r["x"] <= 10.0 and 1.0 <= r["y"] <= 10.0:
            assert r["v"] == pytest.approx(f(r["x"], r["y"]), abs=1e-9)
            checked += 1
    assert checked > 50


def test_conv_shape_law_matches_reference(spark):
    # same 19x7 -> 38x14 target-axis law as the pure kernels
    # (test_3_era5_manipulations.py:75-99 runs every kernel through it)
    from tests.grid_fixture import grid_df

    out = spatial_resample(grid_df(spark, with_nulls=False), resolution_factor=2.0,
                           resample_method="lanczos")
    assert out.select("x").distinct().count() == 38
    assert out.select("y").distinct().count() == 14
    assert out.count() == 73 * 38 * 14


def test_conv_null_renormalization(spark):
    # a missing source cell redistributes its weight over present taps
    xs = [float(i) for i in range(6)]
    rows = [
        (T, 0.0, x, None if x == 2.0 else 10.0) for x in xs
    ]
    df = spark.createDataFrame(rows, "time timestamp, y double, x double, v double")
    out = spatial_resample(df, xy_resolution_factors=(2.0, 1.0),
                           resample_method="cubic").collect()
    for r in out:
        assert r["v"] == pytest.approx(10.0, abs=1e-9), r


def test_tap_rows_bounded_and_normalized():
    xs = [i * 0.25 for i in range(100)]
    new = _target_axis(xs, 2.0)
    for kernel, radius in CONVOLUTIONAL_KERNELS.items():
        rows = conv_tap_rows(new, xs, kernel, 2.0)
        per_target: dict[float, float] = {}
        counts: dict[float, int] = {}
        for _src, nv, w in rows:
            per_target[nv] = per_target.get(nv, 0.0) + w
            counts[nv] = counts.get(nv, 0) + 1
        assert set(per_target) == set(new)
        for nv, s in per_target.items():
            assert s == pytest.approx(1.0, abs=1e-12)
            assert counts[nv] <= 2 * radius + 1


def test_kernel_weight_formulas():
    # interpolating kernels are 1 at the sample, 0 at other knots
    for k in ("cubic", "lanczos"):
        assert kernel_weight(k, 0.0) == pytest.approx(1.0)
        for t in (1.0, 2.0):
            assert kernel_weight(k, t) == pytest.approx(0.0, abs=1e-12), k
    # B-spline smooths: positive everywhere inside support
    assert kernel_weight("cubic_spline", 0.0) == pytest.approx(4.0 / 6.0)
    assert kernel_weight("cubic_spline", 1.0) == pytest.approx(1.0 / 6.0)
    assert kernel_weight("gauss", 0.0) == 1.0
    assert kernel_weight("gauss", 1.0) == pytest.approx(math.exp(-2.0))
    with pytest.raises(ValueError):
        kernel_weight("bilinear", 0.5)


def test_conv_axis_zero_denominator_yields_null(spark):
    """Negative-lobe kernels + sparse cells can make the present-weight
    sum ~0; the guard emits NULL instead of Inf/sign-flipped values
    (ADVICE r2)."""
    from xarray_dataaccessor_spark.operators.spatial import _conv_axis

    df = spark.createDataFrame(
        [("t0", 1.0, 0.0, 10.0), ("t0", 2.0, 0.0, 20.0)],
        "time string, x double, y double, v double",
    )
    taps = spark.createDataFrame(
        [(1.0, 5.0, 0.5), (2.0, 5.0, -0.5),   # den = 0 -> NULL
         (1.0, 6.0, 0.25), (2.0, 6.0, 0.75)],  # den = 1 -> weighted mean
        "src_x double, new_x double, w_x double",
    )
    out = {r["x"]: r["v"] for r in _conv_axis(df, taps, "x", ("time", "y"), ["v"]).collect()}
    assert out[5.0] is None
    assert out[6.0] == pytest.approx(0.25 * 10.0 + 0.75 * 20.0)


# ---------------------------------------------------------------------------
# ADVICE r3: sparse-input property — random null holes must never produce
# Inf/NaN from the negative-lobe kernels (cubic a=-0.5, lanczos): the
# near-zero / sign-flipped present-weight denominators yield NULL via the
# |den| <= eps guard, everything else stays finite.
# ---------------------------------------------------------------------------
def test_sparse_holes_never_inf_nan_property(spark):
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        data=st.data(),
        kernel=st.sampled_from(sorted(CONVOLUTIONAL_KERNELS)),
        factor=st.sampled_from([2.0, 0.5]),
    )
    def run(data, kernel, factor):
        nx = data.draw(st.integers(4, 6), label="nx")
        ny = data.draw(st.integers(4, 6), label="ny")
        vals = np.array(
            data.draw(
                st.lists(
                    st.floats(0.0, 1.0, allow_nan=False),
                    min_size=nx * ny, max_size=nx * ny,
                ),
                label="vals",
            )
        ).reshape(ny, nx)
        mask = np.array(
            data.draw(
                st.lists(st.booleans(), min_size=nx * ny, max_size=nx * ny),
                label="mask",
            )
        ).reshape(ny, nx)
        xs = [float(i) * 0.25 for i in range(nx)]
        ys = [float(i) * 0.25 for i in range(ny)]
        rows = [
            (T, ys[i], xs[j], None if mask[i, j] else float(vals[i, j]))
            for i in range(ny)
            for j in range(nx)
        ]
        df = spark.createDataFrame(
            rows, "time timestamp, y double, x double, v double"
        )
        out = spatial_resample(
            df, resolution_factor=factor, resample_method=kernel
        ).collect()
        assert out, "resample produced no rows"
        for r in out:
            if r["v"] is not None:
                assert math.isfinite(r["v"]), (kernel, factor, r)
        # an entirely-null input slice must come back entirely NULL
        if mask.all():
            assert all(r["v"] is None for r in out)
        # a hole-free input slice must be fully populated (partition of
        # unity -> every target has full present weight)
        if not mask.any():
            assert all(r["v"] is not None for r in out)

    run()
