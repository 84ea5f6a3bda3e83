"""The FIXTURES.md §1 golden grid: 73 hourly x 7 lat x 19 lon, two
deterministic float variables, mirroring the reference's offline NetCDF
fixture (testing/test_data/cds_era5_dataset.nc; shapes asserted at
test_2_era5.py:131,138,149)."""

from __future__ import annotations

import datetime as dt
import math

T0 = dt.datetime(2019, 1, 30, 0, 0, 0)
YS = [42.883 - 0.25 * i for i in range(7)]  # descending like the reference
XS = [-83.476 + 0.25 * i for i in range(19)]
N_T = 73


def grid_rows(with_nulls: bool = True):
    rows = []
    for i in range(N_T):
        t = T0 + dt.timedelta(hours=i)
        epoch = t.timestamp()
        for y in YS:
            for x in XS:
                t2m = 270.0 + 10.0 * math.sin(epoch / 86400.0) + 0.1 * y + 0.05 * x
                u100 = 5.0 + 2.0 * math.cos(epoch / 43200.0) + 0.02 * (x + y)
                if with_nulls and (i * 31 + int((x + 84) * 4) + int((y - 41) * 4)) % 97 == 0:
                    u100 = None
                rows.append((t, y, x, t2m, u100))
    return rows


def grid_df(spark, with_nulls: bool = True):
    return spark.createDataFrame(
        grid_rows(with_nulls),
        "time timestamp, y double, x double, t2m double, u100 double",
    )
