"""Dataset metadata contract and spatial/temporal predicate types.

Mirrors the reference's typed dicts:

- ``AttrsDict`` (``data_accessors/base.py:14-21``)  -> :class:`GridMeta`
- ``BoundingBoxDict`` (``shared_types.py:46-51``)   -> :class:`BoundingBox`
- ``TimeInput = Union[datetime, str, int]`` (``shared_types.py:16``) ->
  parsed by :func:`xarray_dataaccessor_spark.functions.datetime_fns.to_datetime`
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class BoundingBox:
    """Spatial AOI in the dataset's CRS (EPSG:4326 unless stated).

    Reference: ``BoundingBoxDict`` ``shared_types.py:46-51`` — keys
    ``west, south, east, north``.
    """

    west: float
    south: float
    east: float
    north: float

    def union(self, other: "BoundingBox") -> "BoundingBox":
        """Envelope of two bboxes (``_unionize_bbox``,
        ``utility_functions.py:171-188``)."""
        return BoundingBox(
            west=min(self.west, other.west),
            south=min(self.south, other.south),
            east=max(self.east, other.east),
            north=max(self.north, other.north),
        )

    def pad_if_degenerate(self, pad: float = 0.05) -> "BoundingBox":
        """Expand a zero-area bbox to ``2*pad`` degree sides
        (``_prep_small_bbox``, ``utility_functions.py:77-87``)."""
        out = self
        if self.west == self.east:
            out = replace(out, west=self.west - pad, east=self.east + pad)
        if self.south == self.north:
            out = replace(out, south=out.south - pad, north=out.north + pad)
        return out

    def contains(self, lon: float, lat: float) -> bool:
        """Point-in-bbox predicate (``_coords_in_bbox``,
        ``utility_functions.py:208-221``)."""
        return self.west <= lon <= self.east and self.south <= lat <= self.north


@dataclass(frozen=True)
class GridMeta:
    """Dataset-level metadata carried beside the DataFrame.

    Mirrors ``AttrsDict`` (``base.py:14-21``): dataset_name, institution,
    x_dim, y_dim, EPSG, time_step, plus the optional time_zone attr written
    by ``subset_time_by_timezone`` (``core_functions.py:205-255``).
    """

    dataset_name: str = "unnamed"
    institution: str = ""
    x_dim: str = "x"
    y_dim: str = "y"
    epsg: int = 4326
    time_step: str = "hourly"
    time_zone: str = "UTC"
    variables: tuple[str, ...] = field(default=())

    def with_epsg(self, epsg: int) -> "GridMeta":
        return replace(self, epsg=epsg)

    def with_time_zone(self, tz: str) -> "GridMeta":
        return replace(self, time_zone=tz)

    def with_variables(self, variables: tuple[str, ...]) -> "GridMeta":
        return replace(self, variables=tuple(variables))
