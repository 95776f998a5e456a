from .codec import PackedGeometry, from_geojson, to_geojson  # noqa: F401
