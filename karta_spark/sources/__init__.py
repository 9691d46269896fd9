from karta_spark.sources import (  # noqa: F401
    aai,
    geojson,
    geotiff,
    gpx,
    images,
    jpeg,
    multimodal,
    shapefile,
    tables,
)
