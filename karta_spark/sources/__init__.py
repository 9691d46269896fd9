from karta_spark.sources import (  # noqa: F401
    aai,
    av,
    geojson,
    geotiff,
    gpx,
    images,
    jpeg,
    multimodal,
    shapefile,
    tables,
)
