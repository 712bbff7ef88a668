"""docling_ray — a Ray-Data-native document-conversion / main-content
extraction engine with the capabilities of the reference docling converter,
re-expressed as streaming ``ray.data.Dataset`` pipelines."""

__version__ = "0.1.0"
