from .registry import UdfRegistry, register_pipeline_udfs  # noqa: F401
