from .definition import (
    ModelDef,
    PipelineConfig,
    PipelineDef,
    RouteDef,
    SinkDef,
    SourceDef,
    TransformDef,
    UdfDef,
)
from .yaml_parser import parse_pipeline_yaml
from .composer import BatchPipelineComposer, PipelineResult

__all__ = [
    "PipelineDef",
    "SourceDef",
    "SinkDef",
    "RouteDef",
    "TransformDef",
    "UdfDef",
    "ModelDef",
    "PipelineConfig",
    "parse_pipeline_yaml",
    "BatchPipelineComposer",
    "PipelineResult",
]
