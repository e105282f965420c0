from .transform import TransformRule, TransformProcessor, apply_transform
from .partition import (
    repartition_by_primary_key,
    repartition_by_table_id,
    repartition_distributed,
)

__all__ = [
    "TransformRule",
    "TransformProcessor",
    "apply_transform",
    "repartition_by_primary_key",
    "repartition_by_table_id",
    "repartition_distributed",
]
